package graft.sources

import graft.model.RelGraph
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference reads a live RDBMS and reinjects into
  * another (`/root/reference/dbcut/database.py`, `cli/operations.py`). The
  * Spark analogue is the built-in JDBC relation with *partitioned* reads:
  * a numeric/temporal `partitionColumn` with bounds splits the table into
  * `numPartitions` range predicates executed in parallel, or an explicit
  * predicate list shards by arbitrary WHERE clauses. Option assembly is
  * pure (unit-tested); no database ships in this container, so the actual
  * round-trip is exercised only when a JDBC URL is provided.
  */
object Jdbc {

  final case class ReadSpec(
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 8,
      fetchSize: Int = 10000,
      predicates: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty)

  /** Resolve the option map Spark's JDBC source expects. Partition options
    * are all-or-nothing: emitting a partitionColumn without both bounds is
    * a config error we fail fast on (Spark would too, later and worse).
    */
  def options(spec: ReadSpec): Map[String, String] = {
    require(spec.predicates.isEmpty || spec.partitionColumn.isEmpty,
      "predicates and partitionColumn are mutually exclusive")
    val base = Map(
      "url" -> spec.url,
      "dbtable" -> spec.table,
      "fetchsize" -> spec.fetchSize.toString) ++ spec.properties
    spec.partitionColumn match {
      case Some(colName) =>
        require(spec.lowerBound.isDefined && spec.upperBound.isDefined,
          s"partitionColumn $colName needs lowerBound and upperBound")
        base ++ Map(
          "partitionColumn" -> colName,
          "lowerBound" -> spec.lowerBound.get.toString,
          "upperBound" -> spec.upperBound.get.toString,
          "numPartitions" -> spec.numPartitions.toString)
      case None => base
    }
  }

  /** Partitioned read. With `predicates`, one partition per predicate. */
  def read(spark: SparkSession, spec: ReadSpec): DataFrame =
    if (spec.predicates.nonEmpty) {
      val props = new java.util.Properties()
      (spec.properties + ("fetchsize" -> spec.fetchSize.toString))
        .foreach { case (k, v) => props.setProperty(k, v) }
      spark.read.jdbc(spec.url, spec.table, spec.predicates.toArray, props)
    } else spark.read.format("jdbc").options(options(spec)).load()

  /** FK-safe insertion order for loading an extraction into a destination
    * RDBMS with constraints enabled: parents before children. The reference
    * instead disables FK checks (`operations.py:110-120`); ordering is the
    * portable equivalent.
    */
  def loadOrder(graph: RelGraph, tables: Set[String]): Seq[String] =
    graph.topological.filter(tables)

  /** Write one table over JDBC (append into an existing schema). Batch size
    * mirrors fetchSize on the way in.
    */
  def write(df: DataFrame, url: String, table: String,
            batchSize: Int = 10000,
            properties: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .options(properties ++ Map(
        "url" -> url, "dbtable" -> table, "batchsize" -> batchSize.toString))
      .mode(SaveMode.Append).save()
}
