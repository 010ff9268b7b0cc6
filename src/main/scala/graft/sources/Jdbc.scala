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
      // the mutual-exclusion check must fire HERE too — this branch never
      // reaches options(), which is where it otherwise lives, and a spec
      // carrying both would silently ignore its partition column
      require(spec.partitionColumn.isEmpty,
        "predicates and partitionColumn are mutually exclusive")
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
  def loadOrder(graph: RelGraph, tables: Set[String]): Seq[String] = {
    // tables ABSENT from the FK graph still load (a standalone table has
    // no FK constraints to order around — appended last, sorted, the
    // Cli.fkOrder/ModelGen.ddlScript rule); filtering them away silently
    // skipped their load entirely
    val inGraph = graph.topological.filter(tables)
    inGraph ++ (tables -- graph.tables.keySet).toSeq.sorted
  }

  /** Reflect type-fidelity hints (enum/unsigned/collation/length) from live
    * JDBC catalog metadata — the edge where the reference gets them for free
    * from SQLAlchemy reflection (`/root/reference/dbcut/database.py:166-211`).
    * One driver-side catalog call, no data read. Only columns with at least
    * one hint appear in the result.
    */
  def reflectHints(url: String, table: String,
                   properties: Map[String, String] = Map.empty)
      : Map[String, SqlDump.TypeHints.Hints] = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      // getColumns takes a search PATTERN: a literal '_' in the table name
      // would act as a single-char wildcard and merge hints from similarly
      // named tables — escape pattern metachars with the driver's escape
      val esc = Option(md.getSearchStringEscape).filter(_.nonEmpty)
      def literal(s: String): String = esc match {
        case Some(e) =>
          s.replace(e, e + e).replace("_", e + "_").replace("%", e + "%")
        case None => s
      }
      // char-ish types report their length via COLUMN_SIZE, not TYPE_NAME
      val charish = Seq("VARCHAR", "CHARACTER", "CHAR", "NVARCHAR", "NCHAR")
      // normalized-identifier stores (Derby/Postgres fold unquoted names)
      val candidates = Seq(table, table.toUpperCase, table.toLowerCase).distinct
      val out = Map.newBuilder[String, SqlDump.TypeHints.Hints]
      candidates.iterator.map { t =>
        val rs = md.getColumns(null, null, literal(t), null)
        var n = 0
        try {
          while (rs.next()) {
            n += 1
            val name = rs.getString("COLUMN_NAME").toLowerCase
            val typeName = Option(rs.getString("TYPE_NAME")).getOrElse("")
            val size = rs.getInt("COLUMN_SIZE")
            val h0 = SqlDump.TypeHints.fromTypeName(typeName)
            val h =
              if (h0.length.isEmpty && size > 0 &&
                charish.exists(typeName.toUpperCase.startsWith))
                h0.copy(length = Some(size.toLong))
              else h0
            if (h != SqlDump.TypeHints.Hints()) out += name -> h
          }
        } finally rs.close()
        n
      }.find(_ > 0)
      out.result()
    } finally conn.close()
  }

  /** Attach reflected hints to a DataFrame's column metadata so downstream
    * DDL rendering ([[SqlDump.Dialect.columnType]]) sees them.
    */
  def withHints(df: DataFrame,
                hints: Map[String, SqlDump.TypeHints.Hints]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (hints.isEmpty) df
    else df.select(df.schema.fieldNames.map { c =>
      hints.get(c.toLowerCase) match {
        case Some(h) => col(c).as(c, h.metadata)
        case None => col(c)
      }
    }.toIndexedSeq: _*)
  }

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
