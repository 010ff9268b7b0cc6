package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table catalog over a scale-factor directory of parquet files.
  *
  * The reference (dbcut, `/root/reference/dbcut/database.py:166-211`) reflects
  * a live RDBMS via SQLAlchemy automap; graft's analogue is a directory of
  * columnar files plus declarative relationship metadata ([[graft.model.RelGraph]]).
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning.
  */
object Tables {
  /** All driver-provided test tables (TPC-H-ish star schema + pipeline tables). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** The relational (FK-linked) subset used by subset extraction. */
  val relational: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
      // to a timestamp type. Read nanos as LONG (public legacy conf), then
      // rebuild a microsecond TimestampType column — exact here, the data
      // carries µs precision (ns residue verified zero).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(sfDir, name))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path(sfDir, name))

  /** Register every table as a temp view so `spark.sql` works against the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
