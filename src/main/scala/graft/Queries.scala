package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** One named, oracle-checked query: the Spark implementation plus (usually)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** Cast every timestamp column to DATE. The TPC-H-ish dates are stored as
    * midnight timestamps; emitting DATE on both engines sidesteps parquet
    * timestamp-unit (ns/µs/ms) mismatches in the driver's hash compare.
    */
  def tsToDate(df: DataFrame): DataFrame = {
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampType || f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast("date"))
      else acc
    }
  }
}
