package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: `runMain graft.ExplainTool <sfDir> <query> [mode]`
  * prints the chosen explain mode (default "formatted") for a registered
  * query — the fastest way to check pushdown/broadcast/codegen on a change.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode)))
    spark.stop()
  }
}
