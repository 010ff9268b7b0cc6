package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout checks: a Hive-partitioned export must let Spark prune
  * non-matching partition directories at planning time — the storage-layout
  * half of the §4 pushdown story (PlanShapeSpec covers row-group filters).
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filters on the partition column prune to matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.load(spark, TestSpark.sf, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)

    val df = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = df.queryExecution.executedPlan.toString
    // assert the LITERAL inside the partition-filter clause — a bare
    // contains("F") is vacuous (every plan string has FileScan)
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*F".r
        .findFirstIn(plan).isDefined,
      s"partition filter with the F literal not recognized:\n$plan")

    // the scan must actually read ONLY the F partition's files
    val allCount = spark.read.parquet(dir).count()
    val fCount = df.count()
    assert(fCount > 0 && fCount < allCount)
    def nScannedFiles(d: org.apache.spark.sql.DataFrame): Long =
      d.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles }.sum
    val scannedFiles = nScannedFiles(df)
    val totalFiles = nScannedFiles(spark.read.parquet(dir))
    assert(scannedFiles < totalFiles,
      s"pruned scan reads $scannedFiles of $totalFiles files")
  }
}
