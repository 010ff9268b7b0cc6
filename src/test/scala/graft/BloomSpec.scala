package graft

import graft.functions.Bloom
import graft.operators.RuntimeFilter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom probe has zero false negatives and bounded false positives") {
    import spark.implicits._
    val keys = (0L until 2000L).filter(_ % 7 == 0).toDF("k")
    val bf = Bloom.build(keys, "k", 300, 0.03)
    val probed = (0L until 2000L).toDF("v")
      .select(col("v"), Bloom.mightContain(col("v"), bf).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every inserted key must hit
    (0L until 2000L).filter(_ % 7 == 0).foreach(k => assert(probed(k), s"false negative on $k"))
    // non-members mostly miss (fpp 3% over ~1714 non-members; allow slack)
    val fp = (0L until 2000L).filterNot(_ % 7 == 0).count(probed(_))
    assert(fp < 150, s"$fp false positives out of 1714 non-members")
  }

  test("bloomPrunedSemiJoin result is identical to the plain semi-join") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val keys = Tables.load(spark, TestSpark.sf, "supplier")
      .filter(col("s_nationkey") < 5).select("s_suppkey")
    val pruned = RuntimeFilter.bloomPrunedSemiJoin(li, keys, "l_suppkey", "s_suppkey")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    val plain = li.join(keys, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      .orderBy("l_suppkey").collect().toSeq
    assert(pruned.nonEmpty && pruned == plain)
  }

  test("bloom predicate sits below the join and inside codegen") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val keys = Tables.load(spark, TestSpark.sf, "supplier")
      .filter(col("s_nationkey") < 5).select("s_suppkey")
    val plan = RuntimeFilter.bloomPrunedSemiJoin(li, keys, "l_suppkey", "s_suppkey")
      .queryExecution.executedPlan
    val lines = plan.toString.linesIterator.toVector
    def firstIdx(p: String => Boolean): Int = lines.indexWhere(p)
    // tree prints top-down: the join must sit ABOVE the bloom-filtered
    // lineitem scan, i.e. the probe runs before the join consumes the fact
    val joinIdx = firstIdx(_.toLowerCase.contains("join"))
    val bloomIdx = firstIdx(l => l.toLowerCase.contains("bloommightcontainlong") &&
      l.contains("Filter"))
    val scanIdx = firstIdx(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(joinIdx >= 0 && bloomIdx >= 0 && scanIdx >= 0,
      s"missing join/bloom/scan in plan:\n${lines.mkString("\n")}")
    assert(joinIdx < bloomIdx && bloomIdx < scanIdx,
      s"bloom probe is not between the join and the fact scan:\n${lines.mkString("\n")}")
  }
}
