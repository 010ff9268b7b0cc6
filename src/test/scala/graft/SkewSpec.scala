package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedSum matches plain sum per key") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val salted = Skew.saltedSum(li, Seq(col("l_returnflag")),
      col("l_quantity").cast("decimal(18,2)"), "total")
      .orderBy("l_returnflag").collect().toSeq
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total"))
      .orderBy("l_returnflag").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDecimal(1))) ==
      plain.map(r => (r.getString(0), r.getDecimal(1))))
  }

  test("approx distinct sketch lands within its error bound") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("saltedDistinctCount rejects float columns and name collisions") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    intercept[IllegalArgumentException] {
      Skew.saltedDistinctCount(li, Seq(col("l_returnflag")),
        col("l_extendedprice"), 8, "n")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedDistinctCount(li.withColumn("__salt", lit(1)),
        Seq(col("l_returnflag")), col("l_orderkey"), 8, "n")
    }
  }
}
