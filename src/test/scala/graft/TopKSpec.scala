package graft

import graft.plans.{TopK, TopKPerGroupExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom TopKPerGroup matches the window formulation exactly") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val custom = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    assert(custom.collect().toSeq == windowed.collect().toSeq)
  }

  test("plans as partial + final with one exchange, no sort of the input") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val df = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 2)
    df.collect() // finalize the adaptive plan
    // AQE prints final + initial sections; inspect the final plan only.
    // Physical nodes render without the Exec suffix.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2, s"expected partial+final in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), "group-key exchange expected")
    assert(!plan.contains("Sort "), "bounded heaps must not sort the input")
  }

  test("k larger than any group returns everything; k=1 returns the max row") {
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val all = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_orderkey").asc), 1000000)
    assert(all.count() == orders.count())
    val best = TopK.perGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1)
    val expected = orders.groupBy("o_custkey").count().count()
    assert(best.count() == expected)
  }
}
