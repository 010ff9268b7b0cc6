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

  test("hll rollup: merged daily sketches estimate within 5% of exact") {
    val r = SparkEntry.queries("q_hll_rollup")(spark, TestSpark.sf)
      .collect().head
    val days = r.getLong(0)
    val approx = r.getLong(1).toDouble
    val exact = r.getLong(2).toDouble
    assert(days > 1, "rollup must merge more than one daily sketch")
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact over $days days")
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

  test("saltedJoin keeps fact rows whose discriminator is NULL") {
    import spark.implicits._
    // crc32(NULL) is NULL: without the coalesce in the salt these rows got
    // a NULL __salt and silently vanished from the inner join
    val fact = Seq((1L, Option("x")), (1L, Option.empty[String]),
      (2L, Option.empty[String])).toDF("k", "d")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", col("d"), 4)
    assert(out.count() == 3, "NULL-discriminator rows must survive the join")
  }

  test("saltedJoin returns exactly the plain join, salt-free") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val ord = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", col("l_partkey"), 4)
    val plain = li.join(ord, "l_orderkey")
    assert(!salted.columns.contains("__salt"))
    assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
    assert(salted.count() == plain.count())
    // row-level equality via the full-row checksum multiset
    def digest(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
      // coalesce to a sentinel: concat_ws silently drops nulls, which
      // would otherwise let distinct null-placements hash identically
      val cols = df.columns.sorted.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000null")))
      df.select(md5(concat_ws("", cols.toIndexedSeq: _*)).as("h"))
        .groupBy("h").count().orderBy("h").collect()
    }
    assert(digest(salted).toSeq == digest(plain).toSeq)
  }
}
