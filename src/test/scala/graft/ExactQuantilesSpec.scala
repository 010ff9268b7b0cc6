package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactQuantiles

/** Pins the distributed bucket-refinement quantiles against Spark's own
  * exact `percentile` aggregate — including on a group large enough to
  * force the refinement (bucket) rounds, which sf-test corpora are too
  * small to reach (every group there resolves in the direct-collect
  * round).
  */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val probs = Seq(0.05, 0.25, 0.5, 0.9, 0.95)

  private def builtin(df: org.apache.spark.sql.DataFrame, group: String,
                      value: String): Map[String, Seq[Double]] =
    df.groupBy(col(group).cast("string").as("g"))
      .agg(percentile(col(value), array(probs.map(lit): _*)).as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap

  test("matches Spark's percentile on the real corpus (collect round only)") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val got = ExactQuantiles.continuous(
      li, col("l_returnflag"), col("l_extendedprice"), probs)
    val want = builtin(li, "l_returnflag", "l_extendedprice")
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; i <- probs.indices)
      assert(got(g)(i) == want(g)(i), s"group $g prob ${probs(i)}")
  }

  test("matches Spark's percentile when refinement rounds are forced") {
    import spark.implicits._
    // 40k rows per group ≫ the 8k direct-collect bound, so every order
    // statistic takes at least one bucket round; values are 2-decimal
    // "money" with heavy ties and a wide range, like the target columns
    val df = spark.range(80000)
      .select((col("id") % 2).cast("string").as("g"),
        round((abs(hash(col("id")).cast("double")) % 1000000) / 100.0 + 0.01, 2)
          .as("v"))
    val got = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
    val want = builtin(df, "g", "v")
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; i <- probs.indices)
      assert(got(g)(i) == want(g)(i), s"group $g prob ${probs(i)}")
  }

  test("footer-seeded global bounds give bit-identical results, one scan less") {
    import spark.implicits._
    // same forced-refinement shape as above; bounds deliberately LOOSER
    // than the data (a footer bound covers, it need not be tight)
    val df = spark.range(80000)
      .select((col("id") % 2).cast("string").as("g"),
        round((abs(hash(col("id")).cast("double")) % 1000000) / 100.0 + 0.01, 2)
          .as("v"))
    val plain = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
    val seeded = ExactQuantiles.continuous(df, col("g"), col("v"), probs,
      globalBounds = Some((0L, 10000010000L)))
    assert(plain.keySet == seeded.keySet)
    for (g <- plain.keySet; i <- probs.indices)
      assert(plain(g)(i) == seeded(g)(i), s"group $g prob ${probs(i)}")
    // and the real parquet footer bounds actually cover the real column
    val path = Tables.path(TestSpark.sf, "lineitem")
    val Some((mn, mx)) = Tables.footerDoubleBounds(spark, path, "l_extendedprice")
    val row = Tables.load(spark, TestSpark.sf, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).head()
    assert(mn <= row.getDouble(0) && mx >= row.getDouble(1))
  }

  test("wide-range columns (2^31-scale values) do not overflow bucketing") {
    import spark.implicits._
    // micros domain reaches 2.1e15 here: the old (v-lo)·65536 bucket id
    // overflowed a long on exactly this shape
    val df = spark.range(20000)
      .select(lit("g").as("g"),
        pow(lit(2.0), col("id") % 32).cast("double").as("v"))
    val got = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
    val want = builtin(df, "g", "v")
    for (i <- probs.indices)
      assert(got("g")(i) == want("g")(i), s"prob ${probs(i)}")
  }

  test("driver rows stay bounded on a many-group column (batched refinement)") {
    import graft.operators.ExactQuantiles._
    import spark.implicits._
    // 150 groups × 9k rows: every group's range needs a bucket round
    // (pop > the 8k direct-collect bound), and G·B ≈ 10M count rows would
    // have landed on the driver in ONE collect before batching — the
    // high-cardinality-group shape the public API invites
    val df = spark.range(1350000)
      .select((col("id") % 150).cast("string").as("g"),
        round((abs(hash(col("id")).cast("double")) % 100000) / 100.0 + 0.01, 2)
          .as("v"))
    val want = builtin(df, "g", "v")
    // unfused path: per-group ranges, batched bucket rounds
    val plain = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
    assert(lastMaxCollectRows <= MaxDriverRows,
      s"unfused collect put $lastMaxCollectRows rows on the driver")
    // fused path: the G·B matrix exceeds the cap, so the LIMIT probe must
    // reject fusion (its collect is allowed exactly MaxDriverRows+1 rows)
    // and fall back to per-group seeding + batched refinement
    val seeded = ExactQuantiles.continuous(df, col("g"), col("v"), probs,
      globalBounds = Some((0L, 2000000000L)))
    assert(lastMaxCollectRows <= MaxDriverRows + 1,
      s"seeded collect put $lastMaxCollectRows rows on the driver")
    assert(plain.keySet == want.keySet && seeded.keySet == want.keySet)
    for (g <- want.keySet; i <- probs.indices) {
      assert(plain(g)(i) == want(g)(i), s"plain group $g prob ${probs(i)}")
      assert(seeded(g)(i) == want(g)(i), s"seeded group $g prob ${probs(i)}")
    }
  }

  test("property: matches Spark's percentile on seeded random shapes") {
    import spark.implicits._
    // five deterministic pseudo-random datasets spanning the shapes that
    // have bitten before: heavy ties, wide ranges, tiny and large groups
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 1 + rnd.nextInt(12)
      val rows = 200 + rnd.nextInt(20000)
      val scale = math.pow(10, 1 + rnd.nextInt(6))
      val df = spark.range(rows).select(
        (col("id") % nGroups).cast("string").as("g"),
        round((abs(hash(col("id"), lit(seed)).cast("double")) %
          (scale * 100)) / 100.0, 2).as("v"))
      val got = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
      val want = builtin(df, "g", "v")
      assert(got.keySet == want.keySet, s"seed $seed groups")
      for (g <- want.keySet; i <- probs.indices)
        assert(got(g)(i) == want(g)(i),
          s"seed $seed group $g prob ${probs(i)}: ${got(g)(i)} != ${want(g)(i)}")
    }
  }

  test("empty groups are absent and single-row groups are exact") {
    import spark.implicits._
    val df = Seq(("a", 42.17)).toDF("g", "v")
    val got = ExactQuantiles.continuous(df, col("g"), col("v"), probs)
    assert(got.keySet == Set("a"))
    assert(got("a").forall(_ == 42.17))
  }
}
