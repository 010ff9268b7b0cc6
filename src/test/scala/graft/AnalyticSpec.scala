package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of join matches a brute-force max-preceding-click check") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    // brute force: per purchase, max click ts at-or-before it
    val expected = purchases.join(clicks,
        col("pu") === col("cu") && col("pts") >= col("cts"), "inner")
      .groupBy(col("pu"), col("pts"))
      .agg(max(col("cts")).as("want_cts"))
      .withColumn("want", date_format(col("want_cts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .select(col("pu"), date_format(col("pts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("want_pts"), col("want"))
    val got = SparkEntry.queries("q_asof_join")(spark, TestSpark.sf)
    // SET equality over full rows (null c_ts included): count-equality +
    // inner-join + null-swallowing =!= used to let compensating wrong
    // rows and all-NULL attribution regressions pass unseen
    def normalize(r: org.apache.spark.sql.Row): (Long, String, String) =
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "<null>" else r.getString(2))
    val gotSet = got.select("user_id", "p_ts", "c_ts")
      .collect().map(normalize).toSet
    val wantSet = expected.select(col("pu"), col("want_pts"), col("want"))
      .collect().map(normalize).toSet
    // purchases with NO preceding click are absent from the brute-force
    // inner join but present in got with NULL c_ts — fold them in
    val wantKeys = wantSet.map(t => (t._1, t._2))
    val gotNullFree = gotSet.filter(t => wantKeys.contains((t._1, t._2)))
    val gotNullOnly = gotSet -- gotNullFree
    assert(gotNullOnly.forall(_._3 == "<null>"),
      s"non-null attribution outside the brute-force set: ${gotNullOnly.take(3)}")
    assert(gotNullFree == wantSet,
      s"attribution mismatch: got ${gotNullFree.size} want ${wantSet.size}")
    assert(gotSet.size == gotNullFree.size + gotNullOnly.size)
  }

  test("rollup grand total equals the sum of its leaves") {
    val rows = SparkEntry.queries("q_rollup")(spark, TestSpark.sf).collect()
    val leaves = rows.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length == 1)
    assert(leaves.map(_.getLong(2)).sum == grand.head.getLong(2))
    assert(leaves.map(_.getLong(3)).sum == grand.head.getLong(3))
    // per-status subtotals also agree
    val statusTotals = rows.filter(r => r.getString(0) != "(all)" && r.getString(1) == "(all)")
    assert(statusTotals.map(_.getLong(2)).sum == grand.head.getLong(2))
  }

  test("percentiles are ordered and inside [min, max]") {
    val rows = SparkEntry.queries("q_percentile")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, mn, mx) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx)
    }
  }

  test("range-frame rolling sum matches a brute-force 30-day filter") {
    val got = SparkEntry.queries("q_window_range")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val orders = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1990-01-01")))
          .cast("long").as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 1000000).cast("long").as("micros"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force over one small customer partition
    val cust = orders.head._1
    orders.filter(_._1 == cust).foreach { case (c, ok, day, _) =>
      val want = orders.filter(o => o._1 == c && o._3 >= day - 30 && o._3 <= day)
        .map(_._4).sum
      assert(got((c, ok)) == want, s"custkey $c orderkey $ok")
    }
  }

  test("3-sigma outlier detection flags the planted spike and nothing else") {
    val dir = java.nio.file.Files.createTempDirectory("analyticspec_out").toString
    import spark.implicits._
    // type 'a': 99 quiet values + one 1000.0 spike (mean ≈ 19.9,
    // σ ≈ 98.5 → the spike is ~10σ out, the quiet rows are ~0.1σ);
    // type 'b': constant — zero variance must yield zero outliers, not a
    // divide-by-zero or an everything-is-an-outlier verdict.
    // ts is written as epoch-NANOS long, the on-disk shape Tables.load
    // expects from the synthetic events table
    val ns = 1704067200L * 1000000000L
    val rows = (1 to 99).map(i => (i.toLong, ns, 1L, "a", 10.0, "{}")) ++
      Seq((100L, ns, 1L, "a", 1000.0, "{}")) ++
      (101 to 150).map(i => (i.toLong, ns, 2L, "b", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_outlier_events")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("a") == ((100L, 1L, 1000000000L)), s"got ${got("a")}")
    assert(got("b") == ((50L, 0L, 0L)), s"got ${got("b")}")
  }

  test("approx percentile sketch lands near the exact answer") {
    val exact = SparkEntry.queries("q_percentile")(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q_approx_percentile")(spark, TestSpark.sf).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e90) = exact(r.getString(0))
      // l_quantity is integer-valued 1..50; at accuracy 10000 the sketch
      // should land within one unit of the exact interpolated percentile
      assert(math.abs(r.getDouble(1) - e50) <= 1.0)
      assert(math.abs(r.getDouble(2) - e90) <= 1.0)
    }
  }

  test("ewma fold aborts loudly on a hot key instead of materializing it") {
    import spark.implicits._
    // adversarial: one bot entity with 50 events, everyone else with 2;
    // a cap of 10 must name the bot and fail BEFORE any per-key collect
    val events = ((1 to 50).map(i => (999L, i.toLong)) ++
      Seq((1L, 100L), (1L, 101L), (2L, 102L), (2L, 103L)))
      .map { case (u, i) =>
        (i, new java.sql.Timestamp(1700000000000L + i * 1000), u, "c", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val e = intercept[IllegalArgumentException] {
      operators.Analytic.ewmaPerEntity(events, maxPerKey = 10)
    }
    assert(e.getMessage.contains("user_id=999") &&
      e.getMessage.contains("50 events"), e.getMessage)
    // under the cap the fold runs and clamps negatives to 0 on the way in
    val ok = operators.Analytic.ewmaPerEntity(
      Seq((1L, new java.sql.Timestamp(1700000000000L), 7L, "c", -5.0),
        (2L, new java.sql.Timestamp(1700000001000L), 7L, "c", 4.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      maxPerKey = 10).collect()
    assert(ok.length == 1)
    val r = ok.head
    // history = [0 (clamped from -5), 4_000_000]; fold: (4M + 3*0) div 4
    assert(r.getLong(1) == 2L && r.getLong(2) == 4000000L &&
      r.getLong(3) == 1000000L, r.toSeq.toString)
  }
}
