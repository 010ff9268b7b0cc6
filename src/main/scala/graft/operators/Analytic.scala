package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Additional analytic operators beyond the reference's own surface
  * (SURVEY §2c extension): as-of join, rollup subtotals, exact percentiles.
  * Same determinism rules as Relational.scala — money in BIGINT micros,
  * total ORDER BY on both engines, identical aliases.
  */
object Analytic {

  /** Deterministic train/val/test split, shared by q_split_assign and
    * the §2d split-leakage audit/fix: first 4 md5 hex digits of
    * "split:<id>" mod 10 → 80/10/10, identical derivation on both
    * engines. The 80/10/10 rule applies over any integer id column —
    * `key` defaults to doc_id (q_split_assign); the leakage-safe variant
    * (q_split_safe) passes the near-dup cluster ANCHOR instead, so the
    * same salt yields the same assignment wherever no leakage existed.
    */
  private[operators] def splitColumn(key: String = "doc_id"): Column = {
    val v = expr(
      s"CAST(conv(substr(md5(cast(concat('split:', cast($key AS string)) AS binary)), 1, 4), 16, 10) AS INT) % 10")
    when(v <= 7, "train").when(v === 8, "val").otherwise("test")
  }

  private[operators] def splitSql(key: String = "doc_id"): String = {
    val duckV = (0 until 4).map { d =>
      s"(strpos('0123456789abcdef', substr(md5('split:' || CAST($key AS VARCHAR)), ${d + 1}, 1)) - 1) * ${math.pow(16, 3 - d).toInt}"
    }.mkString(" + ")
    s"""CASE WHEN ($duckV) % 10 <= 7 THEN 'train'
       |     WHEN ($duckV) % 10 = 8 THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Source→tier mapping and tier token shares (milli) — shared by
    * q_mixture_plan (sizing) and q_mixture_select (execution); identical
    * text compiles in both engines. Declared before `pack` (init-order
    * rule for oracle-interpolated constants).
    */
  private[graft] val MixTierSql: String =
    """CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'curated'
      |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 'web'
      |    WHEN source IN ('src10','src11','src12','src13','src14') THEN 'mid'
      |    ELSE 'tail' END""".stripMargin
  private[operators] val MixShareSql: String =
    """CASE tier WHEN 'curated' THEN 500 WHEN 'web' THEN 300
      |    WHEN 'mid' THEN 150 ELSE 50 END""".stripMargin

  /** q_epoch_plan parameters: total training budget = EpochBudgetX × the
    * corpus's unique tokens; no source tier may repeat beyond
    * MaxEpochsMilli/1000 passes (the Muennighoff et al. 2023 point of
    * diminishing returns). Declared before `pack` (init-order rule).
    */
  private[graft] val EpochBudgetX = 2
  private[graft] val MaxEpochsMilli = 4000

  import graft.Q.{micros, sqlMicros}

  /** Exact 2-decimal view of a stored-as-double money/quantity column. */
  private def dec(c: String): Column = col(c).cast("decimal(18,2)")

  /** Microsecond-precision wall-clock string — the cross-engine-safe way to
    * emit the ns-origin event timestamps (Q.tsToDate's rule: never emit raw
    * timestamps from oracle-checked queries).
    */
  private val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Per-type exact moment table (n, s = Σv, q = Σv²) of a
    * (event_type, v:BIGINT micros) frame. Per-row v² would overflow a long
    * at ~3e9 micros, so the square is taken in decimal; the aggregation
    * buffers are DECIMAL(38,0) like q_regression's. Shared by
    * q_outlier_events and the streaming scorer
    * ([[graft.streaming.Events.scoreOutliers]]).
    */
  def eventMoments(p: DataFrame): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    p.groupBy(col("event_type")).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(d38(col("v"))).as("s"),
      sum(d38(col("v")) * col("v")).as("q"))
  }

  /** The 3-sigma test over exact integer moments: the float
    * (v − s/n)² > 9·(n·q − s²)/n² cross-multiplied to decimal algebra.
    * Evaluate against columns v/n/s/q (post-join with [[eventMoments]]).
    */
  def outlierTest: Column = {
    val dev = col("n") * col("v") - col("s")
    dev * dev > lit(9) * (col("n") * col("q") - col("s") * col("s"))
  }

  /** One grouping-set subtotal query (ROLLUP or CUBE): Spark generates NULL
    * group keys for subtotal rows; both sides coalesce them to a marker so
    * the result dodges Spark-vs-DuckDB NULL-ordering defaults in the total
    * ORDER BY.
    */
  private def subtotalQ(name: String, op: String,
      group: DataFrame => org.apache.spark.sql.RelationalGroupedDataset): Q =
    Q(name,
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
        |  coalesce(o_orderpriority, '(all)') AS priority,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(${sqlMicros("o_totalprice")}) AS BIGINT) AS total_micros
        |FROM orders GROUP BY $op (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)(
      (s, dir) => group(t(s, dir, "orders"))
        .agg(count(lit(1)).as("n"),
          (sum(Q.cents(col("o_totalprice"))) * 10000L).as("total_micros"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total_micros"))
        .orderBy(col("status"), col("priority")))

  /** q_ewma's per-key history bound: the fold collects each entity's
    * events into ONE array row (flatMapGroupsWithState's per-key-state
    * contract), so an unbounded hot key — a bot account with 10⁸ events —
    * would OOM an executor, not fail cleanly. The guard pre-counts per
    * key (one map-side-combined aggregate, shuffle of (key, count) only)
    * and aborts naming the offending entity. 4M events × ~24 B struct
    * ≈ 100 MB of array per worst-case key — within an executor's working
    * memory with headroom.
    */
  val EwmaMaxPerKey: Long = 1L << 22

  /** Integer-EWMA per-entity fold over (user_id, ts, event_id, v) — the
    * registered q_ewma body, factored so the hot-key guard is testable
    * with a small cap. `v` is clamped at 0 on BOTH engines: the fold's
    * cross-engine equality needs trunc-div ≡ floor-div, which holds only
    * for non-negative values (DuckDB `//` floors, Spark `div` truncates
    * toward zero) — the clamp makes the invariant structural instead of
    * an assumption about the data.
    */
  def ewmaPerEntity(events: DataFrame,
                    maxPerKey: Long = EwmaMaxPerKey): DataFrame = {
    val hot = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxPerKey)
      .orderBy(col("n").desc, col("user_id"))
      .limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"q_ewma: entity user_id=${r.get(0)} has ${r.getLong(1)} events, " +
        s"over the per-key history cap $maxPerKey — the sequential fold " +
        "materializes one row per entity; split or pre-aggregate hot keys"
    })
    val x = struct(
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
      col("event_id").as("ev"),
      expr("greatest(CAST(round(value * 1000000) AS BIGINT), 0L)").as("v"))
    events
      .groupBy("user_id")
      .agg(array_sort(collect_list(x)).as("xs"))
      .select(col("user_id"),
        size(col("xs")).cast("long").as("n_events"),
        element_at(col("xs"), -1).getField("v").as("last_micros"),
        expr("""aggregate(slice(xs, 2, size(xs) - 1),
               |  element_at(xs, 1).v,
               |  (acc, x) -> (x.v + 3L * acc) div 4)""".stripMargin)
          .as("ewma_micros"))
      .orderBy("user_id")
  }

  val pack: Seq[Q] = Seq(

    // 24e2. explicit GROUPING SETS — the general form rollup/cube are sugar
    // for: one pass computes per-status subtotals, per-priority subtotals,
    // and the grand total (no (status,priority) detail rows — exactly the
    // three sets asked for, unlike cube's 4). Same Expand-based single-scan
    // plan as rollup/cube; subtotal NULL keys coalesced to a marker on
    // both engines (subtotalQ's rule).
    Q("q_grouping_sets",
      s"""SELECT coalesce(o_orderstatus, '(all)') AS status,
         |  coalesce(o_orderpriority, '(all)') AS priority,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(${sqlMicros("o_totalprice")}) AS BIGINT) AS total_micros
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin)(
      (s, dir) => t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(Q.cents(col("o_totalprice"))) * 10000L).as("total_micros"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total_micros"))
        .orderBy(col("status"), col("priority"))),

    // 24o. time-bucketed range join: count the purchases corpus-wide inside
    // [ts, ts+10min] of every error event. There is NO equi key here, so
    // the naive join plans as a nested-loop product (|errors|×|purchases|
    // comparisons). Bucketing by the window width turns it into an
    // equi-join: each probe explodes to its ≤2 candidate 10-min buckets,
    // each build row lands in exactly 1, the bucket equi-join + exact
    // range filter produces every pair exactly once (a pair can only meet
    // in the build row's single bucket — no dedup pass). Pair output is
    // bounded by true matches + same-bucket near-misses, never n².
    Q("q_range_join",
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS es FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT epoch_us(ts) AS ps FROM events WHERE event_type = 'purchase'),
        |hits AS (
        |  SELECT e.event_id, CAST(count(*) AS BIGINT) AS n_purch
        |  FROM e JOIN p ON p.ps >= e.es AND p.ps <= e.es + 600000000
        |  GROUP BY 1)
        |SELECT e.event_id, CAST(coalesce(h.n_purch, 0) AS BIGINT) AS n_purch
        |FROM e LEFT JOIN hits h USING (event_id)
        |ORDER BY event_id""".stripMargin)(
      (s, dir) => {
        val W = 600000000L // 10 min in epoch micros = bucket width
        val us = unix_micros(col("ts").cast("timestamp"))
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), us.as("es"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(us.as("ps"))
        val eb = errors.withColumn("bucket",
          explode(array_distinct(array(expr(s"es div $W"), expr(s"(es + $W) div $W")))))
        val pb = purch.withColumn("bucket", expr(s"ps div $W"))
        val hits = eb.join(pb, Seq("bucket"))
          .filter(col("ps") >= col("es") && col("ps") <= col("es") + W)
          .groupBy("event_id").agg(count(lit(1)).as("n_purch"))
        errors.select("event_id")
          .join(hits, Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("n_purch"), lit(0L)).as("n_purch"))
          .orderBy("event_id")
      }),

    // As-of join: each purchase matched to the latest click at-or-before it
    // by the same user — the canonical event-attribution shape Spark has no
    // native operator for. A range join (p.ts >= c.ts) would explode to
    // |purchases|×|clicks| per user before filtering; instead both sides
    // union into ONE stream tagged so clicks sort before purchases at equal
    // ts, and a running last-click window computes every match in a single
    // shuffle by user_id. DuckDB validates via its native ASOF JOIN.
    Q("q_asof_join",
      s"""SELECT p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS c_ts,
        |  ${sqlMicros("c.value")} AS c_value_micros
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (
        |  SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'click' GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, p_ts""".stripMargin)(
      (s, dir) => {
        val ev = t(s, dir, "events")
        // Tie rule WITHOUT an extra shuffle: instead of pre-aggregating
        // clicks to one row per (user_id, ts) — which cost its own
        // exchange before the window — the running aggregate is
        // max(struct(c_ts, c_value)): lexicographic struct max IS
        // "latest ts, and among equal-ts clicks the max value", i.e. the
        // same deterministic winner the oracle's pre-aggregated ASOF JOIN
        // picks. One shuffle total (the user_id window sort).
        val cvType = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("c_ts", ev.schema("ts").dataType),
          org.apache.spark.sql.types.StructField("c_value",
            org.apache.spark.sql.types.DoubleType)))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(0).as("tag"),
            struct(col("ts").as("c_ts"),
              col("value").cast("double").as("c_value")).as("cv"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("tag"),
            lit(null).cast(cvType).as("cv"))
        // tag orders equal-ts clicks BEFORE the purchase so they are
        // inside its frame; max itself is order-insensitive
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("tag").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("last_cv", max(col("cv")).over(w))
          .filter(col("tag") === 1 && col("last_cv").isNotNull)
          .select(col("user_id"),
            date_format(col("ts"), tsFmt).as("p_ts"),
            date_format(col("last_cv.c_ts"), tsFmt).as("c_ts"),
            micros(col("last_cv.c_value")).as("c_value_micros"))
          .orderBy(col("user_id"), col("p_ts"))
      }),

    // Rollup subtotals (GROUP BY ROLLUP) — prefix grouping sets.
    subtotalQ("q_rollup", "ROLLUP",
      _.rollup(col("o_orderstatus"), col("o_orderpriority"))),

    // Exact interpolated percentiles. Integer-valued quantities make the
    // p50 interpolation exact (halves); p90 hash-equality across engines is
    // verified empirically at sf0.001/0.01 (both engines evaluate
    // lower + (upper-lower)*frac on identical IEEE doubles).
    Q("q_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  CAST(min(l_quantity) AS DOUBLE) AS min_qty,
        |  CAST(max(l_quantity) AS DOUBLE) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))),

    // 24q. Trimmed (winsor-bounded) mean — the robust aggregate a profiling
    // pass uses when outliers poison a plain mean: per group, the exact
    // p05/p95 bounds (same interpolated percentile both engines — its
    // bit-equality is already proven by q_percentile) come from one
    // aggregate over the group, then the mean of in-range values in exact
    // integer micros. The 3-row bounds table joins back by BROADCAST; two
    // scans total, both fully parallel — no per-group total order anywhere.
    Q("q_trimmed_mean", {
      val rowMicros = sqlMicros("l_extendedprice")
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, 0.05) AS p05,
         |    quantile_cont(l_extendedprice, 0.95) AS p95
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l.l_returnflag,
         |  CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  CAST(CAST(SUM($rowMicros) AS BIGINT) // COUNT(*) AS BIGINT) AS trimmed_mean_micros
         |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
         |WHERE l.l_extendedprice >= b.p05 AND l.l_extendedprice <= b.p95
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin
    })(
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        // per-group exact p05/p95 via distributed bucket refinement — no
        // single-reducer percentile buffer (see ExactQuantiles); seeded
        // from parquet footer bounds, so the metadata round costs no scan
        val qs = ExactQuantiles.continuous(
          li, col("l_returnflag"), col("l_extendedprice"), Seq(0.05, 0.95),
          ExactQuantiles.footerMicroBounds(
            s, Tables.path(dir, "lineitem"), "l_extendedprice"))
        val bounds = qs.toSeq.map { case (g, a) => (g, a(0), a(1)) }
          .toDF("l_returnflag", "p05", "p95")
        li.join(broadcast(bounds), "l_returnflag")
          .filter(col("l_extendedprice") >= col("p05") &&
            col("l_extendedprice") <= col("p95"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_kept"),
            (sum(Q.cents(col("l_extendedprice"))) * 10000L).as("__s"))
          .withColumn("trimmed_mean_micros", expr("__s div n_kept")).drop("__s")
          .orderBy(col("l_returnflag"))
      }),

    // 24r. Grouped 3-sigma outlier detection — the "flag events whose value
    // deviates from their type's distribution" pass of telemetry QA, in
    // EXACT integer algebra so it hash-checks cross-engine: the float test
    // (v - s/n)² > 9·var, var = (n·q - s²)/n², cross-multiplies to
    // (n·v - s)² > 9·(n·q - s²) over the group's exact moments
    // (n, s = Σv, q = Σv² in micros) — no float mean/stddev anywhere.
    // One linear pass builds the per-type moment table (map-side partials,
    // rows = |event_type|), it broadcasts back onto the scan, and the
    // outlier filter+rollup is a second fully-parallel pass — the same
    // two-scan broadcast-back shape as q_trimmed_mean, with no per-group
    // total order. Headroom: (n·v)² needs DECIMAL(38,0)/HUGEINT and fits
    // up to n ≈ 1e9 rows per group at 1e9-micro values; past that, rescale
    // the unit (Q.micros' playbook).
    Q("q_outlier_events", {
      val v = sqlMicros("value")
      s"""WITH p AS (SELECT event_type, $v AS v FROM events),
         |m AS (
         |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         |    CAST(SUM(v) AS HUGEINT) AS s,
         |    CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
         |  FROM p GROUP BY event_type)
         |SELECT p.event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(CASE WHEN (m.n * p.v - m.s) * (m.n * p.v - m.s)
         |      > 9 * (m.n * m.q - m.s * m.s) THEN 1 END) AS BIGINT) AS n_outliers,
         |  CAST(SUM(CASE WHEN (m.n * p.v - m.s) * (m.n * p.v - m.s)
         |      > 9 * (m.n * m.q - m.s * m.s) THEN p.v ELSE 0 END) AS BIGINT) AS outlier_sum_micros
         |FROM p JOIN m USING (event_type)
         |GROUP BY p.event_type ORDER BY p.event_type""".stripMargin
    })(
      (s, dir) => {
        val p = t(s, dir, "events")
          .select(col("event_type"), micros(col("value")).as("v"))
        val isOut = outlierTest
        p.join(broadcast(eventMoments(p)), "event_type")
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            count(when(isOut, lit(1))).as("n_outliers"),
            sum(when(isOut, col("v")).otherwise(lit(0L))).cast("long")
              .as("outlier_sum_micros"))
          .orderBy(col("event_type"))
      }),

    // Funnel analysis: strictly-ordered stage progression per user
    // (first signup → first later click → first later purchase). Each stage
    // is a semi-join-shaped aggregate against the previous stage's per-user
    // anchor timestamp; the output row carries per-stage user counts plus
    // epoch-minute checksums of the chosen anchors so the oracle is
    // sensitive to WHICH event each stage selected, not just how many.
    Q("q_funnel",
      """WITH s AS (SELECT user_id, min(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
        |      WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
        |       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after,
        |       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after,
        |       CAST((SELECT SUM(epoch_us(s_ts) // 60000000) FROM s) AS BIGINT) AS s_minute_sum,
        |       CAST((SELECT SUM(epoch_us(c_ts) // 60000000) FROM c) AS BIGINT) AS c_minute_sum,
        |       CAST((SELECT SUM(epoch_us(p_ts) // 60000000) FROM p) AS BIGINT) AS p_minute_sum""".stripMargin)(
      (s, dir) => {
        val ev = t(s, dir, "events")
        // ts is TimestampNTZ; cast→timestamp is instant-preserving under the
        // fixed UTC session timezone, then unix_micros is exact; `div` keeps
        // the epoch-minute arithmetic integral end to end
        def minuteOf(name: String): Column =
          expr(s"unix_micros(CAST($name AS TIMESTAMP)) div 60000000")
        val sStage = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
        val cStage = ev.filter(col("event_type") === "click").as("e")
          .join(sStage.as("s"),
            col("e.user_id") === col("s.user_id") && col("e.ts") > col("s.s_ts"))
          .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("c_ts"))
        val pStage = ev.filter(col("event_type") === "purchase").as("e")
          .join(cStage.as("c"),
            col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.c_ts"))
          .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("p_ts"))
        sStage.agg(count(lit(1)).as("n_signup"),
            sum(minuteOf("s_ts")).as("s_minute_sum"))
          .crossJoin(cStage.agg(count(lit(1)).as("n_click_after"),
            sum(minuteOf("c_ts")).as("c_minute_sum")))
          .crossJoin(pStage.agg(count(lit(1)).as("n_purchase_after"),
            sum(minuteOf("p_ts")).as("p_minute_sum")))
          .select(col("n_signup"), col("n_click_after"), col("n_purchase_after"),
            col("s_minute_sum"), col("c_minute_sum"), col("p_minute_sum"))
      }),

    // 30c. Top event PATHS — sequence mining over the event log: the most
    // frequent 3-step event-type paths across all user timelines (the
    // "common journeys" companion to q_funnel's fixed 3-stage funnel —
    // here the paths are DISCOVERED, not declared). One user-keyed window
    // builds each position's (e, next, next2) via two leads riding the
    // SAME exchange; paths collapse to a (path, count) aggregate whose
    // key space is |event vocabulary|³ — tiny — and the top-20 is a
    // TakeOrdered, never a global sort. Tie order (count desc, path asc)
    // plus the (epoch-us, event_id) order key make it bit-deterministic.
    Q("q_event_paths",
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT e1 || '>' || e2 || '>' || e3 AS path, CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin)(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(expr("unix_micros(CAST(ts AS TIMESTAMP))"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          // all three steps non-null EXPLICITLY on both engines: a NULL
          // event_type mid-path would otherwise diverge (concat_ws skips
          // nulls, SQL || nullifies) — latent until data carries one
          .filter(col("event_type").isNotNull && col("e2").isNotNull &&
            col("e3").isNotNull)
          .groupBy(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      }),

    // 24w. Per-entity SEQUENTIAL fold (integer EWMA): the batch analogue
    // of per-key streaming state — each user's time-ordered event values
    // fold through s_i = (v_i + 3·s_{i-1}) div 4 (α=1/4 in exact integer
    // micros; values clamp at 0 on BOTH engines so trunc-div ≡ floor-div
    // by construction, not by assumption about the data). A recursive-by-
    // nature statistic no window frame expresses: the per-user history
    // collects to ONE row and folds as an array aggregate — the same
    // per-key-history-fits-in-memory contract flatMapGroupsWithState has,
    // with shuffle ∝ events, state ∝ users, and a pre-checked per-key cap
    // that fails loudly naming any hot entity (see ewmaPerEntity) instead
    // of OOMing an executor. Order is (epoch-us, event_id), tie-stable.
    Q("q_ewma",
      """WITH e AS (
        |  SELECT user_id,
        |    {'us': epoch_us(ts), 'ev': event_id,
        |     'v': greatest(CAST(round(value * 1000000) AS BIGINT), 0)} AS x
        |  FROM events),
        |l AS (SELECT user_id, list_sort(list(x)) AS xs FROM e GROUP BY user_id)
        |SELECT user_id,
        |  CAST(len(xs) AS BIGINT) AS n_events,
        |  xs[-1].v AS last_micros,
        |  list_reduce(list_transform(xs, x -> x.v),
        |    (acc, v) -> (v + 3 * acc) // 4) AS ewma_micros
        |FROM l ORDER BY user_id""".stripMargin)(
      (s, dir) => ewmaPerEntity(t(s, dir, "events"))),

    // 30b. Cohort retention matrix — the product-analytics triangle: users
    // grouped by first-active day, distinct actives per (cohort, day
    // offset). Scale shape: the (user, day) distinct and the first-day
    // aggregate both hash-partition by user_id, so the activity⋈first join
    // reuses that partitioning (exchange reuse, no third shuffle); the
    // final rollup aggregates ≤ |users|·|active days| rows, and no stage
    // ever holds a per-user timeline in one place.
    Q("q_retention",
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS d0 FROM act GROUP BY user_id)
        |SELECT f.d0 AS cohort_day,
        |  CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS day_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM act a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)(
      (s, dir) => {
        val act = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val first = act.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
        act.join(first, "user_id")
          .groupBy(col("d0").as("cohort_day"),
            datediff(col("d"), col("d0")).cast("long").as("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy(col("cohort_day"), col("day_offset"))
      }),

    // Ordered string aggregation: the listagg/string_agg family. Spark's
    // collect_set is unordered, so sort_array fixes a total order before
    // joining — deterministic on both engines (DuckDB string_agg takes an
    // explicit ORDER BY over the deduped set).
    Q("q_string_agg",
      """WITH d AS (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |SELECT o_orderpriority,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
        |  CAST(count(*) AS BIGINT) AS n_statuses
        |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          size(collect_set(col("o_orderstatus"))).cast("long").as("n_statuses"))
        .orderBy(col("o_orderpriority"))),

    // Semi-structured JSON columns: extract a typed field from the events'
    // JSON props and aggregate it — get_json_object stays inside codegen
    // (no UDF), and integer outputs make the cross-engine compare exact.
    Q("q_json_extract",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)(
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k").cast("long")
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(k).as("sum_k"),
            min(k).as("min_k"), max(k).as("max_k"))
          .orderBy(col("event_type"))
      }),

    // CUBE — all 2^n grouping-set combinations (rollup only covers prefix
    // sets, so cube additionally emits the priority-only subtotals).
    subtotalQ("q_cube", "CUBE",
      _.cube(col("o_orderstatus"), col("o_orderpriority"))),

    // RANGE-frame rolling window: the sum covers every order within the
    // trailing 30 DAYS, not the trailing 30 ROWS — value-based frames are
    // distinct window semantics from q_window_running's row frame. Both
    // engines order by an integer epoch-day so the frame bounds are exact.
    Q("q_window_range",
      s"""SELECT o_custkey, o_orderkey,
        |  CAST(SUM(${sqlMicros("o_totalprice")}) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_30d_micros
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)(
      (s, dir) => {
        val day = datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1990-01-01")))
        val w = Window.partitionBy(col("o_custkey")).orderBy(day.cast("long"))
          .rangeBetween(-30, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(Q.cents(col("o_totalprice"))).over(w) * 10000L).as("rolling_30d_micros"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      }),

    // Deterministic hash sampling (~10%): keep rows whose md5(key) prefix
    // falls under 6554/65536. Unlike rand()-based TABLESAMPLE this is
    // reproducible across retries, partitionings, and engines — the property
    // a 100 TB training-data pipeline needs for auditable subsets — and it
    // is a pure map (no shuffle) that composes with pushdown.
    Q("q_sample_hash", {
      val duckV = (0 until 4).map { d =>
        s"(strpos('0123456789abcdef', substr(md5(k), ${d + 1}, 1)) - 1) * ${math.pow(16, 3 - d).toInt}"
      }.mkString(" + ")
      s"""WITH keyed AS (
        |  SELECT l_returnflag, ${sqlMicros("l_extendedprice")} AS micros,
        |    concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey) AS k
        |  FROM lineitem),
        |sampled AS (SELECT * FROM keyed WHERE $duckV < 6554)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(SUM(micros) AS BIGINT) AS sum_micros
        |FROM sampled GROUP BY 1 ORDER BY 1""".stripMargin
    })(
      (s, dir) => {
        // conv(hex, 16, 10) == the oracle's per-digit arithmetic, but with a
        // single md5 per row (four md5 copies defeat subexpression reuse in
        // a filter) — big-endian first-4-hex value in [0, 65536)
        val sparkV = "CAST(conv(substr(md5(cast(k as binary)), 1, 4), 16, 10) AS INT)"
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), micros(col("l_extendedprice")).as("micros"),
            concat_ws("|", col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey")).as("k"))
          .filter(expr(sparkV) < 6554)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_sampled"), sum(col("micros")).as("sum_micros"))
          .orderBy(col("l_returnflag"))
      }),

    // Deterministic STRATIFIED sampling: exactly k documents per stratum
    // (language), chosen by md5 order within the stratum — the balanced-
    // per-class subset a training pipeline draws (uniform sampling starves
    // rare strata). One shuffle by stratum, bounded output; the md5 ranking
    // is engine-identical so the exact picked rows hash-check.
    Q("q_sample_stratified",
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(rn AS BIGINT) AS rn
        |FROM ranked WHERE rn <= 20 ORDER BY lang, rn""".stripMargin)(
      (s, dir) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 20)
          .orderBy(col("lang"), col("rn"))
      }),

    // Deterministic MIXTURE sampling: per-source keep rates — the training-
    // data mixture-weighting knob (upweight curated sources, downsample the
    // crawl). Same md5-threshold primitive as q_sample_hash, with the
    // threshold a CASE over the source; pure map (no shuffle before the
    // reporting agg), reproducible across retries/partitionings/engines.
    // Rates here: sources 0-4 keep all, 5-9 half, 10-14 quarter, rest ~10%.
    Q("q_sample_mixture", {
      val duckV = (0 until 4).map { d =>
        s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${d + 1}, 1)) - 1) * ${math.pow(16, 3 - d).toInt}"
      }.mkString(" + ")
      val thr = """CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 65536
                  |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 32768
                  |    WHEN source IN ('src10','src11','src12','src13','src14') THEN 16384
                  |    ELSE 6554 END""".stripMargin
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE $duckV < $thr
         |GROUP BY source ORDER BY source""".stripMargin
    })(
      (s, dir) => {
        val v = expr(
          "CAST(conv(substr(md5(cast(cast(doc_id AS string) AS binary)), 1, 4), 16, 10) AS INT)")
        val thr = expr(
          """CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 65536
            |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 32768
            |    WHEN source IN ('src10','src11','src12','src13','src14') THEN 16384
            |    ELSE 6554 END""".stripMargin)
        t(s, dir, "documents")
          .filter(v < thr)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"))
      }),

    // 41l. TRAIN/VAL/TEST SPLIT ASSIGNMENT — the last step before a corpus
    // ships: a deterministic, content-independent 80/10/10 split keyed on
    // md5(doc_id), so membership survives retries, repartitioning, engine
    // swaps, and incremental corpus growth (a doc's split never changes
    // when other docs arrive — the property random() splits lack). Pure
    // map + one count shuffle; the per-source breakdown doubles as the
    // stratification check (each source should split ≈80/10/10).
    Q("q_split_assign", {
      s"""SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM (
         |  SELECT source, n_chars,
         |    ${splitSql()} AS split
         |  FROM documents)
         |GROUP BY source, split ORDER BY source, split""".stripMargin
    })(
      (s, dir) => {
        t(s, dir, "documents")
          .withColumn("split", splitColumn())
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"), col("split"))
      }),

    // 24u. deterministic WEIGHTED sampling — importance sampling with a
    // per-ROW weight (here n_chars: longer documents kept proportionally
    // more often), the knob between uniform hash sampling (24h) and
    // per-source mixture rates (24m). Keep test is the cross-multiplied
    // integer form hash16 · max_w < w · 2^16 (no division, no rounding
    // drift), with the hash salted separately from the split/sample
    // hashes so the decisions stay independent. One metadata aggregate
    // (max weight) broadcast back; the keep itself is a pure map —
    // reproducible across retries, engines, and corpus growth.
    Q("q_sample_weighted", {
      val duckH = (0 until 4).map { d =>
        s"(strpos('0123456789abcdef', substr(md5('w:' || CAST(doc_id AS VARCHAR)), ${d + 1}, 1)) - 1) * ${math.pow(16, 3 - d).toInt}"
      }.mkString(" + ")
      s"""WITH mx AS (SELECT MAX(n_chars) AS max_w FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_kept
         |FROM documents, mx
         |WHERE ($duckH) * max_w < n_chars * 65536
         |GROUP BY source ORDER BY source""".stripMargin
    })(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val mx = d.agg(max(col("n_chars")).as("max_w"))
        val h = expr(
          "CAST(conv(substr(md5(cast(concat('w:', cast(doc_id AS string)) AS binary)), 1, 4), 16, 10) AS BIGINT)")
        d.crossJoin(broadcast(mx))
          .filter(h * col("max_w") < col("n_chars") * 65536L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("n_chars_kept"))
          .orderBy(col("source"))
      }),

    // 41i. MIXTURE PLANNING — the sizing step that precedes mixture sampling:
    // given target token shares per source tier (curated 50%, web 30%,
    // mid 15%, tail 5%), find the largest total token budget B the corpus
    // supports (the binding tier is the one whose tokens run out first:
    // B = min over tiers of tokens/share) and each tier's keep rate.
    // Everything is integer arithmetic on exact token sums — two tiny
    // shuffles (tier agg, single-row min broadcast back), deterministic
    // cross-engine. Production pipelines run exactly this computation to
    // turn "we want this mixture" into per-tier sampling rates.
    Q("q_mixture_plan", {
      val tier = MixTierSql
      val share = MixShareSql
      s"""WITH d AS (
         |  SELECT $tier AS tier,
         |    CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |g AS (
         |  SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(toks) AS BIGINT) AS tokens, ($share) AS share_milli
         |  FROM d GROUP BY tier),
         |b AS (SELECT MIN(tokens * 1000 // share_milli) AS budget FROM g)
         |SELECT tier, n_docs, tokens, CAST(share_milli AS BIGINT) AS share_milli,
         |  LEAST(1000000, (budget * share_milli // 1000) * 1000000 // tokens) AS rate_micro,
         |  tokens * LEAST(1000000, (budget * share_milli // 1000) * 1000000 // tokens) // 1000000 AS target_tokens
         |FROM g, b ORDER BY tier""".stripMargin
    })(
      (s, dir) => {
        val tier = expr(MixTierSql)
        val toks = size(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
          .cast("long")
        val g = t(s, dir, "documents")
          .select(tier.as("tier"), toks.as("toks"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
          .withColumn("share_milli", expr(MixShareSql).cast("long"))
        val b = g.agg(min(expr("tokens * 1000 div share_milli")).as("budget"))
        g.crossJoin(broadcast(b))
          .withColumn("rate_micro", expr(
            "LEAST(1000000L, (budget * share_milli div 1000) * 1000000 div tokens)"))
          .select(col("tier"), col("n_docs"), col("tokens"), col("share_milli"),
            col("rate_micro"),
            expr("tokens * rate_micro div 1000000").as("target_tokens"))
          .orderBy("tier")
      }),

    // 41g2. MIXTURE SELECTION — execute the plan q_mixture_plan sized:
    // per tier, take documents in deterministic md5 order until the
    // tier's token target is met (greedy prefix, cum <= target). The
    // NAIVE form is one per-tier window cumsum over every document — a
    // single reducer per tier, the classic 100 TB bottleneck. The Spark
    // side instead refines in two levels: documents pre-aggregate into
    // 256 md5-prefix RANK BUCKETS per tier (the bucket value IS the
    // first two hex digits of the rank, so bucket order == rank order),
    // the tiny (tier × 256)-row bucket table cumsums to classify each
    // bucket wholesale (entirely inside / outside the budget), and only
    // the ONE boundary bucket per tier pays a doc-level window over
    // ~1/256 of the tier (use 4 hex digits → 1/65536 at real scale).
    // The ORACLE is the naive single-window form — hash equality proves
    // the refinement selects exactly the same prefix.
    Q("q_mixture_select", {
      val tier = MixTierSql
      val share = MixShareSql
      s"""WITH d AS (
         |  SELECT doc_id, $tier AS tier,
         |    CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks,
         |    md5(CAST(doc_id AS VARCHAR)) AS r
         |  FROM documents),
         |g AS (SELECT tier, CAST(SUM(toks) AS BIGINT) AS tokens,
         |    ($share) AS share_milli FROM d GROUP BY tier),
         |b AS (SELECT MIN(tokens * 1000 // share_milli) AS budget FROM g),
         |tgt AS (
         |  SELECT tier, tokens * LEAST(1000000,
         |      (budget * share_milli // 1000) * 1000000 // tokens)
         |    // 1000000 AS target_tokens
         |  FROM g, b),
         |c AS (
         |  SELECT doc_id, tier, toks,
         |    SUM(toks) OVER (PARTITION BY tier ORDER BY r, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d)
         |SELECT doc_id, tier, CAST(toks AS BIGINT) AS toks
         |FROM c JOIN tgt USING (tier)
         |WHERE cum <= target_tokens
         |ORDER BY doc_id""".stripMargin
    })(
      (s, dir) => {
        val toksC = size(split(lower(trim(
          regexp_replace(col("text"), "\\s+", " "))), " ")).cast("long")
        val d = t(s, dir, "documents")
          .select(col("doc_id"), expr(MixTierSql).as("tier"),
            toksC.as("toks"),
            md5(col("doc_id").cast("string").cast("binary")).as("r"))
          .withColumn("bkt", expr("CAST(conv(substr(r, 1, 2), 16, 10) AS INT)"))
          // checkpointed: four consumers (tier totals, bucket cumsum, the
          // boundary-bucket doc window, the whole-bucket join) otherwise
          // each re-run the regex tokenize scan of documents
          .localCheckpoint()
        val g = d.groupBy("tier").agg(sum(col("toks")).as("tokens"))
          .withColumn("share_milli", expr(MixShareSql).cast("long"))
        val b = g.agg(min(expr("tokens * 1000 div share_milli")).as("budget"))
        val tgt = g.crossJoin(broadcast(b))
          .select(col("tier"), expr(
            "tokens * LEAST(1000000L, (budget * share_milli div 1000) " +
              "* 1000000 div tokens) div 1000000").as("target"))
        val wb = Window.partitionBy("tier").orderBy("bkt")
        val bc = d.groupBy("tier", "bkt").agg(sum(col("toks")).as("btoks"))
          .withColumn("cb", sum(col("btoks")).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            - col("btoks"))
          .join(broadcast(tgt), "tier")
        val whole = bc.filter(col("cb") + col("btoks") <= col("target"))
          .select("tier", "bkt")
        val bound = bc.filter(col("cb") < col("target") &&
            col("cb") + col("btoks") > col("target"))
          .select("tier", "bkt", "cb", "target")
        val wd = Window.partitionBy("tier").orderBy("r", "doc_id")
        val boundDocs = d.join(broadcast(bound), Seq("tier", "bkt"))
          .withColumn("cum", sum(col("toks")).over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("cb") + col("cum") <= col("target"))
          .select("doc_id", "tier", "toks")
        d.join(broadcast(whole), Seq("tier", "bkt"))
          .select("doc_id", "tier", "toks")
          .unionByName(boundDocs)
          .orderBy("doc_id")
      }),

    // 41g3. EPOCH (REPEAT) PLANNING — the data-constrained-scaling table
    // (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    // Models"): when the training budget exceeds the corpus, sources
    // REPEAT — but repeating past ~4 epochs stops helping. For budget
    // B = 2× the corpus's unique tokens split by the mixture shares:
    // per tier, the unique tokens, the share's target, the epochs that
    // target implies (milli), the capped epochs actually served, served
    // tokens, and the shortfall the cap leaves unfilled — the number a
    // team uses to decide between scraping more tail data or re-weighting
    // the mixture. Pure integer arithmetic over ONE tier aggregate + a
    // broadcast total; hash-exact.
    Q("q_epoch_plan", {
      val tier = MixTierSql
      val share = MixShareSql
      s"""WITH d AS (
         |  SELECT $tier AS tier,
         |    CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |g AS (SELECT tier, CAST(SUM(toks) AS BIGINT) AS unique_tokens,
         |    ($share) AS share_milli FROM d GROUP BY tier),
         |b AS (SELECT SUM(unique_tokens) * $EpochBudgetX AS budget FROM g),
         |p AS (
         |  SELECT tier, unique_tokens,
         |    CAST(share_milli AS BIGINT) AS share_milli,
         |    budget * share_milli // 1000 AS target_tokens
         |  FROM g, b)
         |SELECT tier, unique_tokens, share_milli,
         |  CAST(target_tokens AS BIGINT) AS target_tokens,
         |  CAST(target_tokens * 1000 // unique_tokens AS BIGINT) AS epochs_milli,
         |  CAST(LEAST(target_tokens * 1000 // unique_tokens, $MaxEpochsMilli) AS BIGINT) AS epochs_capped_milli,
         |  CAST(LEAST(target_tokens, unique_tokens * $MaxEpochsMilli // 1000) AS BIGINT) AS served_tokens,
         |  CAST(target_tokens - LEAST(target_tokens, unique_tokens * $MaxEpochsMilli // 1000) AS BIGINT) AS shortfall_tokens
         |FROM p ORDER BY tier""".stripMargin
    })(
      (s, dir) => {
        val toksC = size(split(lower(trim(
          regexp_replace(col("text"), "\\s+", " "))), " ")).cast("long")
        val g = t(s, dir, "documents")
          .select(expr(MixTierSql).as("tier"), toksC.as("toks"))
          .groupBy("tier").agg(sum(col("toks")).as("unique_tokens"))
          .withColumn("share_milli", expr(MixShareSql).cast("long"))
        val b = g.agg((sum(col("unique_tokens")) * EpochBudgetX).as("budget"))
        g.crossJoin(broadcast(b))
          .withColumn("target_tokens",
            expr("budget * share_milli div 1000"))
          .withColumn("epochs_milli",
            expr("target_tokens * 1000 div unique_tokens"))
          .withColumn("epochs_capped_milli",
            expr(s"LEAST(epochs_milli, ${MaxEpochsMilli}L)"))
          .withColumn("served_tokens", expr(
            s"LEAST(target_tokens, unique_tokens * $MaxEpochsMilli div 1000)"))
          .withColumn("shortfall_tokens",
            expr("target_tokens - served_tokens"))
          .select("tier", "unique_tokens", "share_milli", "target_tokens",
            "epochs_milli", "epochs_capped_milli", "served_tokens",
            "shortfall_tokens")
          .orderBy("tier")
      }),

    // 41g4. TEMPERATURE-SCALED MIXTURE — the α-sampling rule multilingual
    // and multi-source training uses (weights ∝ tokens^α, α = 1/2 here):
    // flattens the head sources and up-weights the tail relative to
    // proportional sampling, without the cliff of uniform. Exactness:
    // sqrt of an exact BIGINT token count is correctly rounded IEEE on
    // both engines (inputs < 2^53), so floor(sqrt(·)) is engine-identical
    // and every share/boost derives from integer arithmetic on those
    // floors. Per source: tokens, raw share, temperature weight, scaled
    // share, and the boost ratio vs proportional (micro fixed-point).
    // One source agg + a broadcast 1-row total — the q_mixture_plan shape.
    Q("q_mixture_temperature",
      s"""WITH d AS (
         |  SELECT source,
         |    CAST(len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS BIGINT) AS toks
         |  FROM documents),
         |g AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS tokens,
         |    CAST(floor(sqrt(CAST(SUM(toks) AS DOUBLE))) AS BIGINT) AS w
         |  FROM d GROUP BY source),
         |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot,
         |    CAST(SUM(w) AS BIGINT) AS wtot FROM g)
         |SELECT source, tokens,
         |  CAST(tokens * 1000000 // tot AS BIGINT) AS raw_share_micro,
         |  w,
         |  CAST(w * 1000000 // wtot AS BIGINT) AS temp_share_micro,
         |  CAST((w * 1000000 // wtot) * 1000000
         |    // NULLIF(tokens * 1000000 // tot, 0) AS BIGINT) AS boost_micro
         |FROM g, t ORDER BY source""".stripMargin)(
      (s, dir) => {
        val toksC = size(split(lower(trim(
          regexp_replace(col("text"), "\\s+", " "))), " ")).cast("long")
        val g = t(s, dir, "documents")
          .select(col("source"), toksC.as("toks"))
          .groupBy("source").agg(sum(col("toks")).as("tokens"))
          .withColumn("w",
            floor(sqrt(col("tokens").cast("double"))).cast("long"))
        val tot = g.agg(sum(col("tokens")).as("tot"),
          sum(col("w")).as("wtot"))
        g.crossJoin(broadcast(tot))
          .withColumn("raw_share_micro", expr("tokens * 1000000 div tot"))
          .withColumn("temp_share_micro", expr("w * 1000000 div wtot"))
          .withColumn("boost_micro", expr(
            "temp_share_micro * 1000000 div NULLIF(raw_share_micro, 0)"))
          .select("source", "tokens", "raw_share_micro", "w",
            "temp_share_micro", "boost_micro")
          .orderBy("source")
      }),

    // 24p. Grouped least-squares regression of extendedprice-cents on quantity,
    // computed FROM EXACT INTEGER SUMS: per group one pass accumulates
    // n, Σx, Σy, Σxy, Σx², Σy² as DECIMAL(38,0) (overflow-free at any
    // corpus size, map-side partial agg — this is how you fit millions of
    // per-group models over 100 TB in one shuffle), then slope/intercept/r²
    // derive from the closed form. The sums are bit-identical across
    // engines, so the final double arithmetic — same IEEE expression on
    // identical inputs — hash-matches in milli/micro fixed-point.
    Q("q_regression", {
      val x = "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"
      val y = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
      s"""WITH p AS (
         |  SELECT l_returnflag, $x AS x, $y AS y
         |  FROM lineitem),
         |sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS HUGEINT) AS n,
         |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         |    CAST(SUM(x * y) AS HUGEINT) AS sxy,
         |    CAST(SUM(x * x) AS HUGEINT) AS sxx,
         |    CAST(SUM(y * y) AS HUGEINT) AS syy
         |  FROM p GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         |  CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * 1000
         |    / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope_milli,
         |  CAST(ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE) * 1000
         |    / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS icept_milli,
         |  CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) * 1000000
         |    / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT) AS r2_micro
         |FROM sums ORDER BY l_returnflag""".stripMargin
    })(
      (s, dir) => {
        // per-row arithmetic stays in 64-bit longs (x ≤ 50, y ≤ 1e7 cents →
        // y² ≤ 1e14, no overflow); only the AGGREGATION BUFFERS are
        // DECIMAL(38,0), where overflow would otherwise bite at corpus
        // scale (Σy² ≈ 6e20 at sf1 alone)
        // primitive equivalents of the decimal(18,2)-cast forms (Q.cents):
        // integral quantity truncates exactly; cents of 2-dec money exact
        val xL = col("l_quantity").cast("long")
        val yL = graft.Q.cents(col("l_extendedprice"))
        def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
        val sums = t(s, dir, "lineitem")
          .select(col("l_returnflag"), xL.as("x"), yL.as("y"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast("decimal(38,0)").as("n"),
            dsum(col("x")).as("sx"),
            dsum(col("y")).as("sy"),
            dsum(col("x") * col("y")).as("sxy"),
            dsum(col("x") * col("x")).as("sxx"),
            dsum(col("y") * col("y")).as("syy"))
        sums.select(
          col("l_returnflag"),
          col("n").cast("long").as("n"),
          expr("""CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * 1000
                 |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)""".stripMargin)
            .as("slope_milli"),
          expr("""CAST(ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE) * 1000
                 |  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)""".stripMargin)
            .as("icept_milli"),
          expr("""CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) * 1000000
                 |  / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)""".stripMargin)
            .as("r2_micro"))
          .orderBy(col("l_returnflag"))
      }),

    // 24p2. CORRELATION MATRIX in one pass — every pairwise Pearson
    // correlation of (quantity, price-cents, discount-cents) per group
    // from ONE scan: the aggregate carries all 10 exact integer moments
    // (DECIMAL(38,0) buffers, per-row math in longs — q_regression's
    // overflow discipline), and each pair's correlation derives from the
    // closed form afterward. The naive per-pair plan scans the table
    // C(k,2) times; this one is O(k²) extra aggregate STATE, not extra
    // reads — the EDA/feature-audit shape for a 100 TB table. Final
    // division happens in doubles on exact integer inputs with identical
    // expression trees both engines (same q_regression determinism
    // argument), rounded to milli units.
    Q("q_corr_matrix", {
      val q = "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)"
      val p = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
      val d = "CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)"
      def corr(sa: String, sb: String, sab: String, saa: String, sbb: String) =
        s"""CAST(ROUND(CAST(n * $sab - $sa * $sb AS DOUBLE) * 1000
           |    / sqrt(CAST(n * $saa - $sa * $sa AS DOUBLE)
           |         * CAST(n * $sbb - $sb * $sb AS DOUBLE))) AS BIGINT)""".stripMargin
      val pairs = Seq(
        ("qty_price", corr("sq", "sp", "sqp", "sqq", "spp")),
        ("qty_disc", corr("sq", "sd", "sqd", "sqq", "sdd")),
        ("price_disc", corr("sp", "sd", "spd", "spp", "sdd")))
        .map { case (name, c) =>
          s"SELECT l_returnflag, '$name' AS pair, CAST(n AS BIGINT) AS n, $c AS corr_milli FROM sums"
        }.mkString("\nUNION ALL ")
      s"""WITH v AS (
         |  SELECT l_returnflag, $q AS q, $p AS p, $d AS d FROM lineitem),
         |sums AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS HUGEINT) AS n,
         |    CAST(SUM(q) AS HUGEINT) AS sq, CAST(SUM(p) AS HUGEINT) AS sp,
         |    CAST(SUM(d) AS HUGEINT) AS sd,
         |    CAST(SUM(q * q) AS HUGEINT) AS sqq, CAST(SUM(p * p) AS HUGEINT) AS spp,
         |    CAST(SUM(d * d) AS HUGEINT) AS sdd,
         |    CAST(SUM(q * p) AS HUGEINT) AS sqp, CAST(SUM(q * d) AS HUGEINT) AS sqd,
         |    CAST(SUM(p * d) AS HUGEINT) AS spd
         |  FROM v GROUP BY l_returnflag)
         |SELECT * FROM ($pairs)
         |ORDER BY l_returnflag, pair""".stripMargin
    })(
      (s, dir) => {
        // primitive equivalents of the decimal(18,2)-cast forms (see
        // Q.cents): quantity is integral so double→long truncation is
        // exact; the ×100 columns are exact cents of 2-dec money
        val qL = col("l_quantity").cast("long")
        val pL = graft.Q.cents(col("l_extendedprice"))
        val dL = graft.Q.cents(col("l_discount"))
        def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
        val sums = t(s, dir, "lineitem")
          .select(col("l_returnflag"), qL.as("q"), pL.as("p"), dL.as("d"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast("decimal(38,0)").as("n"),
            dsum(col("q")).as("sq"), dsum(col("p")).as("sp"),
            dsum(col("d")).as("sd"),
            dsum(col("q") * col("q")).as("sqq"),
            dsum(col("p") * col("p")).as("spp"),
            dsum(col("d") * col("d")).as("sdd"),
            dsum(col("q") * col("p")).as("sqp"),
            dsum(col("q") * col("d")).as("sqd"),
            dsum(col("p") * col("d")).as("spd"))
        def corr(sa: String, sb: String, sab: String, saa: String, sbb: String) =
          expr(s"""CAST(ROUND(CAST(n * $sab - $sa * $sb AS DOUBLE) * 1000
                  |    / sqrt(CAST(n * $saa - $sa * $sa AS DOUBLE)
                  |         * CAST(n * $sbb - $sb * $sb AS DOUBLE))) AS BIGINT)""".stripMargin)
        val pairs = Seq(
          ("qty_price", corr("sq", "sp", "sqp", "sqq", "spp")),
          ("qty_disc", corr("sq", "sd", "sqd", "sqq", "sdd")),
          ("price_disc", corr("sp", "sd", "spd", "spp", "sdd")))
        sums.select(col("l_returnflag"), col("n").cast("long").as("n"),
            explode(array(pairs.map { case (name, c) =>
              struct(lit(name).as("pair"), c.as("corr_milli"))
            }: _*)).as("pc"))
          .select(col("l_returnflag"), col("pc.pair").as("pair"),
            col("n"), col("pc.corr_milli").as("corr_milli"))
          .orderBy(col("l_returnflag"), col("pair"))
      }),

    // Sketch percentiles — the 100 TB path. Exact percentiles buffer every
    // value of a group on one reducer; approx_percentile keeps a fixed-size
    // mergeable summary with map-side partial aggregation, so cost is flat
    // in group size. Rows-only (sketch internals are engine-specific);
    // AnalyticSpec bounds the error against the exact answer.
    Q.rowsOnly("q_approx_percentile")(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("ap50_qty"),
          approx_percentile(col("l_quantity"), lit(0.9), lit(10000)).as("ap90_qty"))
        .orderBy(col("l_returnflag"))),

    // Equi-depth histogram — the optimizer-statistics operator: 8 buckets
    // of ~equal row count over l_extendedprice, reported as per-bucket
    // count + exact [min,max] in micros. The 7 interior boundaries come
    // from ONE interpolated-percentile aggregate (bit-equal across engines,
    // as in q_trimmed_mean) broadcast back onto the scan; bucket id is the
    // count of boundaries strictly below the value (a 7-term when-sum, pure
    // codegen map). Two fully-parallel scans, no per-bucket total order —
    // the same broadcast-back shape that survives any corpus size.
    Q("q_histogram", {
      val probs = (1 to 7).map(i => i / 8.0).mkString("[", ", ", "]")
      val bucket = (1 to 7).map(i => s"CASE WHEN l_extendedprice > bs[$i] THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH b AS (SELECT quantile_cont(l_extendedprice, $probs) AS bs FROM lineitem)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(${sqlMicros("l_extendedprice")}) AS BIGINT) AS lo_micros,
         |  CAST(MAX(${sqlMicros("l_extendedprice")}) AS BIGINT) AS hi_micros
         |FROM (SELECT ($bucket) AS bucket, l_extendedprice FROM lineitem, b)
         |GROUP BY bucket ORDER BY bucket""".stripMargin
    })(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // the 7 boundaries come back as driver metadata (exact distributed
        // selection, ExactQuantiles) and inline as literals — the bucket id
        // is a pure codegen map over the scan, no join at all
        val bs = ExactQuantiles.continuous(
          li, lit(""), col("l_extendedprice"), (1 to 7).map(_ / 8.0),
          ExactQuantiles.footerMicroBounds(
            s, Tables.path(dir, "lineitem"), "l_extendedprice"))("")
        val bucket = (1 to 7)
          .map(i => when(col("l_extendedprice") > lit(bs(i - 1)), 1).otherwise(0))
          .reduce(_ + _)
        li.select(bucket.as("bucket"), col("l_extendedprice"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(micros(col("l_extendedprice"))).as("lo_micros"),
            max(micros(col("l_extendedprice"))).as("hi_micros"))
          .orderBy(col("bucket"))
      })
  )
}
