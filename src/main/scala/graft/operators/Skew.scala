package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation patterns (SURVEY §4: "skewed keys → salting").
  *
  * A plain `groupBy(k).agg(countDistinct(c))` on a skewed key routes every
  * row of a hot key through one reducer. Salting splits each hot key across
  * `buckets` sub-keys for the expensive first stage and recombines in a
  * cheap second stage. For count-distinct the salt must be derived from the
  * distinct column itself (`crc32(c) % buckets`) so the per-salt distinct
  * sets partition the value space and their counts are additive.
  */
object Skew {

  /** Two-stage skew-safe distinct count: stage 1 groups on
    * (keys..., crc32(distinct)%buckets) — hot keys fan out over `buckets`
    * reducers; stage 2 sums the partial distinct counts per key.
    */
  def saltedDistinctCount(df: DataFrame, keys: Seq[Column], distinct: Column,
                          buckets: Int, resultName: String): DataFrame = {
    require(!df.columns.contains("__salt") && !df.columns.contains("__partial"),
      "input already has a __salt/__partial column")
    // NOTE: the salt is crc32 of the STRING form, so the distinct column must
    // have one canonical string per equal value. Float/double break this
    // (countDistinct normalizes -0.0 to 0.0; their strings differ) — forbid.
    val dt = df.select(distinct).schema.head.dataType
    require(dt != org.apache.spark.sql.types.DoubleType &&
            dt != org.apache.spark.sql.types.FloatType,
      s"salted distinct count is unsafe for floating-point columns ($dt)")
    val salted = df.withColumn("__salt", pmod(crc32(distinct.cast("string")), lit(buckets)))
    val stage1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(countDistinct(distinct).as("__partial"))
    stage1
      .groupBy(keys: _*)
      .agg(sum("__partial").cast("long").as(resultName))
  }

  /** Two-stage skew-safe sum: stage 1 pre-aggregates per input partition
    * (any salt works for decomposable aggregates — partition id costs no
    * shuffle), stage 2 combines. Spark's partial aggregation already does
    * this for plain sums; the explicit form is the template for aggregates
    * AQE can't split.
    */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column,
                resultName: String): DataFrame = {
    require(!df.columns.contains("__salt") && !df.columns.contains("__partial"),
      "input already has a __salt/__partial column")
    val stage1 = df.withColumn("__salt", spark_partition_id())
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
    stage1.groupBy(keys: _*).agg(sum("__partial").as(resultName))
  }

  /** Skew-safe equi-join: the fact side's hot keys are spread over
    * `buckets` sub-keys by a salt derived from the fact row (crc32 of a
    * discriminator column — deterministic, no rand()), and the dimension
    * side is replicated `buckets`× with an exploded salt array so every
    * (key, salt) pair still meets its match. The join RESULT is identical
    * to the unsalted join — salting only changes partitioning — which is
    * what lets the DuckDB oracle check it with a plain JOIN.
    *
    * This is the manual form of AQE's skew-join splitting, for engines/
    * paths where AQE can't see the skew (e.g. a first shuffle straight out
    * of a scan, or a skewed key known a priori).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, buckets: Int): DataFrame = {
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column")
    // A NULL discriminator must still salt somewhere: crc32(NULL) is NULL
    // and a NULL __salt would silently drop the row from the equi-join,
    // breaking the "result ≡ unsalted join" guarantee. Route NULLs to
    // bucket 0.
    val saltedFact = fact.withColumn("__salt",
      pmod(coalesce(crc32(discriminator.cast("string")), lit(0L)), lit(buckets)).cast("int"))
    val repDim = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  val pack: Seq[Q] = Seq(
    // HLL-sketch distinct estimation next to its exact answer — the scale
    // path when exact distinct is too expensive. Rows-only: sketch estimates
    // are engine-specific by nature; SkewSpec bounds the relative error.
    // The two aggregates run as SEPARATE passes joined on the (tiny) group
    // key: mixing a distinct and a non-distinct aggregate in one `agg`
    // triggers Catalyst's Expand rewrite, which duplicates every input row
    // and measured ~4× slower than the two plain passes combined.
    Q.rowsOnly("q_approx_distinct")(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        val exact = li.groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("exact_orders"))
        approx.join(exact, Seq("l_returnflag")).orderBy("l_returnflag")
      }),

    // Mergeable-sketch rollup — the INCREMENTAL face of approx distinct:
    // one Datasketches HLL sketch per day (at 100 TB these per-partition
    // sketches persist as a standing table, each ingest appending its own
    // day), then ONE tiny union-merge pass re-estimates any span without
    // touching raw data. The whole-corpus exact count rides along so the
    // output itself witnesses the estimate quality (SkewSpec bounds it).
    // Rows-only: sketch estimates are engine-specific by nature.
    Q.rowsOnly("q_hll_rollup")(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"),
            col("ts").cast("timestamp").cast("date").as("day"))
        val daily = ev.groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
        val merged = daily.agg(
          count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("approx_users"))
        val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
        merged.crossJoin(exact)
      }),

    Q("q_agg_salted",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val orders = saltedDistinctCount(li, Seq(col("l_returnflag")),
          col("l_orderkey"), 16, "n_orders").alias("o")
        val parts = saltedDistinctCount(li, Seq(col("l_returnflag")),
          col("l_partkey"), 16, "n_parts").alias("p")
        // null-safe join: a NULL group key must survive like it would in
        // the oracle's GROUP BY
        orders.join(parts, col("o.l_returnflag") <=> col("p.l_returnflag"))
          .select(col("o.l_returnflag"), col("o.n_orders"), col("p.n_parts"))
          .orderBy("l_returnflag")
      }),

    // 24k. skew-safe big⋈big join: lineitem ⋈ orders through the salted
    // join (fact hot keys fanned over 8 sub-keys, dimension replicated 8×).
    // The salt is partitioning-only, so the oracle is the PLAIN join — the
    // hash check proves salting changes nothing but the shuffle layout.
    Q("q_join_salted",
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)(
      (s, dir) => {
        // project the fact side to the 3 columns the query touches BEFORE
        // the salted shuffle (guide §2.3) — the join is on (key, salt), so
        // every retained column crosses the exchange
        val li = Tables.load(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity")
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        saltedJoin(li, ord, "l_orderkey", col("l_partkey"), buckets = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("o_orderstatus")
      })
  )
}
