package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated quantiles (`quantile_cont` semantics) by
  * bucket refinement — the 100 TB replacement for Spark's built-in exact
  * `percentile` aggregate, whose buffer holds one (value, count) entry per
  * DISTINCT group value and funnels them all through a single reducer. For
  * a high-cardinality column (l_extendedprice: 583k distinct of 600k rows
  * at sf0.1, ~all-distinct at any scale) that plan serializes the whole
  * column into one task; this one never materializes more than bounded
  * metadata anywhere:
  *
  *   round 0   one parallel agg  → per-group (n, min, max)           G rows
  *   round i   one parallel agg  → counts of B equi-width sub-buckets
  *             of each still-open range                        ≤ R·B rows
  *   final     one parallel agg  → (value, count) of the target buckets
  *             only (population ≤ Small by construction)     ≤ R·Small rows
  *
  * Each order statistic's candidate range shrinks by ×B per round, so the
  * loop runs ⌈log_B(n/Small)⌉ rounds — 1 refinement at sf0.1, 2 at 100 TB
  * (B = 2^16). Every scan is fully parallel (broadcast range spec + map-side
  * partial agg); the driver only ever holds bucket COUNTS, never values.
  *
  * Works in the exact long-micros domain (2-decimal money ⇒ ×1e6 is
  * lossless and order-isomorphic; micros.toDouble/1e6 is the correctly-
  * rounded inverse, so reported boundaries are bit-identical to the raw
  * doubles). Interpolation replicates Spark's Percentile formula
  * (lower·(hi−pos) + higher·(pos−lo), pos = p·(n−1)) — the formula the
  * DuckDB `quantile_cont` oracles already hash-match.
  */
object ExactQuantiles {

  private val B = 1L << 16 // sub-buckets per refinement round
  private val Small = 1L << 13 // collect a range once its population ≤ this

  /** Hard ceiling on rows any single driver-side collect may return —
    * the refinement holds COUNTS, never values, but counts still scale
    * with open-ranges × B per round (G·B in the fused round), and a
    * high-cardinality group column would otherwise put G·2^16 count rows
    * on the driver at once. Ranges are processed in batches sized so each
    * collect stays under this (≈24 MB of count rows); extra batches cost
    * extra fully-parallel scans, not memory. ExactQuantilesSpec pins the
    * bound on a many-group column.
    */
  private[graft] val MaxDriverRows = 1L << 20
  private[graft] val BucketRangeBatch: Int =
    math.max(1L, MaxDriverRows / B).toInt // 16 ranges × ≤2^16 buckets
  private[graft] val CollectRangeBatch: Int =
    math.max(1L, MaxDriverRows / Small).toInt // 128 ranges × ≤2^13 values

  /** Test hook: the largest row count any single driver collect returned
    * during the most recent [[continuous]] call.
    */
  @volatile private[graft] var lastMaxCollectRows: Long = 0L

  /** One still-open order statistic: rank (0-indexed) within group `g`,
    * known to lie in [lo, hi] (micros, inclusive) at `offset` among that
    * range's values in sorted order; `pop` = range population (rows).
    */
  private case class Probe(g: String, rank: Long, lo: Long, hi: Long,
                           offset: Long, pop: Long)

  /** Exact per-group quantiles of a 2-decimal money column.
    *
    * @param globalBounds optional [min, max] micros bound covering every
    *        value (e.g. from parquet footer statistics,
    *        [[graft.Tables.footerDoubleBounds]]): when given, the
    *        metadata round 0 (per-group n/min/max scan) FUSES into the
    *        first bucket pass — one scan fewer, same exact results (the
    *        refinement walks identical integer sub-ranges, just seeded
    *        from the global range instead of each group's own).
    * @return group → quantile values aligned with `probs` (groups with
    *         n = 0 are absent, matching what a per-group aggregate emits)
    */
  def continuous(df: DataFrame, group: Column, value: Column,
                 probs: Seq[Double],
                 globalBounds: Option[(Long, Long)] = None): Map[String, Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    lastMaxCollectRows = 0L
    def tally(rows: Array[Row]): Array[Row] = {
      lastMaxCollectRows = math.max(lastMaxCollectRows, rows.length.toLong)
      rows
    }
    val base = df
      .select(group.cast("string").as("g"), graft.Q.micros(value).as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)

    def ranksFor(n: Long): Seq[Long] = probs.flatMap { p =>
      val pos = p * (n - 1)
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.distinct.sorted

    // (per-group n for final interpolation, initial probe set)
    val (stats: Map[String, Long], seeded: Seq[Probe]) = globalBounds match {
      case Some((mnG, mxG)) =>
        require(mxG >= mnG, s"bad global bounds [$mnG, $mxG]")
        // fused round: per-(group, global-range sub-bucket) counts in ONE
        // scan; group sizes derive by summing, and every probe starts
        // already refined to its bucket's sub-range. The count matrix is
        // ≤ G·B rows, so collect through a LIMIT probe: complete within
        // MaxDriverRows ⇒ proceed fused (common case, small G); truncated
        // ⇒ a high-cardinality group column — fall back to per-group sizes
        // only (G rows, the irreducible metadata) with probes seeded from
        // the global range, and let the BATCHED refinement rounds below
        // carry the bucketing at bounded driver memory.
        val width = mxG - mnG + 1
        val step = ceilDiv(width, B) // bucket b covers [lo+b·step, lo+(b+1)·step)
        val fusedAgg = base
          .groupBy(col("g"),
            expr(s"(v - ${mnG}L) div ${step}L").as("b"))
          .agg(count(lit(1)).as("c"))
        val probe = tally(fusedAgg.limit((MaxDriverRows + 1).toInt).collect())
        if (probe.length <= MaxDriverRows) {
          val counts = probe
            .groupBy(_.getString(0))
            .map { case (g, rows) =>
              g -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toVector
            }
          val ns = counts.map { case (g, bs) => g -> bs.map(_._2).sum }
          val probes = ns.toSeq.flatMap { case (g, n) =>
            val buckets = counts(g)
            ranksFor(n).map { r =>
              var rem = r
              val it = buckets.iterator
              var hit: (Long, Long) = null
              while (hit == null && it.hasNext) {
                val (b, c) = it.next()
                if (rem < c) hit = (b, c) else rem -= c
              }
              require(hit != null, s"fused round lost rank $r of $g")
              val (b, c) = hit
              val nlo = mnG + b * step
              val nhi = math.min(mnG + (b + 1) * step - 1, mxG)
              Probe(g, r, nlo, nhi, rem, c)
            }
          }
          (ns, probes)
        } else {
          val ns = tally(base.groupBy("g").agg(count(lit(1)).as("n")).collect())
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val probes = ns.toSeq.flatMap { case (g, n) =>
            ranksFor(n).map(r => Probe(g, r, mnG, mxG, r, n))
          }
          (ns, probes)
        }
      case None =>
        // round 0: per-group count + value range — G rows of metadata
        val st = tally(base.groupBy("g")
          .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
          .collect())
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
        val probes = st.toSeq.flatMap { case (g, (n, mn, mx)) =>
          ranksFor(n).map(r => Probe(g, r, mn, mx, r, n))
        }
        (st.map { case (g, (n, _, _)) => g -> n }, probes)
    }

    var open: Seq[Probe] = seeded
    val resolved = scala.collection.mutable.Map.empty[(String, Long), Long]

    def settle(p: Probe, v: Long): Unit = resolved((p.g, p.rank)) = v

    // immediate resolutions: single-valued range
    def split(ps: Seq[Probe]): Seq[Probe] = {
      val (done, rest) = ps.partition(p => p.lo == p.hi)
      done.foreach(p => settle(p, p.lo))
      rest
    }
    open = split(open)

    while (open.nonEmpty) {
      // ranges still too populous get bucketed; small ones get collected.
      // Both branches must drain `open`: collect settles its probes this
      // round, bucket replaces its probes with refined ones.
      val (toCollect, toBucket) = open.partition(_.pop <= Small)
      open = Nil

      if (toBucket.nonEmpty) {
        // distinct ranges (probes of one group often share a range); each
        // carries its bucket step = ceil(width / B). Batched: ≤
        // BucketRangeBatch ranges per scan keeps every collect under
        // MaxDriverRows count rows no matter how many groups are open.
        val allRanges = toBucket.map(p => (p.g, p.lo, p.hi)).distinct.zipWithIndex
          .map { case ((g, lo, hi), id) =>
            (id.toLong, g, lo, hi, ceilDiv(hi - lo + 1, B)) }
        val byRange = toBucket.groupBy(p => (p.g, p.lo, p.hi))
        val refined = scala.collection.mutable.ArrayBuffer.empty[Probe]
        for (ranges <- allRanges.grouped(BucketRangeBatch)) {
        val spec = broadcast(ranges.toDF("rid", "rg", "rlo", "rhi", "rstep"))
        // bucket id: floor((v−lo) / step) ∈ [0, B) in EXACT long
        // arithmetic (`div`, not `/` — double division is only ~0.5 ulp
        // accurate and a boundary value rounded into the wrong bucket
        // would fall outside that bucket's exact integer sub-range). The
        // DIVISION form, not (v−lo)·B div width: the product overflows a
        // long for wide-range columns (a 2^31-valued micros column is
        // already 2.1e15 — ×65536 blows past 2^63; caught by a spec).
        val counts = tally(base.join(spec,
            col("g") === col("rg") && col("v") >= col("rlo") && col("v") <= col("rhi"))
          .select(col("rid"), expr("(v - rlo) div rstep").as("b"))
          .groupBy("rid", "b").agg(count(lit(1)).as("c"))
          .collect())
          .groupBy(_.getLong(0))
          .map { case (rid, rows) =>
            rid -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toVector
          }
        refined ++= ranges.flatMap { case (rid, g, lo, hi, step) =>
          val buckets = counts.getOrElse(rid, Vector.empty[(Long, Long)])
          // walk each probe's offset down the cumulative bucket counts
          byRange((g, lo, hi)).map { p =>
            var rem = p.offset
            val it = buckets.iterator
            var hit: (Long, Long) = null
            while (hit == null && it.hasNext) {
              val (b, c) = it.next()
              if (rem < c) hit = (b, c) else rem -= c
            }
            require(hit != null, s"quantile refinement lost rank ${p.rank} of $g")
            val (b, c) = hit
            // sub-range covered by bucket b: [lo + b·step, lo + (b+1)·step)
            val nlo = lo + b * step
            val nhi = math.min(lo + (b + 1) * step - 1, hi)
            Probe(p.g, p.rank, nlo, nhi, rem, c)
          }
        }
        }
        open = split(refined.toSeq)
      }

      if (toCollect.nonEmpty) {
        val allRanges = toCollect.map(p => (p.g, p.lo, p.hi)).distinct.zipWithIndex
          .map { case ((g, lo, hi), id) => (id.toLong, g, lo, hi) }
        val byRange = toCollect.groupBy(p => (p.g, p.lo, p.hi))
        for (ranges <- allRanges.grouped(CollectRangeBatch)) {
        val spec = broadcast(ranges.toDF("rid", "rg", "rlo", "rhi"))
        // (value, count) of the target ranges only — ≤ Small rows per
        // range, ≤ CollectRangeBatch ranges per scan ⇒ every collect
        // bounded by MaxDriverRows
        val vals = tally(base.join(spec,
            col("g") === col("rg") && col("v") >= col("rlo") && col("v") <= col("rhi"))
          .groupBy("rid", "v").agg(count(lit(1)).as("c"))
          .collect())
          .groupBy(_.getLong(0))
          .map { case (rid, rows) =>
            rid -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toVector
          }
        ranges.foreach { case (rid, g, lo, hi) =>
          val sorted = vals.getOrElse(rid, Vector.empty[(Long, Long)])
          byRange((g, lo, hi)).foreach { p =>
            var rem = p.offset
            val it = sorted.iterator
            var out = Option.empty[Long]
            while (out.isEmpty && it.hasNext) {
              val (v, c) = it.next()
              if (rem < c) out = Some(v) else rem -= c
            }
            settle(p, out.getOrElse(
              sys.error(s"quantile collect lost rank ${p.rank} of $g")))
          }
        }
        }
      }
    }

    // interpolate back in the raw double domain (micros/1e6 is the
    // correctly-rounded inverse of the 2-decimal ×1e6 mapping)
    stats.map { case (g, n) =>
      g -> probs.map { p =>
        val pos = p * (n - 1)
        val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
        val lv = resolved((g, lo)).toDouble / 1e6
        if (lo == hi) lv
        else {
          val hv = resolved((g, hi)).toDouble / 1e6
          lv * (hi - pos) + hv * (pos - lo)
        }
      }.toArray
    }
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Footer-statistics bounds of a 2-decimal money column in the micros
    * domain — the zero-scan seed for [[continuous]]'s fused first round.
    * Rounds exactly like `Q.micros` (decimal(18,2) HALF_UP ×1e6), and
    * the mapping is monotone, so footer [min,max] stay covering bounds.
    */
  def footerMicroBounds(spark: org.apache.spark.sql.SparkSession,
                        path: String, column: String): Option[(Long, Long)] =
    graft.Tables.footerDoubleBounds(spark, path, column).flatMap { case (a, b) =>
      // None — never throw — keeps the documented fall-back-to-scan
      // contract: NaN-polluted footer stats blow up the BigDecimal
      // constructor and out-of-micros-range bounds fail longValueExact
      try {
        def m(x: Double) = new java.math.BigDecimal(x)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact
        Some((m(a), m(b)))
      } catch { case _: ArithmeticException | _: NumberFormatException => None }
    }
}
