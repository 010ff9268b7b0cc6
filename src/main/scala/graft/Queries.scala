package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** One named, oracle-checked query: the Spark implementation plus (usually)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))

  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** Cast every timestamp column to DATE. The TPC-H-ish dates are stored as
    * midnight timestamps; emitting DATE on both engines sidesteps parquet
    * timestamp-unit (ns/µs/ms) mismatches in the driver's hash compare.
    */
  def tsToDate(df: DataFrame): DataFrame = {
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == TimestampType || f.dataType == TimestampNTZType)
        acc.withColumn(f.name, col(f.name).cast("date"))
      else acc
    }
  }

  /** Exact BIGINT micro-units (×1e6) of a 2-decimal money value — the one
    * cross-engine-safe money representation (see Relational.scala's header
    * for why DECIMAL output hash-mismatches in the driver's compare). The
    * ×1e6 happens per row BEFORE any sum, summing BIGINTs, because DuckDB
    * caps decimals at 38 digits and SUM(decimal)*1e6 overflows that width.
    *
    * Headroom bound: a BIGINT micros sum holds ~9.2e18, i.e. ~2e8 rows of
    * ~4e10-micro values per GROUP. TPC-H-style groups stay far under that
    * through SF in the thousands; a 100 TB job whose single group nets
    * trillions of rows should sum into DECIMAL(38,0) on both engines
    * instead (Spark ANSI errors on overflow rather than wrapping, so the
    * failure mode is loud, not silent corruption).
    */
  def micros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cents(c) * 10000L

  /** Σ(micros) with ×10⁴ overflow headroom, for money aggregates: sums
    * per-row CENTS (exact primitive longs) and applies the ×10⁴ scale once
    * AFTER aggregation — `sum(micros(c)) = sum(cents(c)) * 10⁴` exactly
    * (distributivity over integers), same codegen cost, same BIGINT output.
    * Why: a per-row-micros BIGINT sum buffer wraps once a group's total
    * passes 2⁶³ (~9.2e18 micros) while the DECLARED output could still be
    * representable only below that same bound — so with cents in the
    * buffer, the partial sums stay ≤ 2⁶³/10⁴ for every group whose final
    * micros answer fits BIGINT at all. The buffer can no longer be the
    * first thing to overflow; the query is exact over the entire domain
    * its declared schema can express (beyond it, no BIGINT engine agrees —
    * DuckDB's HUGEINT→BIGINT cast errors, Spark wraps). This dominates a
    * DECIMAL(38,0) buffer, which pays a per-row decimal conversion (the
    * exact cost the r11 cents rewrite removed) to extend coverage only
    * into answers the schema cannot return anyway.
    */
  def sumMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(cents(c)) * 10000L

  /** Exact BIGINT hundredths (×100) of a 2-decimal money double — the
    * primitive-only equivalent of `cast(cast(c as decimal(18,2)) * 100 as
    * long)`. The decimal cast allocates a BigDecimal per row (double →
    * shortest-string → BigDecimal → setScale), which measured ~2× the whole
    * aggregate time of a money query at sf0.1; this form stays in
    * whole-stage codegen as three primitive double ops and a truncating
    * cast.
    *
    * Equivalence: a 2-decimal value X.YZ is stored as its nearest double c,
    * so c = v·(1+e) with |e| ≤ 2⁻⁵³ and v = round-trip-exact; c*100 lands
    * within ≪0.5 of the integer 100·v for |v| < 2⁴⁴ (~1.7e13) — the
    * worst-case error (representation ulp·100/2 plus the multiply's own
    * rounding ulp(100v)/2) stays ≤ (100·2⁴⁴/2 + 100·2⁴⁴·2/2)·2⁻⁵³ ≈ 0.29
    * there, so adding ±0.5 (away from zero, matching the decimal cast's
    * HALF_UP) and truncating toward zero recovers exactly 100·v. NULLs
    * propagate through the arithmetic. The decimal form and this form agree
    * on every money column in the corpus (golden-diffed at
    * sf0.001/0.01/0.1, r11); inputs wider than 2 decimals would round
    * differently, and magnitudes at or beyond 2⁴⁴ lose the guarantee —
    * both must use the decimal form.
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.when
    (c * 100 + when(c >= 0, 0.5d).otherwise(-0.5d)).cast("long")
  }

  /** Oracle-SQL fragment: per-row BIGINT micros of a 2-decimal money col. */
  def sqlMicros(x: String): String =
    s"CAST(CAST($x AS DECIMAL(18,2)) * 1000000 AS BIGINT)"
}
