package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  * Queries execute into the `noop` sink so the full plan (including sorts
  * and projections that `count()` would prune) is materialized.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warm the catalog + JVM (file listing, codegen compiler, shuffle infra)
    Tables.all.foreach(n => Tables.load(spark, sfDir, n).count())

    // contention sentinel: a fixed calibration query timed right after
    // warm-up and again after the last query. On a quiet machine the two
    // agree; a drift > 1.5× means another heavy process (or VM throttling)
    // skewed this run and its numbers should not be published as "the"
    // bench — the r3 headline artifact was exactly that failure mode.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      Tables.load(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // throwaway: pays the sentinel's own codegen
    val calFirst = calibrate()

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      // the cache clear sits in finally: a FAILED extraction query may
      // already have persisted blocks, and leaking them would pressure
      // every remaining measurement — the exact skew the clear prevents
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally spark.catalog.clearCache()
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Queries that took >2s get a second run and report the min: the first
    // run pays codegen compilation and is exposed to transient environment
    // stalls, and sustainable throughput is what baseline comparisons
    // should see. Fast queries keep their single measurement — re-running
    // everything would double the bench's own load for no signal.
    val results = names.map { n =>
      val a = run(n)
      n -> (if (a > 2.0) { val b = run(n); if (b < 0) a else math.min(a, b) }
            else a)
    }
    // Locale.ROOT formatting throughout: the line is machine-parsed JSON,
    // and a decimal-comma default locale (de_DE etc.) would corrupt it
    def n3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + n3(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val calLast = calibrate()
    val drift = math.max(calFirst, calLast) / math.min(calFirst, calLast)
    val contended = drift > 1.5
    val cal = s""""calibration":{"first_sec":${n3(calFirst)},"last_sec":${n3(calLast)},"drift":${String.format(java.util.Locale.ROOT, "%.2f", Double.box(drift))},"contended":$contended}"""
    println(s"""{"metric":"total","value":${n3(total)},"unit":"sec","queries":$qs,$cal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
