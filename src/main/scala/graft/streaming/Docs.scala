package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the §2d document-pipeline operators — the same
  * training-data cleaning that runs over a static corpus, expressed over an
  * unbounded document stream (a crawl feed). Two shapes:
  *
  *  - stateless per-document maps (quality signals, PII scrub, token
  *    counts): identical Column expressions batch or stream, no state, no
  *    watermark — Structured Streaming runs them per micro-batch unchanged;
  *  - stateful exactly-once-per-content dedup: content-fingerprint
  *    `dropDuplicates`, state keyed by the md5 — the streaming face of
  *    q_dedup_exact.
  *
  * Scale posture: the maps are embarrassingly parallel; dedup state is one
  * 16-byte key per distinct document, partitioned by fingerprint. For
  * bounded state on a timestamped feed, `dedupByContent` takes the event-
  * time column + delay and lets the watermark expire old fingerprints.
  */
object Docs {

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  /** Stateless quality + scrub projection: same keep/drop rule as
    * q_quality_score, same masks as q_pii_scrub.
    */
  def qualitySignals(docs: DataFrame): DataFrame = {
    val norm = TextAnalysis.normText(col("text"))
    val nWords = size(split(norm, " ")).cast("long")
    docs.select(
      col("doc_id"),
      TextAnalysis.Pii.scrub(col("text")).as("scrubbed"),
      nWords.as("n_words"),
      (regexp_count(col("text"), lit(TextAnalysis.Pii.email)) +
        regexp_count(col("text"), lit(TextAnalysis.Pii.phone)) +
        regexp_count(col("text"), lit(TextAnalysis.Pii.ip)))
        .cast("long").as("n_pii"),
      when(length(col("text")) >= 100 && nWords >= 20, "keep")
        .otherwise("drop").as("verdict"))
  }

  /** Streaming decontamination: flag stream documents sharing any word
    * n-gram with a STATIC benchmark gram set (one `gram` column). The set
    * is collected ONCE at operator construction into a broadcast variable
    * (a stream-static join would re-run the benchmark lineage every
    * micro-batch, and a giant array literal would blow up codegen) and a
    * lookup UDF scores each document in O(|doc grams|) — the one place a
    * UDF beats the built-ins, whose array_intersect rebuilds the probe set
    * per row. Stream side fully stateless: composes with any downstream
    * watermark/state; the batch explode+aggregate+join-back shape would be
    * an aggregate-then-self-join, which append mode rejects. Mirrors
    * q_decontaminate: per-doc distinct grams, contaminated = any overlap.
    */
  def decontaminate(docs: DataFrame, benchGrams: DataFrame, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val benchSet = spark.sparkContext.broadcast(
      benchGrams.select(col("gram")).distinct().as[String].collect().toSet)
    val nShared = udf((gs: Seq[String]) =>
      if (gs == null) 0L else gs.count(benchSet.value.contains).toLong)
    val out = docs.withColumn("__graft_gs",
      TextAnalysis.gramSet(col("text"), n))
      .withColumn("n_shared", nShared(col("__graft_gs")))
      .withColumn("verdict",
        when(col("n_shared") > 0, "contaminated").otherwise("clean"))
      .drop("__graft_gs")
    out
  }

  /** Exactly-once per normalized content: first arrival wins, byte-copies
    * and whitespace/case variants are dropped. With `eventTimeCol`, the
    * watermark bounds fingerprint state to the delay horizon via
    * `dropDuplicatesWithinWatermark` — a plain dropDuplicates("fp") would
    * never evict state, because eviction requires the event-time column in
    * the key set (re-crawls past the horizon re-admit — the standard
    * streaming-dedup trade). Without a timestamp, state is one 16-byte key
    * per distinct document, growing with corpus vocabulary.
    */
  def dedupByContent(docs: DataFrame,
                     eventTimeCol: Option[String] = None,
                     delay: String = "1 hour"): DataFrame = {
    val fp = docs.withColumn("fp",
      md5(TextAnalysis.normText(col("text")).cast("binary")))
    eventTimeCol match {
      case Some(ts) =>
        fp.withWatermark(ts, delay).dropDuplicatesWithinWatermark("fp")
      case None => fp.dropDuplicates("fp")
    }
  }
}
