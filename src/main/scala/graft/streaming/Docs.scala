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
    * n-gram with a STATIC benchmark gram set (one `gram` column) — a
    * stream-static left-semi-style join, stateless on the stream side, so
    * it composes with any downstream watermark/state. The benchmark side is
    * small (eval suites) and broadcasts. Mirrors q_decontaminate's batch
    * semantics: per-doc distinct grams, contaminated = any overlap.
    */
  def decontaminate(docs: DataFrame, benchGrams: DataFrame, n: Int = 3): DataFrame = {
    // the benchmark gram SET rides along as a one-row static side of a
    // broadcast cross join; per-row array_intersect keeps the stream side
    // fully stateless (an explode+groupBy+join-back — the batch shape —
    // would be an aggregate-then-self-join, which append mode rejects)
    val bench = benchGrams.agg(collect_set(col("gram")).as("bench_gs"))
    docs.withColumn("gs",
      array_distinct(TextAnalysis.wordNgrams(
        split(TextAnalysis.normText(col("text")), " "), n)))
      .crossJoin(broadcast(bench))
      .withColumn("n_shared", size(array_intersect(col("gs"), col("bench_gs"))).cast("long"))
      .withColumn("verdict",
        when(col("n_shared") > 0, "contaminated").otherwise("clean"))
      .drop("gs", "bench_gs")
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
