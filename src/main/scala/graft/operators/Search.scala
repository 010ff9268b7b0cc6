package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FreqSketch

/** SURVEY §2d retrieval + frequency operators over the `documents` corpus:
  * BM25 keyword search (the lexical-retrieval face of the similarity
  * operators in [[Similarity]]) and sketch-verified heavy hitters (the
  * unbounded-key-space frequency operator, via the native Misra-Gries
  * aggregate in functions/FreqSketch.scala).
  *
  * Both follow the house rules: integer-exact arithmetic only (micros +
  * floor-log2 idf — no float log/division anywhere, so results hash-check
  * bit-for-bit against DuckDB), tokenization shared with TextAnalysis
  * (one normalizer, no drift), and no per-token row explosion on the hot
  * path.
  */
object Search {

  import TextAnalysis.{normSql, normText}

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** BM25 query terms — fixed so the query is reproducible; a real search
    * API binds these per request. Chosen with one rare term ("dup",
    * df ≈ 5% of docs) and two common ones so the idf weighting is visible
    * in the ranking.
    */
  val Bm25Terms: Seq[String] = Seq("dup", "join", "scan")

  /** Heavy-hitter sketch width: candidates = items with count > n/HhK. */
  val HhK = 50

  val pack: Seq[Q] = Seq(

    // BM25 retrieval (k1 = 1.2, b = 0.75), integer-exact: the tf-saturation
    // fraction tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) is scaled by 10·A
    // (A = total corpus tokens, avgdl = A/n) into pure BIGINT arithmetic —
    //   part = 2200000·tf·A  //  (10·tf·A + 3·A + 9·dl·n)   [micros]
    // — and idf is the floor-log2 bucket 1 + ⌊log2 n⌋ − ⌊log2 df⌋ via
    // length(bin(x)) (the q_lm_surprisal idiom; no float log). Scale shape:
    // per-doc tf comes from filter() over the token array (pure map, no
    // explode), corpus totals are ONE tiny aggregate broadcast back, and
    // the top-20 is a TakeOrdered, so the whole query is two parallel
    // scans + a k-row sort. Headroom: 2200000·tf·A stays in BIGINT up to
    // A ≈ 1e11 tokens; past that, drop the micro scale to millis on both
    // engines.
    Q("q_bm25", {
      val tfs = Bm25Terms.map(t =>
        s"len(list_filter(string_split($normSql, ' '), x -> x = '$t')) AS tf_$t").mkString(",\n    ")
      val dfs = Bm25Terms.map(t =>
        s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
      val score = Bm25Terms.map(t =>
        s"(1 + length(bin(ndocs)) - length(bin(df_$t))) * " +
          s"((2200000 * tf_$t * atot) // (10 * tf_$t * atot + 3 * atot + 9 * dl * ndocs))")
        .mkString(" + ")
      val tfOut = Bm25Terms.map(t => s"CAST(tf_$t AS BIGINT) AS tf_$t").mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id, len(string_split($normSql, ' ')) AS dl, $tfs
         |  FROM documents),
         |t AS (SELECT COUNT(*) AS ndocs, SUM(dl) AS atot, $dfs FROM d)
         |SELECT * FROM (
         |  SELECT doc_id, CAST(dl AS BIGINT) AS dl, $tfOut,
         |    CAST($score AS BIGINT) AS score_micro
         |  FROM d, t)
         |WHERE score_micro > 0
         |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin
    })(
      (s, dir) => {
        val toks = split(normText(col("text")), " ")
        val base = Tables.spread(docs(s, dir)).select(
          col("doc_id") +: size(toks).cast("long").as("dl") +:
            Bm25Terms.map(t =>
              size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$t")): _*)
        // NOTE (r11): a localCheckpoint here (stats agg + scoring both
        // consume base) measured within noise of the two-scan form and
        // hides the scan-pruning property PlanShapeSpec pins — left as is
        val tot = base.agg(
          count(lit(1)).as("ndocs"),
          sum(col("dl")).as("atot") +:
            Bm25Terms.map(t =>
              sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
        val score = Bm25Terms.map(t =>
          s"(1L + length(bin(ndocs)) - length(bin(df_$t))) * " +
            s"((2200000L * tf_$t * atot) DIV (10L * tf_$t * atot + 3L * atot + 9L * dl * ndocs))")
          .mkString(" + ")
        base.crossJoin(broadcast(tot))
          .withColumn("score_micro", expr(s"CAST($score AS LONG)"))
          .filter(col("score_micro") > 0)
          .select(col("doc_id") +: col("dl") +:
            Bm25Terms.map(t => col(s"tf_$t")) :+ col("score_micro"): _*)
          .orderBy(col("score_micro").desc, col("doc_id"))
          .limit(20)
      }),

    // Exact heavy hitters through the Misra-Gries sketch: pass 1 is ONE
    // distributed aggregate building a ≤ 2·HhK-entry mergeable sketch from
    // the per-doc token arrays (no per-token rows, no full GROUP BY over an
    // unbounded key space — the sketch is what survives the shuffle); its
    // candidate set provably contains every item with count > n/HhK, so
    // pass 2 exact-counts ONLY the ≤ HhK-1 candidates (filter before the
    // explode — shuffle volume ∝ candidate occurrences) and keeps those
    // over the threshold. Output is therefore EXACTLY the true heavy-hitter
    // set — deterministic and hash-checkable against the oracle's plain
    // GROUP BY / HAVING, which at 100 TB would be the unshippable plan.
    Q("q_heavy_hitters",
      s"""WITH toks AS (
         |  SELECT unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tot AS (SELECT COUNT(*) AS n FROM toks)
         |SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM toks GROUP BY term
         |HAVING COUNT(*) > (SELECT n // $HhK FROM tot)
         |ORDER BY term""".stripMargin)(
      (s, dir) => {
        FreqSketch.register(s)
        val toks = split(normText(col("text")), " ")
        val d = Tables.spread(docs(s, dir)).select(toks.as("toks"))
        val sk = d.agg(
          sum(size(col("toks"))).cast("long").as("n"),
          expr(s"mg_topk(toks, $HhK)").as("cands")).head()
        val n = sk.getLong(0)
        val cands = sk.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
        val thr = n / HhK
        d.select(explode(filter(col("toks"),
            t => t.isInCollection(cands))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > thr)
          .orderBy(col("term"))
      })
  )
}
