package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2d items 31-34 — deduplication operators over `documents`.
  *
  * Scale design: every pipeline is explode → hash → groupBy/self-join on a
  * *bucket key*, so pair generation only ever happens within buckets (LSH
  * bands / simhash buckets / shared n-grams), never corpus × corpus. md5 is
  * the shared deterministic hash primitive (identical hex in Spark+DuckDB);
  * min() over hex strings is the minhash order (binary collation in both).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  import TextAnalysis.{normSql, normText}

  private val NumSeeds = 8 // minhash signature length; bands of 2 → 4 bands
  private val Bands = NumSeeds / 2

  /** md5 string for Spark Column input. */
  private def md5s(c: Column): Column = md5(c.cast("binary"))

  val pack: Seq[Q] = Seq(

    // 31. exact dedup: hash-groupBy of normalized text, min-PK winner.
    // One shuffle on the 32-hex digest; fully map-side parallel before it.
    Q("q_dedup_exact",
      s"""SELECT md5($normSql) AS norm_hash,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(MIN(doc_id) AS BIGINT) AS keeper
         |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
         |ORDER BY norm_hash""".stripMargin)(
      (s, dir) => docs(s, dir)
        .groupBy(md5s(normText(col("text"))).as("norm_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy("norm_hash")),

    // 32. MinHash + LSH near-dup: word 3-shingles → per-seed minhash → band
    // keys → candidate pairs within a band bucket. Three deliberate cost
    // moves, each preserving MinHash semantics and mirrored in the oracle:
    //  - TWO md5s per shingle (plain + prefixed), each split into four
    //    8-hex substrings — md5 bits are independent, so the 8 slices act as
    //    8 independent 32-bit hash permutations at 1/4 the hashing cost of
    //    md5(seed:shingle) per seed (an md5 is 32 hex chars: one digest only
    //    carries four 8-hex slices);
    //  - no DISTINCT before the signature aggregate: min over a multiset
    //    equals min over its set, so the extra shuffle bought nothing and
    //    the groupBy's map-side partial mins do all reduction locally;
    //  - bands come from exploding a 4-element array, not a 4-way union that
    //    would re-evaluate the whole signature subtree per branch.
    Q("q_dedup_minhash", {
      val minhs = (0 until NumSeeds).map { i =>
        val src = if (i < 4) "md5(shingle)" else "md5('x:' || shingle)"
        s"min(substr($src, ${8 * (i % 4) + 1}, 8)) AS h$i"
      }.mkString(",\n  ")
      val bands = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, md5(h${2 * b} || h${2 * b + 1}) AS bkey FROM sigs")
        .mkString("\n  UNION ALL ")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         |  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
         |sigs AS (SELECT doc_id, $minhs FROM sh GROUP BY doc_id),
         |bands AS ($bands)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    })(
      (s, dir) => {
        val toks = docs(s, dir).select(col("doc_id"), split(normText(col("text")), " ").as("t"))
        val sh = toks
          // guard: Spark sequence(0,-1) is DESCENDING (not empty like DuckDB
          // range), and concat_ws skips nulls — short docs need an explicit []
          .select(col("doc_id"), explode(expr(
            "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])) ELSE array() END"))
            .as("shingle"))
        val minAggs = (0 until NumSeeds).map { i =>
          val src = if (i < 4) md5s(col("shingle"))
                    else md5s(concat(lit("x:"), col("shingle")))
          min(substring(src, 8 * (i % 4) + 1, 8)).as(s"h$i")
        }
        val sigs = sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
        val bands = sigs.select(col("doc_id"), explode(array(
          (0 until Bands).map(b => struct(lit(b).as("band"),
            md5s(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bkey"))): _*))
          .as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
        val a = bands.alias("a")
        val bb = bands.alias("b")
        a.join(bb,
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
          .orderBy("doc_a", "doc_b")
      }),

    // 33. SimHash (16-bit): distinct tokens vote ±1 per bit of md5(token);
    // docs sharing a simhash bucket are near-dup candidates. The token hash
    // is parsed into one 16-bit int per row up front (digit 0 = low nibble),
    // so the 16 vote aggregates are pure integer shift/mask — tiny codegen,
    // no per-bit string parsing.
    Q("q_dedup_simhash", {
      val duckV = (0 until 4).map { d =>
        s"(strpos('0123456789abcdef', substr(md5(token), ${d + 1}, 1)) - 1) * ${1 << (4 * d)}"
      }.mkString(" + ")
      val sums = (0 until 16)
        .map(b => s"SUM(2 * ((v >> $b) & 1) - 1) AS s$b").mkString(",\n  ")
      val assemble = (0 until 16)
        .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, t AS token
         |  FROM (SELECT doc_id, UNNEST(string_split($normSql, ' ')) AS t FROM documents)),
         |hashed AS (SELECT doc_id, CAST($duckV AS INTEGER) AS v FROM tok),
         |votes AS (SELECT doc_id, $sums FROM hashed GROUP BY doc_id),
         |sigs AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes)
         |SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS keeper
         |FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
         |ORDER BY simhash""".stripMargin
    })(
      (s, dir) => {
        val tok = docs(s, dir)
          .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("token"))
          .distinct()
        val sparkV = (0 until 4).map { d =>
          s"(instr('0123456789abcdef', substr(md5(cast(token as binary)), ${d + 1}, 1)) - 1) * ${1 << (4 * d)}"
        }.mkString(" + ")
        val hashed = tok.select(col("doc_id"), expr(s"CAST($sparkV AS INT)").as("v"))
        val voteAggs = (0 until 16).map(b =>
          sum(expr(s"2 * (shiftright(v, $b) & 1) - 1")).as(s"s$b"))
        val votes = hashed.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
        val simhash = (0 until 16)
          .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _)
        votes.select(col("doc_id"), simhash.cast("long").as("simhash"))
          .groupBy("simhash")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
          .filter(col("n_docs") > 1)
          .orderBy("simhash")
      }),

    // 34. n-gram Jaccard similarity: word-2-gram sets, pair intersection /
    // union via self-join on shared n-grams (pairs exist only where overlap
    // exists — no cross product). Restricted to one source shard to keep the
    // pair space meaningful.
    Q("q_ngram_jaccard", {
      s"""WITH d AS (SELECT doc_id, $normSql AS s FROM documents WHERE source = 'src0' AND lang = 'en'),
         |toks AS (SELECT doc_id, string_split(s, ' ') AS t FROM d),
         |ng AS (
         |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS gram
         |  FROM toks, UNNEST(range(1, len(t))) AS u(i)),
         |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ng GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM ng a JOIN ng b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_inter,
         |  sa.sz + sb.sz - n_inter AS n_union,
         |  CAST(n_inter * 1000000 // (sa.sz + sb.sz - n_inter) AS BIGINT) AS jac_micro
         |FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE n_inter * 1000000 // (sa.sz + sb.sz - n_inter) >= 100000
         |ORDER BY doc_a, doc_b""".stripMargin
    })(
      (s, dir) => {
        val d = docs(s, dir)
          .filter(col("source") === "src0" && col("lang") === "en")
          .select(col("doc_id"), split(normText(col("text")), " ").as("t"))
        val ng = d.select(col("doc_id"), explode(expr(
          "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1])) ELSE array() END"))
          .as("gram")).distinct()
        val sizes = ng.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val a = ng.alias("a"); val b = ng.alias("b")
        val inter = a.join(b, col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
          .withColumn("n_union", col("sza") + col("szb") - col("n_inter"))
          .withColumn("jac_micro", expr("(n_inter * 1000000L) div n_union"))
          .filter(col("jac_micro") >= 100000)
          .select("doc_a", "doc_b", "n_inter", "n_union", "jac_micro")
          .orderBy("doc_a", "doc_b")
      })
  )
}
