package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-8 operators: asymmetric containment,
  * the per-source dedup funnel, gram novelty, semantic decontamination
  * and per-label embedding cohesion. Each test pins the property the
  * oracle hash cannot express on its own (WHY the answer is right, or
  * an invariant tying two queries together), on crafted corpora or by
  * independent recomputation from the standing indexes.
  */
class R8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Crafted documents table on disk (the registered queries read a dir). */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r8ops").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("containment flags a short doc fully quoted in a long one that Jaccard misses") {
    // doc 1: 41 distinct words (40 grams); doc 2: a 10-word excerpt of it
    // (9 grams, every one shared). Containment of doc 2 is 9/9 = 1.0;
    // Jaccard is 9/40 — under any useful symmetric threshold.
    val longWords = (1 to 41).map(i => s"w$i").mkString(" ")
    val excerpt = (11 to 20).map(i => s"w$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, longWords, "en", "a", longWords.length.toLong),
      (2L, excerpt, "en", "b", excerpt.length.toLong)))
    val out = SparkEntry.queries("q_ngram_containment")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("n_inter") == 9L)
    assert(r.getAs[Long]("sz_a") == 40L && r.getAs[Long]("sz_b") == 9L)
    assert(r.getAs[Long]("cont_b_micro") == 1000000L, "excerpt side must be fully contained")
    assert(r.getAs[Long]("contained_doc") == 2L, "the smaller (quoted) doc is the one to drop")
    // the symmetric lens on the same pair: inter/union = 9/40 < the 0.25 gate
    assert(r.getAs[Long]("n_inter") * 1000000L / 40L < 250000L,
      "crafted pair must sit below the symmetric threshold the asymmetric lens beats")
  }

  test("funnel's n_selected column IS q_pipeline_select's per-source count") {
    val funnel = SparkEntry.queries("q_dedup_funnel")(spark, TestSpark.sf)
      .select("source", "n_selected").as[(String, Long)].collect().toMap
    val capstone = SparkEntry.queries("q_pipeline_select")(spark, TestSpark.sf)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(funnel.nonEmpty)
    for ((src, n) <- funnel)
      assert(capstone.getOrElse(src, 0L) == n,
        s"funnel and capstone disagree for source $src")
    // and the funnel is monotone: raw >= quality >= exact-kept >= selected
    val full = SparkEntry.queries("q_dedup_funnel")(spark, TestSpark.sf).collect()
    for (r <- full) {
      val (a, b, c, d) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_exact_kept"), r.getAs[Long]("n_selected"))
      assert(a >= b && b >= c && c >= d, s"funnel not monotone: $r")
    }
  }

  test("source novelty: a source whose grams all exist elsewhere scores zero") {
    // source a: two docs with disjoint gram sets; source b: one doc whose
    // text replays a's first doc grams exactly (novelty 0); gram sharing
    // does not make a's own exclusive grams disappear.
    val ta = (1 to 12).map(i => s"a$i").mkString(" ")   // 11 grams, only in a
    val tb = (1 to 12).map(i => s"c$i").mkString(" ")   // 11 grams, a + b
    val dir = docsDir(Seq(
      (1L, ta, "en", "a", ta.length.toLong),
      (2L, tb, "en", "a", tb.length.toLong),
      (3L, tb, "en", "b", tb.length.toLong)))
    val out = SparkEntry.queries("q_source_novelty")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_exclusive"),
          r.getAs[Long]("novelty_micros"))).toMap
    assert(out("a") == ((22L, 11L, 500000L)), s"got ${out("a")}")
    assert(out("b") == ((11L, 0L, 0L)), s"source b brings nothing new: ${out("b")}")
  }

  test("semantic decontamination is exactly the benchmark-crossing slice of the standing pairs") {
    val dir = TestSpark.sf
    val nd = graft.operators.Similarity.corpusEmbedPairs(spark, dir)
      .select(col("vec_a"), col("vec_b"),
        expr("CAST(floor(cosine * 1000000D) AS BIGINT)").as("cm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cross = nd.filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b, cm) =>
        if (a % 10 == 0) (b, a, cm) else (a, b, cm) } // (corpus, bench, cos)
    val expectHits = cross.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expectBest = cross.groupBy(_._1).view.mapValues(ps =>
      ps.minBy(p => (-p._3, p._2))).toMap
    val out = SparkEntry.queries("q_embed_decontaminate")(spark, dir).collect()
    assert(out.length == expectHits.size && out.nonEmpty)
    for (r <- out) {
      val v = r.getAs[Long]("corpus_vec")
      assert(v % 10 != 0, "a benchmark vector can never be the flagged side")
      assert(r.getAs[Long]("n_bench_hits") == expectHits(v))
      assert(r.getAs[Long]("best_bench") == expectBest(v)._2)
      assert(r.getAs[Long]("best_cos_micros") == expectBest(v)._3)
    }
  }

  test("cohesion: identical vectors max out; a spread label scores lower; fold-order invariant") {
    val tight = Array.fill(64)(0.25f)
    def spread(i: Int) = Array.tabulate(64)(j =>
      if (j == i) 1.0f else if (j == (i + 7) % 64) -0.5f else 0.01f * ((i * 31 + j) % 5))
    val rows = (0 until 3).map(k => (k.toLong, tight, 1)) ++
      (0 until 4).map(k => (10L + k, spread(k * 5), 2))
    val dir = java.nio.file.Files.createTempDirectory("r8coh").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_cohesion")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("sum_cos_micros"),
          r.getAs[Long]("min_cos_micros"))).toMap
    assert(out(1)._1 == 3L && out(2)._1 == 4L)
    // identical unit vectors: cosine to their (floored-micros) centroid is
    // 1 up to the 1e-6 floor — every row lands within a micro of 1e6
    assert(out(1)._3 >= 999998L, s"tight label min = ${out(1)._3}")
    // the spread label's members sit visibly off their centroid
    assert(out(2)._3 < 900000L, s"spread label min = ${out(2)._3}")
    assert(out(1)._2 / 3 > out(2)._2 / 4, "mean cohesion must rank tight over spread")
    // fold-order invariance: the long-integer centroid makes the result
    // independent of partitioning/arrival order — recompute over a
    // many-partition rewrite of the same table and require equality
    val dir2 = java.nio.file.Files.createTempDirectory("r8coh2").toString
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(7)
      .write.parquet(s"$dir2/embeddings.parquet")
    val out2 = SparkEntry.queries("q_embed_cohesion")(spark, dir2)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("sum_cos_micros"),
          r.getAs[Long]("min_cos_micros"))).toMap
    assert(out2 == out, "cohesion must be bit-identical under repartitioning")
  }

  test("dup spans merge overlapping hits and split across unique gaps") {
    // phrase A = 10 words shared by docs 1+2 (gram positions 1-6 → one
    // merged span covering tokens 1-10); phrase B = 7 words shared by
    // docs 1+3 (3 gram positions → a 7-token span). In doc 1 the two
    // duplicated runs are separated by 8 unique tokens — the boundary
    // grams mixing A/filler/B exist only in doc 1, so the islands stay
    // disjoint (gap 19 > 6 + 5) and must NOT merge.
    val A = (1 to 10).map(i => s"a$i").mkString(" ")
    val B = (1 to 7).map(i => s"b$i").mkString(" ")
    val fill = (1 to 8).map(i => s"u$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, s"$A $fill $B", "en", "s1", 1L),
      (2L, s"$A v1 v2 v3 v4 v5", "en", "s2", 1L),
      (3L, s"$B w1 w2 w3 w4 w5", "en", "s3", 1L),
      (4L, (1 to 12).map(i => s"q$i").mkString(" "), "en", "s4", 1L)))
    val out = SparkEntry.queries("q_dup_spans")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("longest_span"))).toMap
    assert(out(1L) == ((2L, 17L, 10L)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((1L, 10L, 10L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((1L, 7L, 7L)), s"doc 3: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L)), "an all-unique doc has no spans")

    // the scrub applies exactly those spans: kept = toks − dup_tokens,
    // and doc 2's cleaned text is its unique tail verbatim
    val scrub = SparkEntry.queries("q_span_scrub")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_md5"))).toMap
    for ((id, (_, dup, _)) <- out)
      assert(scrub(id)._2 == scrub(id)._1 - dup,
        s"doc $id: kept ${scrub(id)._2} != toks ${scrub(id)._1} - dup $dup")
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("v1 v2 v3 v4 v5".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(scrub(2L)._3 == expectMd5,
      "doc 2's cleaned text must be exactly its unique tail")
  }

  test("ablation rows recompute from the explain table exactly") {
    val ex = SparkEntry.queries("q_select_explain")(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("lang_ok"), r.getAs[Long]("quality_ok"),
        r.getAs[Long]("exact_keeper"), r.getAs[Long]("cluster_keeper")))
    val ab = SparkEntry.queries("q_select_ablation")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_rejected"), r.getAs[Long]("n_only"))).toMap
    def flags(t: (Long, Long, Long, Long)) = Seq(t._1, t._2, t._3, t._4)
    val names = Seq("lang", "quality", "exact_dup", "near_dup")
    for ((name, i) <- names.zipWithIndex) {
      val rejected = ex.count(t => flags(t)(i) == 0L).toLong
      val only = ex.count(t => flags(t)(i) == 0L &&
        flags(t).zipWithIndex.forall { case (f, j) => j == i || f == 1L }).toLong
      assert(ab(name) == ((rejected, only)), s"$name: ${ab(name)} vs " +
        s"($rejected, $only)")
    }
    // every stage rejects someone on the synthetic corpus, or the
    // ablation has nothing to say
    assert(ab.values.map(_._1).sum > 0L)
  }

  test("temperature mixture boosts the tail and damps the head") {
    // head source: one 2500-token doc; tail source: one 100-token doc.
    // α = 1/2 weights are 50 vs 10, so the tail's share rises from
    // 100/2600 to 10/60 (boost > 1) and the head's falls (boost < 1).
    val head = (1 to 2500).map(i => s"h$i").mkString(" ")
    val tail = (1 to 100).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, head, "en", "big", head.length.toLong),
      (2L, tail, "en", "small", tail.length.toLong)))
    val out = SparkEntry.queries("q_mixture_temperature")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Long]("w"),
          r.getAs[Long]("raw_share_micro"), r.getAs[Long]("temp_share_micro"),
          r.getAs[Long]("boost_micro"))).toMap
    assert(out("big")._1 == 2500L && out("small")._1 == 100L)
    assert(out("big")._2 == 50L && out("small")._2 == 10L,
      s"floor-sqrt weights: $out")
    assert(out("small")._5 > 1000000L, "tail source must be up-weighted")
    assert(out("big")._5 < 1000000L, "head source must be damped")
    // shares still form a distribution (micro truncation leaves ≤ n slack)
    val shareSum = out.values.map(_._4).sum
    assert(shareSum > 1000000L - out.size && shareSum <= 1000000L)
  }

  test("epoch shuffle: each epoch is a full permutation and epochs differ") {
    val out = SparkEntry.queries("q_epoch_shuffle")(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("epoch"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    val n = out.map(_._2).distinct.length
    for (e <- Seq(0L, 1L)) {
      val ep = out.filter(_._1 == e)
      assert(ep.length == n, s"epoch $e lost documents")
      // positions within each shard are exactly 1..k (a permutation, no
      // gaps or collisions)
      for ((_, rows) <- ep.groupBy(_._3))
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the two epochs must not produce the same (shard, pos) for every doc
    val k0 = out.filter(_._1 == 0L).map(r => r._2 -> ((r._3, r._4))).toMap
    val k1 = out.filter(_._1 == 1L).map(r => r._2 -> ((r._3, r._4))).toMap
    assert(k0.count { case (d, sp) => k1(d) == sp } < n / 2,
      "epoch 1's order barely differs from epoch 0 — salt not applied?")
  }

  test("select-explain verdicts tie exactly to the capstone and the funnel") {
    val ex = SparkEntry.queries("q_select_explain")(spark, TestSpark.sf).collect()
    val selected = ex.filter(_.getAs[String]("verdict") == "selected")
      .map(_.getAs[Long]("doc_id")).toSet
    val capstone = SparkEntry.queries("q_pipeline_select")(spark, TestSpark.sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(selected == capstone,
      s"explain 'selected' set != capstone (only-explain=" +
        s"${(selected -- capstone).take(3)}, only-capstone=" +
        s"${(capstone -- selected).take(3)})")
    // verdict is the FIRST failing stage: flags downstream of the verdict
    // stage may be anything, flags upstream must all pass
    for (r <- ex) {
      val flags = Seq("lang_ok", "quality_ok", "exact_keeper",
        "cluster_keeper").map(r.getAs[Long](_))
      r.getAs[String]("verdict") match {
        case "selected" => assert(flags.forall(_ == 1L))
        case "lang" => assert(flags(0) == 0L)
        case "quality" => assert(flags(0) == 1L && flags(1) == 0L)
        case "exact_dup" => assert(flags.take(2).forall(_ == 1L) && flags(2) == 0L)
        case "near_dup" => assert(flags.take(3).forall(_ == 1L) && flags(3) == 0L)
      }
    }
    // and the funnel is this table's per-source rollup
    val funnel = SparkEntry.queries("q_dedup_funnel")(spark, TestSpark.sf)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("n_selected")).toMap
    val bySrc = ex.filter(_.getAs[String]("verdict") == "selected")
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    for ((src, n) <- funnel)
      assert(bySrc.getOrElse(src, 0L) == n, s"funnel mismatch for $src")
  }

  test("label affinity: parallel centroids max out, orthogonal ones read zero") {
    // labels 1 and 2 point along axis 0 (different magnitudes — unit
    // normalization must erase that); label 3 is orthogonal on axis 1
    val e0a = Array.tabulate(64)(j => if (j == 0) 2.0f else 0.0f)
    val e0b = Array.tabulate(64)(j => if (j == 0) 0.5f else 0.0f)
    val e1 = Array.tabulate(64)(j => if (j == 1) 1.0f else 0.0f)
    val rows = Seq((1L, e0a, 1), (2L, e0a, 1), (3L, e0b, 2), (4L, e1, 3))
    val dir = java.nio.file.Files.createTempDirectory("r8aff").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_label_affinity")(spark, dir)
      .collect().map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        r.getAs[Long]("cos_micros")).toMap
    assert(out.keySet == Set((1, 2), (1, 3), (2, 3)), s"pairs: ${out.keySet}")
    assert(out((1, 2)) >= 999998L, s"parallel centroids: ${out((1, 2))}")
    assert(out((1, 3)) == 0L && out((2, 3)) == 0L,
      s"orthogonal centroids must read 0: $out")
  }

  test("mixture selection is the greedy md5-prefix and respects every tier budget") {
    import org.apache.spark.sql.expressions.Window
    val plan = SparkEntry.queries("q_mixture_plan")(spark, TestSpark.sf)
      .select("tier", "target_tokens").as[(String, Long)].collect().toMap
    val sel = SparkEntry.queries("q_mixture_select")(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tier"),
        r.getAs[Long]("toks")))
    // (a) budgets respected, every tier fills
    val byTier = sel.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    for ((tier, target) <- plan) {
      assert(byTier.getOrElse(tier, 0L) <= target,
        s"$tier overfills: ${byTier.get(tier)} > $target")
      assert(byTier.getOrElse(tier, 0L) > 0L, s"$tier selected nothing")
    }
    // (b) the two-level bucket refinement == the naive per-tier window
    // (the oracle proves this cross-engine; this pins it inside Spark
    // against future refactors of either half)
    val d = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        expr(graft.operators.Analytic.MixTierSql).as("tier"),
        size(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
          " ")).cast("long").as("toks"),
        md5(col("doc_id").cast("string").cast("binary")).as("r"))
    val w = Window.partitionBy("tier").orderBy("r", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("cum", sum(col("toks")).over(w))
      .collect().filter(r => r.getAs[Long]("cum") <=
        plan(r.getAs[String]("tier")))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tier"),
        r.getAs[Long]("toks"))).toSet
    assert(sel.toSet == naive,
      s"refined selection drifted from the naive greedy prefix " +
        s"(only-refined=${(sel.toSet -- naive).take(3)}, " +
        s"only-naive=${(naive -- sel.toSet).take(3)})")
  }

  test("DSIR weights rank target-like docs above target-absent docs") {
    // target slice (src0) speaks 'x'; doc 20 (src1) speaks only 'x',
    // doc 21 (src1) speaks 'z' which the target never says. Laplace
    // smoothing keeps z-buckets defined at bits(0+1)=1, so doc 21's
    // weight is strictly negative while doc 20's stays near zero.
    val dir = docsDir(Seq(
      (10L, "x x x x y", "en", "src0", 1L),
      (11L, "x x x x y", "en", "src0", 1L),
      (20L, "x x x x x", "en", "src1", 1L),
      (21L, "z z z z z", "en", "src1", 1L)))
    val out = SparkEntry.queries("q_dsir_weights")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("dsir_bits"))).toMap
    assert(out(20L)._1 == 5L && out(21L)._1 == 5L)
    assert(out(20L)._2 > out(21L)._2,
      s"target-vocabulary doc must outrank target-absent doc: $out")
    assert(out(21L)._2 < 0L, "never-in-target tokens must weigh negative")
  }
}
