package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-blowup guarantees for the dedup pipelines: a mass-duplicate
  * cluster must not produce quadratic MinHash pair output, and a hot gram
  * must not produce quadratic Jaccard candidates — the two 100 TB
  * scale-killers VERDICT r2 flagged.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("minhashPairs: mass-duplicate cluster is bounded, not quadratic") {
    // 400 byte-identical copies + 30 near-identical variants + 20 unrelated.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val copies = (0L until 400L).map(i => i -> base)
    val variants = (400L until 430L).map(i =>
      i -> (base + s" tail${i % 3}")) // 3 variant texts, ~10 copies each
    val unrelated = (430L until 450L).map(i =>
      i -> s"zig${i} zag${i} zog${i} quux${i} corge${i} grault${i}")
    val pairs = Dedup.minhashPairs(docsDf(copies ++ variants ++ unrelated))
      .collect()
    // exact-dedup pre-pass: the 400-copy cluster has ONE representative, so
    // no pair can have both ends inside it (uncapped LSH would emit
    // C(400,2) = 79800 pairs for that cluster alone)
    val copyIds = (0L until 400L).toSet
    assert(!pairs.exists(r => copyIds(r.getLong(0)) && copyIds(r.getLong(1))))
    // global bound: reps ≤ 4 distinct near-identical texts + 20 unrelated;
    // pair output must stay far below the uncapped quadratic blowup
    assert(pairs.length <= Dedup.Bands * Dedup.BucketCap * Dedup.BucketCap / 2,
      s"pair output ${pairs.length} exceeds the band-bucket bound")
    assert(pairs.length < 100, s"expected a handful of pairs, got ${pairs.length}")
    // the near-identical variants DO surface as candidates of the base rep
    assert(pairs.nonEmpty)
  }

  test("minhashPairs: bucket cap bounds a near-identical flood deterministically") {
    // 200 docs sharing the SAME long prefix with unique 1-word tails: not
    // byte-identical (survive exact dedup), signatures mostly collide.
    val prefix = ("w" + (0 until 30).map(i => s" word$i").mkString) * 1
    val flood = (0L until 200L).map(i => i -> s"$prefix tail$i")
    val out1 = Dedup.minhashPairs(docsDf(flood)).collect().toSet
    val out2 = Dedup.minhashPairs(docsDf(flood)).collect().toSet
    assert(out1 == out2, "capped pair set must be deterministic")
    // each of the 4 bands keeps ≤ cap members per bucket → pair bound
    val cap = Dedup.BucketCap
    assert(out1.size <= Dedup.Bands * cap * (cap - 1) / 2,
      s"flood produced ${out1.size} pairs, above the per-bucket cap bound")
    // and the cap actually bit: uncapped output would be C(200,2) = 19900
    assert(out1.size < 19900 / 2)
  }

  test("rareGramJaccard: hot gram generates zero candidates past the cap") {
    // every doc shares the hot bigram "the cold"; only doc pairs 0/1 and
    // 2/3 share RARE grams. Uncapped, the hot gram alone would emit
    // C(300,2) = 44850 candidate pairs.
    val hot = "the cold"
    val docs = Seq(
      0L -> s"$hot unique alpha bravo charlie delta echo foxtrot",
      1L -> s"$hot unique alpha bravo charlie delta echo golf",
      2L -> s"$hot rare pair two hotel india juliet kilo",
      3L -> s"$hot rare pair two hotel india juliet lima") ++
      (4L until 300L).map(i => i -> s"$hot filler${i}a filler${i}b filler${i}c")
    val out = Dedup.rareGramJaccard(docsDf(docs), dfCap = 10, minJacMicro = 0L)
      .collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (2L, 3L)),
      s"expected only the rare-gram pairs, got ${got.size} pairs")
  }

  test("connectedComponents labels chains and islands with their min doc") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), island 10-11, triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // non-convergence within the round budget must fail loudly, not lie
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(
        (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b"),
        maxIters = 2)
    }
  }

  test("connectedComponents contracts a long chain in O(log n) rounds") {
    import spark.implicits._
    // a 100-node path (diameter 99): plain min-label propagation needs ~99
    // rounds — far past this budget. Large-star/small-star roughly halves
    // the remaining depth per round, so 12 rounds is ample for n = 100
    // (and the bound grows only logarithmically with corpus size).
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain, maxIters = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 100)
    assert(got.forall(_._2 == 1L), "every chain node must label to the min")
  }

  test("rareGramJaccard: hot grams produce NO pairs, rare overlap still fires") {
    // 100 docs all share a hot phrase (df = 100 ≫ cap): without the df
    // prune every one of the C(100,2) pairs would be a candidate. Only
    // docs 0 and 1 also share a RARE gram — the operator must emit
    // exactly that pair and nothing else. (The earlier form of this test
    // re-derived the prune inside the test and asserted its own filter —
    // a tautology that never touched the operator.)
    val docs = (0L until 100L).map { i =>
      val base = s"hot1 hot2 hot3 unique$i filler$i"
      i -> (if (i <= 1) s"$base rare pair" else base)
    }
    val got = Dedup.rareGramJaccard(docsDf(docs), dfCap = 10, minJacMicro = 0L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)),
      s"expected exactly the rare-gram pair, got ${got.length} pairs")
  }

  test("chunkDedup drops corpus-shared chunks and keeps unique ones") {
    // 8-word boilerplate chunk shared by docs 1 and 2 in chunk position 0;
    // doc 3 is all-unique. The shared chunk must be dropped from both
    // carriers, the unique tails kept, and doc 3 untouched.
    val boiler = "one two three four five six seven eight"
    val docs = Seq(
      1L -> s"$boiler alpha beta gamma delta epsilon zeta eta theta",
      2L -> s"$boiler iota kappa lambdaw mu nu xi omicron pi",
      3L -> "rho sigma tau upsilon phi chi psi omega")
    val got = Dedup.chunkDedup(docsDf(docs)).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq ==
      Seq((1L, 2L, 1L, 1L), (2L, 2L, 1L, 1L), (3L, 1L, 1L, 0L)))
    // the cleaned text is exactly the surviving chunk
    val md5of = (sx: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._5 == md5of("alpha beta gamma delta epsilon zeta eta theta"))
    assert(got(2)._5 == md5of("rho sigma tau upsilon phi chi psi omega"))
  }

  test("incremental dedup flags new-batch near-dups against the persisted index") {
    // crafted corpus on disk: OLD side (doc_id % 5 != 0) holds base texts;
    // NEW side (doc_id % 5 == 0) holds one exact copy of old doc 1, one
    // near-variant of old doc 2, and one unrelated doc.
    val base1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val base2 = "red orange yellow green blue indigo violet cyan magenta " +
      "umber ochre teal maroon coral amber jade onyx pearl slate flint"
    val rows = Seq(
      1L -> base1, 2L -> base2,
      3L -> "solo uno dos tres cuatro cinco seis siete ocho nueve",
      5L -> base1,                   // exact copy of old 1 → est = 8/8
      10L -> (base2 + " extraword"), // near-variant of old 2
      15L -> "qux quux corge grault garply waldo fred plugh xyzzy thud")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    import spark.implicits._
    rows.map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    // 5 matches old 1, 10 matches old 2; unrelated 15 is absent
    assert(got == Seq((5L, 1L), (10L, 2L)), s"got $got")
    // the index is persisted: a second build call is a no-op fast path
    val root = Dedup.buildMinhashIndex(spark, dir)
    val marker = new java.io.File(s"$root/bands/_SUCCESS")
    assert(marker.exists)
    val mtime = marker.lastModified
    Dedup.buildMinhashIndex(spark, dir)
    assert(marker.lastModified == mtime, "index was rebuilt, not reused")
  }

  test("split leakage flags an exact copy straddling train/test") {
    import spark.implicits._
    // doc 1 -> train, doc 25 -> test (md5 split hash); 25 is a byte-exact
    // copy of 1, so the keeper lifting must pull it into 1's cluster and
    // flag the pair. Docs 2 (train) and 3 (val) are unrelated singletons.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val rows = Seq(
      1L -> base,
      2L -> "uno dos tres cuatro cinco seis siete ocho nueve diez",
      3L -> "een twee drie vier vijf zes zeven acht negen tien",
      25L -> base)
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    rows.map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_split_leakage")(spark, dir)
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 1L, "train"), (1L, 25L, "test")), s"got $got")
    // ... and q_split_safe is the FIX: anchored assignment reunites the
    // leaky pair (both follow doc 1's anchor into train), singletons keep
    // their naive split, and exactly one document moved
    val safe = SparkEntry.queries("q_split_safe")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val bys = safe.map(r => r._1 -> r).toMap
    assert(bys("train")._2 == 3 && bys("train")._4 == 1,
      s"train must hold 1,2,25 with one moved doc: $safe")
    assert(bys.get("test").isEmpty ||  bys("test")._2 == 0,
      s"no doc may remain in test: $safe")
  }

  test("winnowing guarantees detection of any shared 8-word run") {
    import spark.implicits._
    val run = "one two three four five six seven eight" // w+k-1 = 8 words
    val docs = Seq(
      (1L, s"aaa bbb ccc $run ddd eee fff ggg hhh iii"),
      (2L, s"jjj kkk lll mmm $run nnn ooo ppp qqq"),
      (3L, "rrr sss ttt uuu vvv www xxx yyy zzz qqq www eee"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs)
      .select(col("doc_id"), col("fps"))
      .as[(Long, Seq[String])].collect().toMap
    // 1 and 2 share the run => must share at least one fingerprint
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "shared 8-word run missed by winnowing")
    // 3 shares no 4-gram with either => no shared fingerprints
    assert(fps(3L).toSet.intersect(fps(1L).toSet ++ fps(2L).toSet).isEmpty)
    // selection is sparse: far fewer fingerprints than gram positions
    assert(fps(1L).size < 10)

    // the GUARANTEE must reach the query output too: a pair sharing only
    // the single run (possibly 1 shared fingerprint) appears in
    // q_dedup_winnow — a >=2 threshold here once broke the MOSS floor
    val dir = java.nio.file.Files.createTempDirectory("graft_winq").toString
    Seq((1L, s"aaa bbb ccc $run ddd eee fff ggg hhh iii"),
      (2L, s"jjj kkk lll mmm $run nnn ooo ppp qqq"))
      .map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val qOut = SparkEntry.queries("q_dedup_winnow")(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(qOut == Seq((1L, 2L)), s"shared-run pair missing from query: $qOut")
  }

  test("native winnow_fps is bit-identical to the composed HOF form") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, TestSpark.sf, "documents").limit(200)
    val toks = split(TextAnalysis.normText(col("text")), " ")
    // the reference composition the expression replaced (kept here as the
    // semantics oracle): k-gram md5 prefixes -> zipped-slice window mins
    val k = Dedup.WinnowK; val w = Dedup.WinnowW
    val h = transform(TextAnalysis.wordNgrams(toks, k),
      g => substring(md5(g.cast("binary")), 1, 16))
    val composed = docs
      .withColumn("__h", h)
      .select(col("doc_id"),
        when(size(col("__h")) >= w,
          array_distinct(transform(
            arrays_zip((1 to w).map(i =>
              slice(col("__h"), lit(i), size(col("__h")) - (w - 1))): _*),
            p => least((0 until w).map(i => p.getField(i.toString)): _*))))
          .otherwise(array().cast("array<string>")).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    val native = Dedup.winnowFingerprints(docs)
      .select(col("doc_id"), col("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native.keySet == composed.keySet)
    for (id <- native.keySet)
      assert(native(id).sorted == composed(id).sorted, s"doc $id")
    assert(native.values.exists(_.nonEmpty))
  }

  test("pageRank: hand-computed one round on a star, hubs outrank leaves") {
    import spark.implicits._
    // star: 1-2, 1-3 (deg 1=2, 2=1, 3=1)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r1 = Dedup.pageRank(pairs, iters = 1).as[(Long, Long)]
      .collect().toMap
    // r1(1) = 150000 + (1e6/1 + 1e6/1)*85/100; r1(leaf) = 150000 + (1e6 div 2)*85/100
    assert(r1 == Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    // after 3 rounds the hub still dominates and mass stays bounded
    val r3 = Dedup.pageRank(pairs, iters = 3).as[(Long, Long)]
      .collect().toMap
    assert(r3(1L) > r3(2L) && r3(2L) == r3(3L))
    assert(r3.values.forall(v => v > 0 && v < 3000000L))
  }

  test("sampled truth audit: exact stratum subset, estimate within CI of full") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // the sampled family must emit VERBATIM full-audit rows — exactly the
    // full truth pairs whose min endpoint lands in the ¼ md5 stratum
    // (df economy and sizes stay corpus-wide, so sampling is pure
    // subsetting, never approximation)
    val full = Dedup.corpusTruthPairs(spark, TestSpark.sf)
    val sampled = Dedup.sampledTruthPairs(spark, TestSpark.sf)
    val expected = full
      .filter(Dedup.docStratum(col("doc_a")) < Dedup.TruthSampleThr)
      .collect().map(_.toSeq).toSet
    val got = sampled.collect().map(_.toSeq).toSet
    assert(got == expected, "sampled truth != stratum filter of full truth")
    assert(got.nonEmpty && got.size < full.count(),
      "test corpus should sample a strict non-empty subset")

    // the recall estimate sits inside a pinned CI of the full audit: with
    // n_s sampled pairs, a Wilson/binomial 95% half-width is well under
    // 0.35 for the test corpus's n_s; pin |est − full| ≤ 350 milli (the
    // observed delta is 0 — both audits measure recall 1.000 here)
    def recallMilli(truth: org.apache.spark.sql.DataFrame,
                    strat: Boolean): Long = {
      var cand = Dedup.bandPairs(Dedup.corpusSigs(spark, TestSpark.sf))
      if (strat) cand = cand.filter(
        Dedup.docStratum(col("doc_a")) < Dedup.TruthSampleThr)
      val nT = truth.count()
      val nH = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
      if (nT == 0) 0L else nH * 1000 / nT
    }
    val rFull = recallMilli(full, strat = false)
    val rEst = recallMilli(sampled, strat = true)
    assert(math.abs(rEst - rFull) <= 350,
      s"sampled recall estimate $rEst vs full $rFull exceeds the CI")
  }
}
