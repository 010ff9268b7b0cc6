package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Recall checks for the bucketed ANN variants against the exact brute-force
  * ranking. The synthetic embeddings are near-uniform random (no cluster
  * structure for IVF cells or LSH planes to exploit), so the bounds assert
  * the index is functioning — candidates come from the probed fraction of
  * the corpus and genuinely rank by cosine — not production-grade recall.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("fused vec_cosine is bit-identical to the composed three-dot form") {
    graft.functions.VectorOps.register(spark)
    val e = Tables.load(spark, TestSpark.sf, "embeddings").limit(200)
    val a = e.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.expr("embedding").as("v"))
    val pairs = a.alias("x").crossJoin(a.alias("y").limit(5))
    val diff = pairs.selectExpr(
      "vec_cosine(x.v, y.v) AS fused",
      "vec_dot(x.v, y.v) / (sqrt(vec_dot(x.v, x.v)) * sqrt(vec_dot(y.v, y.v))) AS composed")
      .filter("fused <> composed OR (isnan(fused) <> isnan(composed))")
    assert(diff.count() == 0, "fused cosine diverged from the composed form")
  }

  test("IVF index builds once, persists as tables, and is reused") {
    val root = Similarity.buildIvfIndex(spark, TestSpark.sf)
    val cents = spark.read.parquet(s"$root/centroids")
    assert(cents.count() == Similarity.IvfK)
    assert(cents.columns.toSet == Set("cell", "cvec"))
    val lists = spark.read.parquet(s"$root/lists")
    assert(lists.count() ==
      Tables.footerRowCount(spark, Tables.path(TestSpark.sf, "embeddings")))
    assert(lists.columns.toSet == Set("c_id", "ce", "cell"))
    // a second build call must be a no-op read of the existing index
    val marker = java.nio.file.Paths.get(s"$root/lists/_SUCCESS")
    val mtime = java.nio.file.Files.getLastModifiedTime(marker)
    assert(Similarity.buildIvfIndex(spark, TestSpark.sf) == root)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == mtime,
      "second build must not retrain/rewrite the index")
  }

  test("IVF and LSH return full top-k lists with positive brute-force recall") {
    val brute = topk("q_knn_brute")
    val ivf = topk("q_knn_ivf")
    val lsh = topk("q_knn_lsh")
    assert(brute.keySet == ivf.keySet && brute.keySet == lsh.keySet)
    for (q <- brute.keySet) {
      assert(ivf(q).size == Similarity.TopK, s"ivf query $q returned ${ivf(q).size}")
      assert(lsh(q).size == Similarity.TopK, s"lsh query $q returned ${lsh(q).size}")
    }
    // pooled recall across queries: probing 4/16 k-means-trained IVF cells
    // of a structure-free corpus recovers a solid share of the exact top-k.
    // Measured 0.34 with 3 Lloyd rounds (the untrained first-K index was
    // bounded at 0.15); 0.25 leaves margin for the float-sum order
    // nondeterminism in centroid training while still pinning the
    // training's lift over the old bound.
    val ivfRecall = brute.keys.map(q => (ivf(q) & brute(q)).size).sum.toDouble /
      (brute.size * Similarity.TopK)
    info(s"ivf pooled recall: $ivfRecall")
    assert(ivfRecall >= 0.25, s"ivf pooled recall $ivfRecall")
  }

  test("PQ index builds once and ADC+rerank recovers most of the exact top-k") {
    val root = Similarity.buildPqIndex(spark, TestSpark.sf)
    val cb = spark.read.parquet(s"$root/codebook")
    assert(cb.count() == Similarity.PqM.toLong * Similarity.PqK,
      "codebook must hold m*k cells")
    val codes = spark.read.parquet(s"$root/codes")
    val n = Tables.load(spark, TestSpark.sf, "embeddings").count()
    assert(codes.count() == n * Similarity.PqM, "one code per vector per subvector")
    // codes must use the full codebook, not collapse to a few cells
    val used = codes.select("sub", "code").distinct().count()
    assert(used > Similarity.PqM.toLong * Similarity.PqK / 2,
      s"only $used of ${Similarity.PqM * Similarity.PqK} cells used")

    val brute = topk("q_knn_brute")
    val pq = topk("q_knn_pq")
    assert(brute.keySet == pq.keySet)
    for (q <- brute.keySet)
      assert(pq(q).size == Similarity.TopK, s"pq query $q returned ${pq(q).size}")
    val hit = brute.keySet.toSeq
      .map(q => (pq(q) & brute(q)).size).sum.toDouble
    val recall = hit / (brute.size * Similarity.TopK)
    // exact rescoring of the ADC top-50 shortlist means a recalled vector
    // is also RANKED right; the bound pins the shortlist quality
    assert(recall >= 0.5, s"PQ recall $recall below bound")
  }

  test("embedding clusters cover exactly the paired vectors with min reps") {
    val pairs = SparkEntry.queries("q_embed_neardup")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q_embed_clusters")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    // membership = every vector that appears in some near-dup pair, once
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.map(_._1).toSet == paired)
    assert(clusters.map(_._1).distinct.length == clusters.length)
    // representative is the min member of its cluster, and flagged as such
    val byRep = clusters.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep, s"rep $rep is not its cluster min")
    }
    clusters.foreach { case (v, rep, isRep) => assert(isRep == (v == rep)) }
    // pair endpoints always land in the same cluster (single-edge closure)
    val repOf = clusters.map(c => c._1 -> c._2).toMap
    pairs.foreach { case (a, b) =>
      assert(repOf(a) == repOf(b), s"pair ($a,$b) split across clusters")
    }
  }
}
