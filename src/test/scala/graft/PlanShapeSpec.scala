package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape checks — the 100 TB posture assertions. These fail if
  * a code change silently loses pushdown, column pruning, broadcast joins,
  * or whole-stage codegen on the hot paths.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.executedPlan.toString
  }

  test("filters reach the parquet scan (predicate pushdown)") {
    val p = planOf("q_filter_eq")
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("c_mktsegment"), "segment filter not pushed")
  }

  test("column pruning: aggregation scan reads only needed columns") {
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = scans.find(_.contains("lineitem")).getOrElse(fail("no lineitem scan"))
    assert(!scan.contains("l_shipdate"), "unused column not pruned from scan")
    assert(scan.contains("l_returnflag"))
  }

  test("small dimension joins broadcast") {
    assert(planOf("q_join_mt1").contains("BroadcastHashJoin"))
    assert(planOf("q_join_3way").contains("BroadcastHashJoin"))
  }

  test("hot aggregation path stays inside whole-stage codegen") {
    // AQE defers codegen wrapping to runtime stages, so inspect the plan
    // with AQE off — same operators, statically codegen-wrapped
    def codegenSubtrees(name: String): Int = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = SparkEntry.queries(name)(spark, TestSpark.sf)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
        "Found (\\d+) WholeStageCodegen subtrees".r
          .findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(0)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert(codegenSubtrees("q1_agg") > 0)
    assert(codegenSubtrees("q_token_count") > 0)
  }

  test("semi and anti joins plan as join strategies, not subquery scans") {
    assert(planOf("q_semi_join").contains("LeftSemi"))
    assert(planOf("q_anti_join").contains("LeftAnti"))
  }

  test("as-of join plans as one window pass, never a range join product") {
    val p = planOf("q_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join degenerated into a product join:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "expected the running-window implementation")
  }

  test("rollup plans a single Expand, not one aggregation per grouping set") {
    val p = planOf("q_rollup")
    assert(p.contains("Expand"), "rollup should plan through Expand")
    assert(!p.contains("Union"), "rollup must not be a union of re-aggregations")
  }

  test("minhash LSH bucket join broadcasts band keys") {
    val p = planOf("q_dedup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket join degenerated into a product join:\n$p")
  }

  test("minhash plan caps band buckets before pair generation") {
    // the deterministic bucket cap must sit between the band explode and
    // the self-join: a Window(row_number) over (band, bkey) feeding a
    // rn <= cap filter. Without it a mass-duplicate bucket re-quadratices.
    val p = planOf("q_dedup_minhash")
    assert(p.contains("row_number"), s"bucket-cap window missing:\n$p")
  }

  test("rare-gram jaccard pairs off the standing postings, no re-derivation") {
    val p = planOf("q_ngram_jaccard")
    // since round 7 the df-capped postings are a standing index: the plan
    // must SCAN graft_engram2 (not re-explode documents' grams) and the
    // pair join stays equi on the gram key, never a product
    assert(p.contains("graft_engram2"),
      s"standing rare-gram postings index not probed:\n$p")
    assert(!p.toLowerCase.contains("documents.parquet"),
      s"q_ngram_jaccard still re-reads the corpus instead of the index:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"gram join degenerated into a product join:\n$p")
  }

  test("bigram surprisal and source divergence stay equi-join and pruned") {
    val bg = planOf("q_bigram_surprisal")
    assert(!bg.contains("CartesianProduct") && !bg.contains("BroadcastNestedLoopJoin"),
      s"bigram model join degenerated:\n$bg")
    // r12: the per-doc aggregate covers every doc (explode_outer), so the
    // registered query has NO doc-list attach join — exactly one documents
    // scan, pruned to doc_id+text, may appear
    assert(bg.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$bg")
    assert(!bg.contains("ReadSchema: struct<doc_id:bigint>"),
      s"doc-list attach scan reappeared (join-back was removed in r12):\n$bg")
    assert(!bg.contains("SortMergeJoin"),
      s"attach sort-merge join reappeared:\n$bg")

    val tv = planOf("q_source_divergence")
    // the 1-row corpus totals ride broadcast joins; nothing may expand to
    // a vocab-by-sources product
    assert(!tv.contains("CartesianProduct"),
      s"divergence join degenerated:\n$tv")
    assert(tv.contains("text:string") && tv.contains("source:string") &&
      !tv.contains("n_chars") && !tv.contains("lang"),
      s"documents scan not pruned to source,text:\n$tv")
  }

  test("repetition and decontamination stay equi-join, pruned, no products") {
    val rep = planOf("q_repetition")
    assert(!rep.contains("CartesianProduct") && !rep.contains("BroadcastNestedLoopJoin"),
      s"repetition join degenerated:\n$rep")
    // only doc_id+text may be read — lang/source/n_chars must be pruned
    assert(rep.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$rep")

    val dec = planOf("q_decontaminate")
    assert(!dec.contains("CartesianProduct") && !dec.contains("BroadcastNestedLoopJoin"),
      s"decontamination gram join degenerated:\n$dec")
  }

  test("vocab top-k plans as distributed TakeOrdered, window only on k rows") {
    val p = planOf("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not a distributed TakeOrdered:\n$p")
    // the rank window must exist AND sit ABOVE the limit (a bare indexOf
    // comparison passes vacuously at -1 when the window vanishes)
    assert(p.contains("Window"), s"rank window missing from plan:\n$p")
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject"),
      s"rank window below the top-k limit:\n$p")
  }

  test("pii scrub is a pure map: no exchange at all") {
    val p = planOf("q_pii_scrub")
    // one global sort for output determinism is the only allowed exchange
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"scrub map should not shuffle (found $exchanges):\n$p")
  }

  test("inspect diff counts are partial hash aggregates over pruned scans") {
    // every per-table count must plan as partial+final HashAggregate over
    // the scan (map-side combine). The src/dest pairing IS a cross join —
    // of two single-row aggregates, which is bounded by construction.
    val p = planOf("q_inspect_diff")
    assert(p.contains("HashAggregate"), s"counts not hash-aggregated:\n$p")
  }

  test("bucketed range join plans as an equi-join, never a loop product") {
    val p = planOf("q_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a product:\n$p")
  }

  test("sequence packing windows per shard, scan pruned to doc_id+text") {
    val p = planOf("q_seq_pack")
    // the cumsum window must be partitioned by shard (parallel across
    // shards), never a global single-partition window
    assert(p.contains("hashpartitioning(shard"),
      s"packing cumsum not hash-partitioned by shard:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"packing cumsum collapsed to a single partition:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$p")
  }

  test("tpch q5 broadcasts the snowflake dims, shuffles only the big join") {
    val p = planOf("q_tpch_q5")
    // nation/region/supplier must come in as broadcasts; the
    // lineitem-orders-customer spine may shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"snowflake dims not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q5 degenerated to a product:\n$p")
    // the orderdate range reaches the orders scan
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      s"orderdate filter not pushed to the orders scan:\n$p")
  }

  test("source-overlap matrix joins stay equi-joins over hashed pairs") {
    val p = planOf("q_source_overlap")
    assert(!p.contains("CartesianProduct"),
      s"overlap matrix degenerated to a product:\n$p")
  }

  test("mixture plan reads only text+source, broadcasts the 1-row budget") {
    val p = planOf("q_mixture_plan")
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      s"documents scan not pruned to text,source:\n$p")
    // the single-row budget joins back by broadcast, never a shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"budget row not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"non-broadcast product:\n$p")
  }

  test("quality classifier broadcasts the weight table, equi-join only") {
    val p = planOf("q_quality_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"weight join must broadcast (weights are tiny by contract):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"weight join degenerated:\n$p")
  }

  test("chunk dedup reads only doc_id+text and keeps equi-joins") {
    val p = planOf("q_chunk_dedup")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk df join degenerated:\n$p")
  }

  test("outlier detection broadcasts the moment table, scan pruned") {
    val p = planOf("q_outlier_events")
    assert(p.contains("BroadcastHashJoin"),
      s"moment table not broadcast back onto the scan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"moment join degenerated:\n$p")
    val scan = SparkEntry.queries("q_outlier_events")(spark, TestSpark.sf)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("events")).getOrElse(fail("no events scan"))
    assert(!scan.contains("props") && !scan.contains("user_id"),
      s"events scan not pruned to event_type,value:\n$scan")
  }

  test("lm surprisal keeps equi-joins and broadcasts only the 1-row total") {
    val p = planOf("q_lm_surprisal")
    // the single-row corpus total rides a broadcast product (harmless by
    // construction); the tf ⋈ vocab join must stay a real equi-join
    assert(!p.contains("CartesianProduct"), s"driver-side product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"tf-vocab join missing:\n$p")
    val scan = SparkEntry.queries("q_lm_surprisal")(spark, TestSpark.sf)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("documents")).getOrElse(fail("no documents scan"))
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$scan")
  }

  test("bm25 never explodes tokens and top-20 is a distributed TakeOrdered") {
    val p = planOf("q_bm25")
    assert(!p.contains("Generate"),
      s"bm25 scoring path materialized per-token rows:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"bm25 top-k not a distributed TakeOrdered:\n$p")
    val scan = SparkEntry.queries("q_bm25")(spark, TestSpark.sf)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("documents")).getOrElse(fail("no documents scan"))
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to doc_id,text:\n$scan")
  }

  test("histogram boundaries broadcast back, no per-bucket total order") {
    val p = planOf("q_histogram")
    // the 1-row bounds table rides a broadcast product (by construction);
    // the only Sort allowed is the final 8-row presentation order
    assert(!p.contains("CartesianProduct"), s"driver-side product:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bounds join shuffled:\n$p")
  }

  test("retention scan pruned and the activity-first join is co-partitioned") {
    val df = SparkEntry.queries("q_retention")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"non-equi join in retention:\n$p")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("events")).getOrElse(fail("no events scan"))
    assert(scan.contains("ReadSchema: struct<ts:"),
      s"events scan not pruned to ts,user_id:\n$scan")
    assert(!scan.contains("props"), s"unused props column read:\n$scan")
    // expected exchanges: (user,day) distinct, first-day agg, and the
    // distinct-count's partial+final pair — the activity⋈first join itself
    // must ride broadcast (tiny here) or reuse the user_id partitioning,
    // never add a fifth shuffle
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4,
      s"retention join re-shuffled an already-partitioned side:\n$p")
  }

  test("edit-distance verification joins candidates by key, never all pairs") {
    val p = planOf("q_dedup_edit")
    assert(!p.contains("CartesianProduct"), s"all-pairs product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"non-equi pair join:\n$p")
  }

  test("tpch q3: date filters pushed, top-10 is TakeOrdered, no product") {
    val df = SparkEntry.queries("q_tpch_q3")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must not globally sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"product in q3:\n$p")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val li = scans.find(_.contains("lineitem")).getOrElse(fail("no lineitem scan"))
    assert(li.contains("l_shipdate"), s"shipdate filter not pushed:\n$li")
  }

  test("event paths: top-20 is TakeOrdered, events scan pruned") {
    val df = SparkEntry.queries("q_event_paths")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must not globally sort:\n$p")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("events")).getOrElse(fail("no events scan"))
    assert(!scan.contains("value"), s"unused value column not pruned:\n$scan")
  }

  test("dup-gram coverage: equi-joins only, docs scan pruned to id+text") {
    val df = SparkEntry.queries("q_dup_gram_coverage")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"non-equi join:\n$p")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .filter(_.contains("documents"))
    assert(scans.nonEmpty && scans.forall(s =>
      !s.contains("lang") && !s.contains("source")),
      s"docs scan reads unused columns:\n${scans.mkString("\n")}")
  }

  test("correlation matrix: all pairs from ONE lineitem scan") {
    val df = SparkEntry.queries("q_corr_matrix")(spark, TestSpark.sf)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("lineitem"))
    assert(scans.size == 1, s"matrix must not scan per pair: ${scans.size} scans")
  }

  test("CDC merge is one key join, no product, scan pruned to used columns") {
    val df = SparkEntry.queries("q_merge_upsert")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"merge must be a key join:\n$p")
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .filter(_.contains("orders")).foreach { scan =>
        assert(!scan.contains("o_orderpriority"),
          s"unused column read by merge scan:\n$scan")
      }
  }

  test("row diff is one full-outer key join over pruned scans") {
    val df = SparkEntry.queries("q_row_diff")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"diff lost its full-outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff must join by key:\n$p")
  }

  test("doc chunking is a zero-shuffle map over a doc_id+text scan") {
    val df = SparkEntry.queries("q_doc_chunks")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation ORDER BY
    assert(!"Exchange hashpartitioning".r.findFirstIn(p).isDefined,
      s"chunking shuffled:\n$p")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("documents")).getOrElse(fail("no documents scan"))
    assert(!scan.contains("source"), s"unused column read:\n$scan")
  }

  test("containment pairs off the standing postings like jaccard, no product") {
    val p = planOf("q_ngram_containment")
    assert(p.contains("graft_engram2"),
      s"standing rare-gram postings index not probed:\n$p")
    assert(!p.toLowerCase.contains("documents.parquet"),
      s"q_ngram_containment re-reads the corpus instead of the index:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair join degenerated into a product:\n$p")
  }

  test("dedup funnel probes the standing keeper+label indexes, no pair join") {
    val p = planOf("q_dedup_funnel")
    assert(p.contains("graft_keepers") && p.contains("graft_cclabels"),
      s"funnel must ride the standing keeper/label indexes:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin("+"*"), s"unexpected join shape:\n$p")
    // one corpus scan: documents appears exactly once among the leaves
    val docScans = SparkEntry.queries("q_dedup_funnel")(spark, TestSpark.sf)
      .queryExecution.executedPlan.collectLeaves()
      .count(_.toString.toLowerCase.contains("documents"))
    assert(docScans == 1, s"funnel must scan the corpus once, saw $docScans")
  }

  test("semantic decontamination probes the standing pair table, never rebuckets") {
    val p = planOf("q_embed_decontaminate")
    assert(p.contains("graft_embpairs"),
      s"must probe the standing near-dup pair index:\n$p")
    assert(!p.toLowerCase.contains("embeddings.parquet"),
      s"q_embed_decontaminate re-reads the corpus instead of the pair index:\n$p")
  }

  test("embedding cohesion broadcasts the centroid table; corpus scans stay pruned") {
    val p = planOf("q_embed_cohesion")
    assert(p.contains("BroadcastHashJoin"),
      s"per-label centroids must broadcast, not shuffle the corpus:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cohesion join degenerated into a product:\n$p")
    val scan = SparkEntry.queries("q_embed_cohesion")(spark, TestSpark.sf)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("embeddings")).getOrElse(fail("no embeddings scan"))
    assert(!scan.contains("vec_id"), s"vec_id is unused and must be pruned:\n$scan")
  }

  test("dup spans probe the standing dup-gram index with nd pushed to the scan") {
    val df = SparkEntry.queries("q_dup_spans")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dupgrams"),
      s"spans must probe the standing dup-gram index:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span probe degenerated into a product:\n$p")
    val idxScan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("graft_dupgrams")).getOrElse(fail("no index scan"))
    assert(idxScan.contains("GreaterThanOrEqual(nd,2)") ||
      idxScan.contains("IsNotNull(nd)"),
      s"nd >= 2 not pushed to the index scan:\n$idxScan")
  }

  test("DSIR weights: 4096-bucket feature table broadcasts, corpus scanned linearly") {
    val df = SparkEntry.queries("q_dsir_weights")(spark, TestSpark.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dsirfeat"),
      s"scoring must probe the standing feature table:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the bounded feature table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"feature join degenerated into a product:\n$p")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .filter(_.contains("documents"))
    assert(scans.forall(s => !s.contains("lang") && !s.contains("n_chars")),
      s"docs scan reads unused columns:\n${scans.mkString("\n")}")
  }

  test("change feed merges full-outer on the key; MV-from-feed aggregates partially") {
    val p1 = planOf("q_cdf_changes")
    assert(p1.contains("FullOuter"),
      s"the per-commit image diff should be one full-outer key join:\n$p1")
    assert(!p1.contains("CartesianProduct"),
      s"feed plan degenerated into a product:\n$p1")
    val p2 = planOf("q_mv_from_feed")
    assert(p2.contains("HashAggregate"),
      s"the partial-state merge should be hash aggregation:\n$p2")
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoopJoin"),
      s"MV merge degenerated into a product:\n$p2")
  }

  test("sampled recall audit: stratum filter reaches the verify join's low side") {
    val p = planOf("q_lsh_recall_sampled")
    // the md5-threshold stratum (conv over the doc_id digest) must gate
    // the postings BEFORE the quadratic gram self-join — that filter IS
    // the cost bound of the sampled audit
    assert(p.contains("conv("),
      s"stratum filter missing from the sampled audit plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"gram verify join lost its equi-join strategy:\n$p")
  }

  test("min/max MV-from-feed: feed fold + rescan stay hash joins, no product") {
    val p = planOf("q_mv_minmax_feed")
    assert(p.contains("HashAggregate"),
      s"the min/max fold should be hash aggregation:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the feed fold or the touched-group rescan degenerated:\n$p")
    // the state ⋈ deltas group merge is the full-outer the algebra needs
    assert(p.contains("FullOuter"),
      s"the group merge lost its full-outer join:\n$p")
  }

  test("deletion-vector masking is one broadcast anti-join, never a shuffle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.sources.Versioned
    import graft.streaming.Cdc
    val dir = java.nio.file.Files.createTempDirectory("graft_dvplan").toString
    Cdc.applyBatch(
      (0L until 32L).map(k => (k, "U", s"v$k", 1L))
        .toDF("k", "op", "new_v", "seq"),
      dir, "k", Seq("v"), "seq", epochId = Some(0L), appId = Some("a"),
      nBuckets = 2)
    // one deleted key per bucket, so BOTH entries carry a DV
    def bucketOfKey(k: Long) = spark.range(1)
      .select(pmod(xxhash64(lit(k)), lit(2L))).first().getLong(0)
    val kA = (0L until 32L).find(bucketOfKey(_) == 0L).get
    val kB = (0L until 32L).find(bucketOfKey(_) == 1L).get
    Versioned.deleteKeys(spark, dir, Seq(kA, kB))
    val p = Versioned.read(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV masking should be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"DV masking shuffled the table to subtract a tiny key list:\n$p")
    // per-entry masking (r11): one broadcast anti-join per DV'd entry,
    // unioned map-side — still zero shuffles of the data
    val nDvd = Versioned.manifest(spark, dir).dvs.size
    val pe = p.split("LeftAnti").length - 1
    assert(nDvd == 2 && pe == nDvd,
      s"expected one anti-join per DV'd entry ($nDvd), got $pe:\n$p")
  }

  test("composite-key DV masking stays broadcast anti-joins on the key tuple") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.sources.Versioned
    import graft.streaming.Cdc
    val dir = java.nio.file.Files.createTempDirectory("graft_dvplan2").toString
    Cdc.applyBatchKeyed(
      (0L until 16L).map(k => (k, s"s${k % 2}", "U", s"v$k", 1L))
        .toDF("k1", "k2", "op", "new_v", "seq"),
      dir, Seq("k1", "k2"), Seq("v"), "seq", epochId = Some(0L),
      appId = Some("a"), nBuckets = 2)
    Versioned.deleteKeys(spark, dir, Seq(Seq(3L, "s1"), Seq(8L, "s0")))
    val p = Versioned.read(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"composite DV masking should be a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"composite DV masking shuffled the table:\n$p")
    // the anti-join keys are the FULL tuple — both key columns appear in
    // the join condition (a single-column mask would over-delete)
    assert(p.contains("k1") && p.contains("k2"), s"tuple key missing:\n$p")
  }
}
