package graft.streaming

import graft.operators.Lakehouse
import graft.sources.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply — the ingestion face of §2f: an unbounded stream of
  * change rows (key, op, new values, sequence number) continuously MERGEs
  * into a [[Versioned]] table, one committed version per micro-batch.
  * This is the standard lakehouse CDC sink shape (Delta's
  * `foreachBatch` + MERGE): Structured Streaming owns offsets/retries via
  * the checkpoint, and the versioned commit is the atomic publish.
  * Batch-retry idempotence is EXACT: every commit records its stream
  * identity and epoch (Delta's txnAppId/txnVersion — here the checkpoint
  * path and the foreachBatch batchId) in the manifest, and a replayed
  * epoch of the SAME stream skips the commit entirely. The fence is the
  * PER-APPID high-water (`Versioned.latestEpochFor` scans manifests
  * newest-first for this stream's identity), not the last writer's
  * manifest — so a second stream, a batch `applyBatch`, or a CLI
  * snapshot interleaving between this stream's commit and its
  * crash-replay cannot disarm it. Version history stays
  * one-version-per-applied-batch even across crash/replay and mixed
  * writers, so a downstream version-count assertion never flakes.
  * A different stream's colliding batch number never fences (its appId
  * differs), and the merge itself is also idempotent (updates set the
  * same values, deletes of gone keys no-op) as defense in depth.
  *
  * Per batch:
  *   1. compact the batch to its LATEST change per key (row_number over
  *      seqCol descending — CDC feeds carry multiple ops per key);
  *   2. merge into the current table version (one full-outer key join,
  *      [[Lakehouse.mergeUpsert]]);
  *   3. commit the result as the next version (readers time-travel to any
  *      pre-batch state).
  *
  * Scale: steps 1-2 are one shuffle each on the key; the table rewrite is
  * snapshot-per-batch (simple, bounded by table size) — the production
  * refinement is partition- or file-level rewrite of only the touched
  * keys, which the Versioned manifest layout already permits (append
  * commits referencing unchanged directories).
  */
object Cdc {

  /** Start the CDC-apply sink. `changes` must carry `key`, `op`
    * ('U'/'D'), `seqCol`, and `new_<c>` for every value column `c`.
    * `appId` is the stream's transactional identity (Delta's txnAppId):
    * it defaults to the checkpoint path, which is stable across restarts
    * of the same stream and distinct per stream — a DIFFERENT stream
    * whose batch numbers happen to collide is never fenced. Deleting and
    * reusing a checkpoint directory resets batch ids under the SAME
    * identity; like Delta, that requires a fresh appId (or table).
    */
  def applyChanges(changes: DataFrame, tableDir: String, checkpointDir: String,
                   key: String, valueCols: Seq[String], seqCol: String,
                   appId: Option[String] = None): StreamingQuery = {
    val app = appId.getOrElse(s"cdc:$checkpointDir")
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, tableDir, key, valueCols, seqCol,
          Some(batchId), Some(app))
        ()
      }
      .start()
  }

  /** One micro-batch of the CDC merge (factored out so batch jobs and
    * tests drive the identical code path). With an epoch: a batch whose
    * (appId, epochId) is at or behind THIS appId's committed high-water
    * is a REPLAY and is skipped — the commit already happened; the crash
    * hit after publish. Epochs from a different appId never fence (a new
    * stream legitimately restarts at batch 0), and commits from OTHER
    * writers between this stream's publish and its replay never un-fence
    * (the high-water is per appId, not last-writer).
    */
  /** In-process per-(table, appId) epoch high-water: epochs are monotone
    * within a stream identity, so after ONE manifest scan (or one
    * commit) the fence is a map lookup — without it a stream sharing a
    * table with a chatty second writer re-reads the whole interleaved
    * manifest history every micro-batch. `Long.MinValue` caches a
    * scanned "never committed" so the pre-first-commit batches don't
    * rescan either. Process-local by design: an appId names exactly one
    * stream, and reusing an appId against a wiped table already requires
    * a fresh identity (documented above, the Delta rule).
    */
  private val epochHighWater =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  private def bump(k: (String, String), e: Long): Unit =
    epochHighWater.merge(k, java.lang.Long.valueOf(e),
      (a, b) => java.lang.Long.valueOf(math.max(a, b)))

  def applyBatch(batch: DataFrame, tableDir: String, key: String,
                 valueCols: Seq[String], seqCol: String,
                 epochId: Option[Long] = None,
                 appId: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // one manifest listing per batch (needed below for the empty-base
    // branch anyway). An EMPTY list with a populated high-water cache
    // means the table dir was wiped and recreated at the same path in
    // this JVM (tests, notebooks, long-lived drivers): the cached
    // high-water belongs to the dead table and would silently skip the
    // recreated stream's first epochs as replays — drop it and rescan.
    val tableVersions = Versioned.versions(spark, tableDir)
    if (tableVersions.isEmpty)
      appId.foreach(a => epochHighWater.remove((tableDir, a)))
    val replayed = (for {
      e <- epochId; a <- appId
    } yield {
      val k = (tableDir, a)
      val hw = Option(epochHighWater.get(k)).map(_.longValue).getOrElse {
        val scanned = Versioned.latestEpochFor(spark, tableDir, a)
          .getOrElse(Long.MinValue)
        bump(k, scanned)
        scanned
      }
      e <= hw
    }).getOrElse(false)
    if (replayed) return
    // seq ties break on a content hash, NOT shuffle arrival order: a
    // replayed batch must pick the SAME winner or the idempotent-replay
    // contract (byte-identical duplicate version) breaks. Identical-
    // content ties are trivially stable; differing-content ties resolve
    // deterministically by the hash.
    val tieCols = batch.columns.filterNot(_ == seqCol).sorted.map(col)
    val w = Window.partitionBy(col(key))
      .orderBy(col(seqCol).desc, xxhash64(tieCols: _*))
    val compacted = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", seqCol)
    val base =
      if (tableVersions.isEmpty)
        // first batch: empty base with the value schema the merges produce
        compacted.select(col(key) +:
          valueCols.map(c => col(s"new_$c").as(c)): _*).limit(0)
      else Versioned.read(spark, tableDir)
    val merged = Lakehouse.mergeUpsert(base, compacted, key, valueCols)
      .drop("src")
    Versioned.commit(merged, tableDir, epochId = epochId, appId = appId)
    for (e <- epochId; a <- appId) bump((tableDir, a), e)
  }
}
