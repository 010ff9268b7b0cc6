package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionizer state — top-level: Catalyst's generated state (de)serializer
  * cannot instantiate object-nested case classes (janino can't see the
  * outer-instance constructor).
  */
final case class SessionState(startUs: Long, lastUs: Long, n: Long)

/** Structured Streaming twins of the batch event operators (SURVEY §2e.51):
  * the same logical computations as `q_events_window` / dedup / `q_sessionize`
  * expressed over an unbounded stream with watermarks and state.
  *
  * Scale posture: state is keyed and bounded — watermarks bound the window
  * and dedup state, the sessionizer times out idle keys; all three run
  * per-key parallel on the shuffle partitioning of the key.
  */
object Events {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionUpdate(user_id: Long, session_start_us: Long,
                                 session_end_us: Long, n_events: Long)

  /** Tumbling 1-minute windowed aggregation with a 10-minute watermark —
    * the streaming twin of `q_events_window`.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.Q.micros(col("value"))).as("total_value_micros"))
      .select(col("window.start").as("minute_start"), col("event_type"),
        col("n"), col("total_value_micros"))

  /** Watermarked stream-stream interval join — the streaming side of the
    * batch `q_asof_join` attribution shape: each purchase joins every click
    * by the same user within the preceding `windowMinutes`. The range
    * condition plus both watermarks lets the engine bound buffered click
    * state to interval + lateness, so state never grows with stream length.
    * (A streaming "latest click only" needs a stateful argmax on top; the
    * interval join is the scalable primitive both variants share.)
    */
  def purchaseAttribution(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks, expr(
      s"p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL $windowMinutes MINUTES"))
  }

  /** Exactly-once-per-id dedup within the watermark horizon. Must be the
    * WithinWatermark variant: plain dropDuplicates("event_id") under a
    * watermark never evicts its state (eviction requires the event-time
    * column in the key set), so id-state would grow with stream length.
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static outlier scoring — the streaming half of
    * `q_outlier_events`: the per-type moment table (n, Σv, Σv²) comes from
    * a BATCH job over history ([[graft.operators.Analytic.eventMoments]],
    * same exact integer algebra) and broadcast-joins onto the live stream;
    * each event is flagged by the identical cross-multiplied test
    * (n·v − s)² > 9·(n·q − s²), so a flagged stream row is exactly a row
    * the batch query would count. Stateless — no watermark and no state
    * store; the scorer is a pure map over the broadcast model, the
    * canonical "score a stream against a trained table" shape.
    */
  def scoreOutliers(events: DataFrame, moments: DataFrame): DataFrame =
    events
      .withColumn("v", graft.Q.micros(col("value")))
      .join(broadcast(moments), Seq("event_type"))
      .withColumn("is_outlier", graft.operators.Analytic.outlierTest)
      .select(col("event_id"), col("event_type"), col("v"), col("is_outlier"))

  /** Gap-based sessionization (30-minute inactivity) via
    * flatMapGroupsWithState — each batch emits EVERY session closed within
    * it plus a snapshot of the still-open session (mapGroupsWithState's
    * one-row-per-key contract silently drops sessions that both open and
    * close inside one batch). Distinct session_start_us per user therefore
    * equals the batch sessionizer's count.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 evictIdleState: Boolean = false): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionUpdate] = {
      if (state.hasTimedOut) {
        // idle key: emit the session as closed and DROP the state — this is
        // the bounded-state guarantee evictIdleState promises
        val st = state.getOption.orNull
        state.remove()
        return if (st != null)
          Iterator(SessionUpdate(userId, st.startUs, st.lastUs, st.n))
        else Iterator.empty
      }
      // exact event-time micros: getTime alone is ms-truncated, which
      // quantizes gap tests (and the emitted *_us fields) away from the
      // batch sessionizer's exact unix_micros
      def usOf(t: java.sql.Timestamp): Long =
        (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
      val sorted = batch.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
      var st = state.getOption.orNull
      val out = scala.collection.mutable.ListBuffer.empty[SessionUpdate]
      for (e <- sorted) {
        val us = usOf(e.ts)
        if (st == null) st = SessionState(us, us, 1)
        else if (us - st.lastUs > gapUs) {
          out += SessionUpdate(userId, st.startUs, st.lastUs, st.n) // closed
          st = SessionState(us, us, 1)
        } else st = st.copy(lastUs = us, n = st.n + 1)
      }
      if (st != null) {
        state.update(st)
        out += SessionUpdate(userId, st.startUs, st.lastUs, st.n) // open snapshot
      }
      if (evictIdleState) state.setTimeoutDuration(s"$gapMinutes minutes")
      out.iterator
    }

    // evictIdleState=true bounds state for production streams but makes the
    // engine trigger continuous timeout micro-batches — keep it off for
    // synchronous processAllAvailable-style testing
    val timeout =
      if (evictIdleState) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), timeout)(
        (k: Long, it: Iterator[Event], st: GroupState[SessionState]) => update(k, it, st))
  }
}
