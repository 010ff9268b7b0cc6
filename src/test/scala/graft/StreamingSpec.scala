package graft

import graft.streaming.Events
import graft.streaming.Events.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("windowed aggregation with watermark matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0, 10), 1, "click", 1.0),
      Event(2, ts(0, 40), 2, "click", 2.0),
      Event(3, ts(1, 5), 1, "view", 3.0),
      Event(4, ts(1, 50), 3, "click", 4.0))
    val q = Events.windowedAgg(input.toDF())
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT minute_start, event_type, n FROM winagg ORDER BY minute_start, event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq == Seq(
        (ts(0), "click", 2L), (ts(1), "click", 1L), (ts(1), "view", 1L)))
    } finally q.stop()
  }

  test("dedup within watermark drops repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0, 30), 1, "click", 1.0),
      Event(2, ts(1), 2, "view", 2.0))
    val q = Events.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup").collect()(0).getLong(0) == 2)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 10.0),    // in window of purchase @10:30
      Event(2, ts(5), 1, "click", 20.0),    // in window too
      Event(3, ts(2), 2, "click", 30.0),    // other user
      Event(4, ts(30), 1, "purchase", 99.0),
      Event(5, ts(31), 3, "purchase", 50.0)) // user 3 has no clicks
    val q = Events.purchaseAttribution(input.toDF(), windowMinutes = 60)
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT p_user, c_value FROM attr ORDER BY p_user, c_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      // purchase by user 1 matches both of user 1's clicks; nothing else
      assert(rows.toSeq == Seq((1L, 10.0), (1L, 20.0)))
    } finally q.stop()
  }

  test("stateful sessionizer tracks gap-based sessions per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(5), 7, "view", 1.0))
    val q = Events.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      // second batch: 40-minute gap → new session
      input.addData(Event(3, Timestamp.valueOf("2024-01-01 10:45:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events FROM sess ORDER BY session_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // first emission: session of 2 events; second: fresh session of 1
      assert(rows.head == (7L, 2L))
      assert(rows.last == (7L, 1L))
    } finally q.stop()
  }
}
