package graft

import graft.streaming.Events
import graft.streaming.Events.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Batch ↔ stream consistency: the streaming sessionizer, fed the real
  * events table in chronological chunks, must agree with the batch
  * q_sessionize session counts for the same users.
  */
class StreamBatchParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming sessionizer matches batch session counts on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val users = Seq(1L, 2L, 3L)
    val rows = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("user_id").isin(users: _*))
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("ts", "event_id")
      .as[Event].collect().toSeq

    val input = MemoryStream[Event]
    val q = Events.sessionize(input.toDS())
      .writeStream.format("memory").queryName("paritysess")
      .outputMode(OutputMode.Update()).start()
    try {
      // feed in three chronological chunks (multi-batch state handoff)
      rows.grouped(math.max(rows.size / 3, 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      // sessions observed by the stream = distinct session starts per user
      val streamed = spark.sql(
        """SELECT user_id, count(DISTINCT session_start_us) AS n_sessions
          |FROM paritysess GROUP BY user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val batch = SparkEntry.queries("q_sessionize")(spark, TestSpark.sf)
        .filter(col("user_id").isin(users: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }
}
