package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics: windowed agg updates across micro-batches and
  * the stateful last-touch argmax folds new batches into stored state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("dailyTraffic streaming agg accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val events = in.toDF().toDF("collector_tstamp", "app_id", "domain_userid")
    val q = StreamingOps.dailyTraffic(events).writeStream
      .format("memory").queryName("daily_out").outputMode("update").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "app0", "u1"),
        (ts("2024-01-01 11:00:00"), "app0", "u2"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 12:00:00"), "app0", "u1"))
      q.processAllAvailable()
      val out = spark.table("daily_out")
        .groupBy("event_date", "app_id").agg(max("total_visits").as("tv"))
        .as[(java.sql.Date, String, Long)].collect()
        .map { case (d, a, t) => (d, a) -> t }.toMap
      assert(out((java.sql.Date.valueOf("2024-01-01"), "app0")) == 3L)
    } finally q.stop()
  }

  test("lastTouch keeps the best touch across batches (paid beats later organic)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = StreamingOps.lastTouch(in.toDS()).writeStream
      .format("memory").queryName("touch_out").outputMode("update").start()
    try {
      in.addData(TouchEvent("u1", "5", 2, 1000L, "campA"))
      q.processAllAvailable()
      in.addData(TouchEvent("u1", "7", 1, 500L, "campB"))   // paid, older
      q.processAllAvailable()
      in.addData(TouchEvent("u1", "9", 2, 2000L, "campC"))  // organic, newer
      q.processAllAvailable()
      val rows = spark.table("touch_out").as[TouchEvent].collect()
      // latest state row for u1 must still be the paid touch (eventId 7)
      assert(rows.last.eventId == "7", rows.mkString(","))
    } finally q.stop()
  }
}
