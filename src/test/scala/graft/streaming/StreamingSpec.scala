package graft.streaming

import graft.SparkSpec
import graft.runtime.Materializer
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

  test("upsertSink materializes micro-batches identically to the batch rerun") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_streamsink_").toString
    val mat = new Materializer(spark, dir)

    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val events = in.toDF().toDF("collector_tstamp", "app_id", "domain_userid")
    // default 1-day delay: batch 1 reaches Jan-2 09:00, so its watermark
    // (Jan-1 09:00) keeps the Jan-1 window open for batch 2's late event
    val agg = StreamingOps.dailyTraffic(events)
      .withColumn("id", concat_ws("-", col("event_date"), col("app_id")))
    val q = StreamingOps.upsertSink(agg, mat, "stream_daily", "id").start()

    val batch1 = Seq((ts("2024-01-01 10:00:00"), "app0", "u1"),
      (ts("2024-01-01 11:00:00"), "app0", "u2"),
      (ts("2024-01-02 09:00:00"), "app1", "u3"))
    val batch2 = Seq((ts("2024-01-01 12:00:00"), "app0", "u1"),
      (ts("2024-01-02 10:00:00"), "app1", "u4"))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch rerun over the full input: the same daily agg, computed once
    val expected = (batch1 ++ batch2)
      .toDF("collector_tstamp", "app_id", "domain_userid")
      .groupBy(to_date(col("collector_tstamp")).as("event_date"), col("app_id"))
      .agg(count(lit(1)).as("total_visits"),
        approx_count_distinct("domain_userid").as("unique_visitors"))
      .withColumn("id", concat_ws("-", col("event_date"), col("app_id")))
      .collect().map(_.toSeq.map(String.valueOf)).toSet

    val got = mat.readPrior("stream_daily").get
      .select("event_date", "app_id", "total_visits", "unique_visitors", "id")
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(got == expected, s"streamed $got\nvs batch $expected")
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
