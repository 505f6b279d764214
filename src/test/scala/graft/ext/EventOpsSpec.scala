package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String)*): DataFrame =
    rows.toDF("user_id", "__ts", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("__ts"))).drop("__ts")

  test("sessionize: 30-min idle gap splits, id tiebreak orders, per-user isolation") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:10:00", 2L, "click"),     // 10 min gap → same session
      (1L, "2024-01-01 00:50:00", 3L, "view"),      // 40 min gap → new session
      (1L, "2024-01-01 01:00:00", 4L, "purchase"),
      (2L, "2024-01-01 00:45:00", 5L, "view"))      // other user unaffected
    val got = EventOps.sessionize(e, 30)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: gap exactly at the threshold stays in-session") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:30:00", 2L, "view"),      // == 30 min: not > → same
      (1L, "2024-01-01 01:00:00.000001", 3L, "view")) // 30 min + 1µs → new
    val got = EventOps.sessionize(e, 30)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessionSummary: hand-computed bounds and counts") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:10:00", 2L, "purchase"),
      (1L, "2024-01-01 00:50:00", 3L, "purchase"))
    val got = EventOps.sessionSummary(e, 30)
      .select("user_id", "session_idx", "session_start_us", "session_end_us",
        "n_events", "n_purchases")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    assert(got == Set(
      (1L, 1L, base, base + 600000000L, 2L, 1L),
      (1L, 2L, base + 3000000000L, base + 3000000000L, 1L, 1L)))
  }

  test("asOfJoin: at-or-before match, equal-ts inclusive, max-id tiebreak, null miss") {
    val left = ev(
      (1L, "2024-01-01 00:00:02", 100L, "p"),  // → right id 10 (ts 1)
      (1L, "2024-01-01 00:00:05", 101L, "p"),  // → right id 13 (equal ts inclusive)
      (1L, "2024-01-01 00:00:04", 102L, "p"),  // → right id 12 (ts-tie → max id)
      (1L, "2024-01-01 00:00:00", 103L, "p"),  // → no match
      (2L, "2024-01-01 00:00:09", 104L, "p"))  // other key: no key-1 leakage
    val right = ev(
      (1L, "2024-01-01 00:00:01", 10L, "c"),
      (1L, "2024-01-01 00:00:03", 11L, "c"),
      (1L, "2024-01-01 00:00:03", 12L, "c"),   // ts-tied pair: 12 must win
      (1L, "2024-01-01 00:00:05", 13L, "c"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_id").as("matched_id"))
    val got = EventOps.asOfJoin(left, right, "user_id", "ts", "event_id",
        Seq("matched_id"))
      .select("event_id", "matched_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(100L -> Some(10L), 101L -> Some(13L), 102L -> Some(12L),
      103L -> None, 104L -> None))
  }

  test("funnelCounts: conversion window, strict ordering, missing-head exclusion") {
    val e = ev(
      // user 1 completes A→B→C inside the 100 s window at each step
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-01 00:00:50", 2L, "B"),
      (1L, "2024-01-01 00:02:10", 3L, "C"),   // 80 s after B
      // user 2: B arrives 200 s after A → outside window, stops at A
      (2L, "2024-01-01 00:00:00", 4L, "A"),
      (2L, "2024-01-01 00:03:20", 5L, "B"),
      // user 3: B with no A at all → counted nowhere
      (3L, "2024-01-01 00:00:00", 6L, "B"),
      // user 4: B simultaneous with A → not strictly after, stops at A
      (4L, "2024-01-01 00:00:00", 7L, "A"),
      (4L, "2024-01-01 00:00:00", 8L, "B"))
    val got = EventOps.funnelCounts(e, Seq("A", "B", "C"), 100L * 1000000L)
      .select("stage_idx", "stage", "users")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((0, "A", 3L), (1, "B", 1L), (2, "C", 1L)))
  }

  test("dailyActivitySpine: silent days zero-filled across the full range") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "purchase"),
      (1L, "2024-01-03 10:00:00", 2L, "view"),   // user 1 silent on the 2nd
      (2L, "2024-01-02 10:00:00", 3L, "view"))   // user 2 silent on 1st and 3rd
    val got = EventOps.dailyActivitySpine(e)
      .select(col("user_id"), col("day").cast("string"), col("n_events"), col("n_purchases"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "2024-01-01", 1L, 1L), (1L, "2024-01-02", 0L, 0L), (1L, "2024-01-03", 1L, 0L),
      (2L, "2024-01-01", 0L, 0L), (2L, "2024-01-02", 1L, 0L), (2L, "2024-01-03", 0L, 0L)))
  }

  test("dailyActivitySpineBounded: per-user span only — zero-fill inside, no rows outside") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "purchase"),
      (1L, "2024-01-03 10:00:00", 2L, "view"),   // user 1 silent on the 2nd
      (2L, "2024-01-02 10:00:00", 3L, "view"))   // user 2 active ONE day
    val got = EventOps.dailyActivitySpineBounded(e)
      .select(col("user_id"), col("day").cast("string"), col("n_events"), col("n_purchases"))
      .as[(Long, String, Long, Long)].collect().toSet
    // user 2's spine is exactly its own [min, max] day — none of the
    // global spine's edge rows (the users×platform-days blowup the r16
    // sf1 tier measured as 100× rows for 10× input)
    assert(got == Set(
      (1L, "2024-01-01", 1L, 1L), (1L, "2024-01-02", 0L, 0L), (1L, "2024-01-03", 1L, 0L),
      (2L, "2024-01-02", 1L, 0L)))
    // and inside each user's span it agrees with the global spine
    val globalInSpan = EventOps.dailyActivitySpine(e)
      .join(EventOps.dailyActivitySpineBounded(e).select("user_id", "day"),
        Seq("user_id", "day"), "left_semi")
      .select(col("user_id"), col("day").cast("string"), col("n_events"), col("n_purchases"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(globalInSpan == got)
  }

  test("forwardFill: carries last observation, default before the first") {
    val df = Seq(
      (1L, 1, Some(10L)), (1L, 2, None), (1L, 3, None), (1L, 4, Some(7L)),
      (2L, 1, None), (2L, 2, Some(5L)))
      .toDF("k", "ord", "v")
    val got = EventOps.forwardFill(df, Seq("k"), "ord", "v", lit(-1L))
      .select("k", "ord", "filled").as[(Long, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, 10L), (1L, 2, 10L), (1L, 3, 10L), (1L, 4, 7L),
      (2L, 1, -1L), (2L, 2, 5L)))
  }

  test("interpolateLinear: straight line between observations, nearest at edges") {
    val df = Seq(
      (1L, 0, Some(10L)), (1L, 1, None), (1L, 2, None), (1L, 3, Some(4L)),
      (1L, 4, None),                       // trailing → carries 4
      (2L, 0, None), (2L, 1, Some(5L)))    // leading → carries 5
      .toDF("k", "pos", "v")
    val got = EventOps.interpolateLinear(df, Seq("k"), "pos", "v")
      .select("k", "pos", "interp").as[(Long, Int, Double)].collect().toSet
    assert(got == Set(
      (1L, 0, 10.0), (1L, 1, 8.0), (1L, 2, 6.0), (1L, 3, 4.0), (1L, 4, 4.0),
      (2L, 0, 5.0), (2L, 1, 5.0)))
  }

  test("intervalJoin: inclusive bounds, multi-bucket spans, exactly-once pairs") {
    val points = ev(
      (1L, "2024-01-01 00:00:00", 1L, "p"),   // == interval A start
      (1L, "2024-01-02 12:00:00", 2L, "p"),   // strictly inside A (bucket 2)
      (1L, "2024-01-03 00:00:00", 3L, "p"),   // == interval A end
      (1L, "2024-01-03 00:00:01", 4L, "p"),   // 1s past A's end → only B
      (9L, "2023-12-30 00:00:00", 5L, "p"))   // before everything
      .select("event_id", "ts")
    val iv = Seq(
      ("A", "2024-01-01 00:00:00", "2024-01-03 00:00:00"),  // spans 3 day-buckets
      ("B", "2024-01-02 00:00:00", "2024-01-04 00:00:00"))
      .toDF("iv_id", "__s", "__e")
      .select(col("iv_id"), to_timestamp(col("__s")).as("s"), to_timestamp(col("__e")).as("e"))
    val got = EventOps.intervalJoin(points, "ts", iv, "s", "e",
        Seq("iv_id"), 86400000000L)
      .groupBy("event_id").agg(sort_array(collect_list(col("iv_id"))).as("ids"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got == Map(1L -> Seq("A"), 2L -> Seq("A", "B"), 3L -> Seq("A", "B"),
      4L -> Seq("B")))
    // exactly-once: no event pairs with the same interval twice even though
    // interval A spans three of the event's candidate buckets
    val dup = EventOps.intervalJoin(points, "ts", iv, "s", "e",
        Seq("iv_id"), 86400000000L)
      .groupBy("event_id", "iv_id").count().filter(col("count") > 1).count()
    assert(dup == 0L)
  }

  test("retentionCohorts: first-activity cohort, 7-day offset buckets") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (1L, "2024-01-09 10:00:00", 2L, "view"),  // day 8 → week_offset 1
      (1L, "2024-01-07 10:00:00", 3L, "view"),  // day 6 → still offset 0
      (2L, "2024-01-01 23:00:00", 4L, "view"))
    val got = EventOps.retentionCohorts(e)
      .select(col("cohort_date").cast("string"), col("week_offset"), col("users"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L)))
  }
}
