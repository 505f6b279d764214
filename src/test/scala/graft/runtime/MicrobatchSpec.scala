package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.time.LocalDate

/** dbt 1.9 microbatch incremental strategy: per-window insert_overwrite
  * rebuilds with a lookback horizon (Materializer.materializeMicrobatch).
  */
class MicrobatchSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-mb").toString

  private val begin = LocalDate.parse("2024-01-01")

  /** (day-of-month, key, value) fact rows → source frame. */
  private def srcDf(rs: Seq[(Int, String, Int)]): DataFrame =
    rs.map { case (d, k, v) => (f"2024-01-$d%02d", k, v) }
      .toDF("ds", "k", "v")
      .select(to_date($"ds").as("event_date"), $"k", $"v")

  /** Daily rollup model: the window filter lands on the SOURCE read,
    * exactly where dbt injects it.
    */
  private def model(src: DataFrame)(lo: LocalDate, hi: LocalDate): DataFrame =
    src.filter($"event_date" >= lit(java.sql.Date.valueOf(lo)) &&
               $"event_date" < lit(java.sql.Date.valueOf(hi)))
      .groupBy("event_date", "k").agg(sum($"v").as("total"))

  private def fullBuild(src: DataFrame): Set[(String, String, Long)] =
    src.groupBy("event_date", "k").agg(sum($"v").as("total"))
      .select($"event_date".cast("string"), $"k", $"total")
      .as[(String, String, Long)].collect().toSet

  private def tableSet(t: DataFrame): Set[(String, String, Long)] =
    t.select($"event_date".cast("string"), $"k", $"total")
      .as[(String, String, Long)].collect().toSet

  private val baseRows = Seq(
    (1, "a", 10), (1, "b", 1), (2, "a", 20), (3, "b", 30),
    (4, "a", 5), (5, "b", 7), (5, "a", 2))

  test("first run backfills every window from begin and equals the full build") {
    val mat = new Materializer(spark, freshDir())
    val src = srcDf(baseRows)
    val t = mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-05"))(model(src))
    assert(tableSet(t) == fullBuild(src))
  }

  test("late fact inside the lookback horizon is absorbed; re-run is idempotent") {
    val mat = new Materializer(spark, freshDir())
    val asOf1 = LocalDate.parse("2024-01-05")
    mat.materializeMicrobatch("m", "event_date", begin, asOf1)(model(srcDf(baseRows)))
    // a late row for Jan 4 arrives; next run is asOf Jan 5 with lookback 1
    // → windows Jan 4..5 rebuild and the late fact lands
    val late = srcDf(baseRows :+ ((4, "b", 99)))
    val t2 = mat.materializeMicrobatch("m", "event_date", begin, asOf1,
      lookback = 1)(model(late))
    assert(tableSet(t2) == fullBuild(late))
    val t3 = mat.materializeMicrobatch("m", "event_date", begin, asOf1,
      lookback = 1)(model(late))
    assert(tableSet(t3) == fullBuild(late))
  }

  test("late fact OUTSIDE the lookback horizon is NOT picked up — the run really prunes old windows") {
    val mat = new Materializer(spark, freshDir())
    val asOf = LocalDate.parse("2024-01-05")
    val before = srcDf(baseRows)
    mat.materializeMicrobatch("m", "event_date", begin, asOf)(model(before))
    // late row for Jan 1; high-watermark is Jan 5, lookback 1 → rebuild
    // window starts Jan 4 and the Jan-1 window is never re-read
    val late = srcDf(baseRows :+ ((1, "c", 77)))
    val t = mat.materializeMicrobatch("m", "event_date", begin, asOf,
      lookback = 1)(model(late))
    assert(tableSet(t) == fullBuild(before))
    // the targeted-backfill surface repairs exactly that window
    val fixed = mat.rebuildMicrobatchWindow("m", "event_date",
      LocalDate.parse("2024-01-01"))(model(late))
    assert(tableSet(fixed) == fullBuild(late))
  }

  test("a window that rebuilds to zero rows ends up EMPTY, not stale (insert_overwrite, not dynamic-overwrite)") {
    val mat = new Materializer(spark, freshDir())
    val asOf = LocalDate.parse("2024-01-05")
    mat.materializeMicrobatch("m", "event_date", begin, asOf)(model(srcDf(baseRows)))
    // Jan 5's facts are retracted at the source; rebuilding with lookback
    // covering Jan 5 must CLEAR that partition
    val retracted = srcDf(baseRows.filterNot(_._1 == 5))
    val t = mat.materializeMicrobatch("m", "event_date", begin, asOf,
      lookback = 1)(model(retracted))
    assert(tableSet(t) == fullBuild(retracted))
    assert(t.filter($"event_date" === lit(java.sql.Date.valueOf("2024-01-05"))).count() == 0)
  }

  test("batch output is clamped to its window — a leaking model cannot cross partitions") {
    val mat = new Materializer(spark, freshDir())
    // malicious model: ignores the window and always returns ALL days
    val src = srcDf(baseRows)
    val t = mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-05")) { (_, _) =>
        src.groupBy("event_date", "k").agg(sum($"v").as("total"))
      }
    // clamping makes the fused run equal the correct build anyway, with
    // each row materialized exactly once
    assert(tableSet(t) == fullBuild(src))
    assert(t.count() == fullBuild(src).size)
  }

  test("asOf earlier than (high-watermark - lookback) is a no-op, not a crash") {
    val mat = new Materializer(spark, freshDir())
    val src = srcDf(baseRows)
    mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-05"))(model(src))
    val before = tableSet(spark.read.parquet(mat.outPath("m")))
    var built = Vector.empty[LocalDate]
    // hw Jan 5, lookback 1 → start Jan 4; asOf Jan 2 yields ZERO windows
    val t = mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-02"), lookback = 1) { (lo, hi) =>
        built :+= lo; model(src)(lo, hi)
      }
    assert(built.isEmpty && tableSet(t) == before)
  }

  test("advancing asOf processes only the new + lookback windows") {
    val mat = new Materializer(spark, freshDir())
    var built = Vector.empty[LocalDate]
    def counting(src: DataFrame)(lo: LocalDate, hi: LocalDate): DataFrame = {
      built :+= lo
      model(src)(lo, hi)
    }
    val src = srcDf(baseRows)
    mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-03"))(counting(src))
    assert(built == Vector(1, 2, 3).map(d => LocalDate.parse(f"2024-01-0$d")))
    built = Vector.empty
    mat.materializeMicrobatch("m", "event_date", begin,
      LocalDate.parse("2024-01-05"), lookback = 1)(counting(src))
    // high-watermark Jan 3, lookback 1 → Jan 2..5
    assert(built == Vector(2, 3, 4, 5).map(d => LocalDate.parse(f"2024-01-0$d")))
  }
}
