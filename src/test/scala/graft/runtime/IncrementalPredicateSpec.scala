package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dbt's incremental_predicates: the merge-scan bound on the upsert
  * (Materializer.materialize) — only prior rows inside the predicate
  * window participate in the key match.
  */
class IncrementalPredicateSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-ip").toString

  private def df(rs: Seq[(String, String, Int)]): DataFrame =
    rs.toDF("id", "d", "v").select($"id", to_date($"d").as("d"), $"v")

  private val window = Seq(col("d") >= lit(java.sql.Date.valueOf("2024-01-10")))

  test("in-window keys upsert normally; out-of-window rows pass through join-free") {
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => df(Seq(
      ("a", "2024-01-01", 1), ("b", "2024-01-15", 2), ("c", "2024-01-20", 3))))
    val out = mat.materialize("t", "id", incrementalPredicates = window)(_ =>
        df(Seq(("b", "2024-01-16", 20), ("d", "2024-01-21", 4))))
      .select($"id", $"v").as[(String, Int)].collect().toSet
    // b (in-window) replaced, c untouched, a (out-of-window) untouched,
    // d inserted
    assert(out == Set(("a", 1), ("b", 20), ("c", 3), ("d", 4)))
  }

  test("the documented trade: a fresh key whose prior row is OUTSIDE the window duplicates") {
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => df(Seq(("a", "2024-01-01", 1))))
    val out = mat.materialize("t", "id", incrementalPredicates = window)(_ =>
        df(Seq(("a", "2024-01-15", 99))))
      .select($"id", $"v").as[(String, Int)].collect().toSeq.sorted
    assert(out == Seq(("a", 1), ("a", 99)))
    // the same run WITHOUT the predicate dedups correctly
    val mat2 = new Materializer(spark, freshDir())
    mat2.materialize("t", "id")(_ => df(Seq(("a", "2024-01-01", 1))))
    val out2 = mat2.materialize("t", "id")(_ => df(Seq(("a", "2024-01-15", 99))))
      .select($"id", $"v").as[(String, Int)].collect().toSet
    assert(out2 == Set(("a", 99)))
  }

  test("a NULL predicate value counts as outside the window (row passes through)") {
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ =>
      Seq(("a", Option.empty[String], 1), ("b", Some("2024-01-15"), 2))
        .toDF("id", "d", "v").select($"id", to_date($"d").as("d"), $"v"))
    val out = mat.materialize("t", "id", incrementalPredicates = window)(_ =>
        df(Seq(("c", "2024-01-16", 3))))
      .select($"id", $"v").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 1), ("b", 2), ("c", 3)))
  }

  test("multiple predicates conjoin") {
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => df(Seq(
      ("a", "2024-01-12", 1), ("b", "2024-01-15", 2))))
    val preds = window :+ (col("v") > 1)
    // a is in the DATE window but fails v > 1 → out of window → survives
    // even though the fresh batch carries its key
    val out = mat.materialize("t", "id", incrementalPredicates = preds)(_ =>
        df(Seq(("a", "2024-01-16", 10), ("b", "2024-01-16", 20))))
      .select($"id", $"v").as[(String, Int)].collect().toSeq.sorted
    assert(out == Seq(("a", 1), ("a", 10), ("b", 20)))
  }
}
