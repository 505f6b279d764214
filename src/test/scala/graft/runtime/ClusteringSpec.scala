package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The data-skipping claim, measured: a narrow time-range predicate over
  * a range-clustered layout must decode a fraction of the rows the same
  * predicate decodes over a hash-scattered layout of identical content.
  */
class ClusteringSpec extends SparkSpec {

  private val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
  private val hi = java.sql.Timestamp.valueOf("2024-01-13 00:00:00")

  private def scannedRows(path: String): (Long, Long) = {
    val df = spark.read.parquet(path)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
    // collect() drives THIS QueryExecution's plan — count() would build
    // and execute a different one, leaving these metrics untouched
    val matched = df.collect().length.toLong
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    (scanned, matched)
  }

  test("z-order skips on BOTH dimensions; single-dim clustering only on its lead") {
    val ev = Sources(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type")
    val total = ev.count()
    val base = java.nio.file.Files.createTempDirectory("graft_z_").toString
    Clustering.writeClustered(ev, s"$base/ts_only", 8, Seq("ts"))
    Clustering.writeZOrdered(ev, s"$base/z", 8, col("user_id"), col("ts"))

    def scanned(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().head.metrics("numOutputRows").value
    }
    val tsPred = col("ts") >= lit(lo) && col("ts") < lit(hi)
    // sf0.001 has users 0..14 — the predicate must be narrow IN THAT
    // domain (a quarter of it) for file rectangles to fall outside it
    val userPred = col("user_id") < 4

    // ts-clustered layout: skips on ts, but user_id is scattered through
    // every file, so a user predicate can exclude nothing
    assert(scanned(s"$base/ts_only", tsPred) * 2 < total)
    assert(scanned(s"$base/ts_only", userPred) == total,
      "ts-clustered layout unexpectedly skipped on the non-lead column")
    // z-ordered layout: each file covers a (user, ts) rectangle — both
    // predicates exclude the files whose rectangle misses them
    val zTs = scanned(s"$base/z", tsPred)
    val zUser = scanned(s"$base/z", userPred)
    assert(zTs * 4 < total * 3, s"z-order failed to skip on ts: $zTs of $total")
    assert(zUser * 4 < total * 3, s"z-order failed to skip on user_id: $zUser of $total")
  }

  test("range clustering skips row groups; scatter layout decodes everything") {
    val ev = Sources(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts", "user_id", "event_type")
    val total = ev.count()
    val base = java.nio.file.Files.createTempDirectory("graft_clu_").toString

    Clustering.writeClustered(ev, s"$base/clu", 8, Seq("ts"))
    // control: same rows, same file count, hash-scattered — every file's
    // min/max stats span the whole month, so nothing can be skipped
    ev.repartition(8, col("event_id")).write.parquet(s"$base/rnd")

    val (cluScanned, cluMatched) = scannedRows(s"$base/clu")
    val (rndScanned, rndMatched) = scannedRows(s"$base/rnd")

    assert(cluMatched == rndMatched, "layout changed query semantics")
    assert(rndScanned == total,
      s"scattered layout unexpectedly skipped rows ($rndScanned of $total)")
    // 3 of 30 days → 1-2 of 8 range files overlap; anything under half
    // the table proves stats-based skipping is live (observed ~1/8)
    assert(cluScanned * 2 < rndScanned,
      s"clustered scan decoded $cluScanned rows vs $rndScanned scattered — no skip")
  }
}
