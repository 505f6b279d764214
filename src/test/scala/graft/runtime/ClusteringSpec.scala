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
