package graft.dev

import org.apache.spark.sql.functions._

/** Dev-only A/B harness for the `q_ext_ingest_neardup` gate-accounting
  * adjudication (VERDICT r12 "What's wrong" #3): measures the SAME
  * production ingest + structural gate under three gate regimes so the
  * r11→r12 timing correction exists as a checked-in artifact instead of
  * SURVEY prose.
  *
  *   - `r11_leak`    — the pre-ADVICE-r11-#2 gate: lazy flag row, pins
  *                     (survivors/dropped/pT/dT) leaked across passes, so
  *                     a min-of-3 reads pass 1's cached blocks. This is
  *                     the regime that produced r11's ~2.1 s reading.
  *   - `r12_honest`  — eager gate + unpersist, no token reuse (the r12
  *                     registered shape; its closure number was 5.08 s).
  *   - `r13_trimmed` — eager gate + unpersist, pool tokens REUSED from
  *                     the production pipeline's signature frame
  *                     (appendDedupNearDupSigned → poolToks) and the
  *                     gate's own pT/dT pinned once each.
  *
  * Each arm runs `passes` full construct+noop-write passes and reports
  * min + spread (the bench's row semantics). Output: one JSON line,
  * tee it into dev/gate_ab_r{N}.json. Not part of any round artifact
  * gate; the numbers adjudicate, the shipped code is the r13 arm.
  */
object GateAbSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)
    // same warmup as graft.Bench
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()

    def docsSub = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    def rowR12(): org.apache.spark.sql.DataFrame = {
      val docs = docsSub
      val existing = docs.filter(col("doc_id") % 20 === 0)
      val incoming = docs.filter(col("doc_id") % 20 =!= 0)
      graft.ext.StructGate.ingestNearDupGate(
        graft.ext.IngestOps.appendDedupNearDup(existing, incoming, 0.9),
        pool = docs, incoming = incoming, threshold = 0.9,
        tokensOf = graft.ext.TextOps.distinctTokens _)
    }
    def rowR13(): org.apache.spark.sql.DataFrame = {
      val docs = docsSub
      val existing = docs.filter(col("doc_id") % 20 === 0)
      val incoming = docs.filter(col("doc_id") % 20 =!= 0)
      val signed = graft.ext.IngestOps.appendDedupNearDupSigned(
        existing, incoming, 0.9)
      try graft.ext.StructGate.ingestNearDupGate(
        signed.survivors, pool = docs, incoming = incoming, threshold = 0.9,
        tokensOf = graft.ext.TextOps.distinctTokens _,
        poolToks = Some(signed.poolSigs.select(col("doc_id"), col("toks"))))
      finally signed.unpersistAll() // mirror the registered row exactly
    }
    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def arm(name: String, leak: Boolean, body: () => org.apache.spark.sql.DataFrame): String = {
      // finally: the flag is process-global — a throwing pass must not
      // leave every later ingestNearDupGate call in the JVM running
      // lazily with all four pins leaked (ADVICE r13)
      graft.ext.StructGate.devLazyGateR11 = leak
      val ts =
        try (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          body().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        finally graft.ext.StructGate.devLazyGateR11 = false
      hygiene()
      val mn = ts.min
      val spread = math.round((ts.max - mn) / mn * 1000.0) / 1000.0
      f"""\"$name\":{\"min\":$mn%.3f,\"spread\":$spread,\"passes\":[${ts.map(t => f"$t%.3f").mkString(",")}]}"""
    }
    def prodOnly(): org.apache.spark.sql.DataFrame = {
      val docs = docsSub
      val existing = docs.filter(col("doc_id") % 20 === 0)
      val incoming = docs.filter(col("doc_id") % 20 =!= 0)
      graft.ext.IngestOps.appendDedupNearDup(existing, incoming, 0.9)
    }
    val p = arm("prod_only", leak = false, prodOnly _)
    val a = arm("r11_leak", leak = true, rowR12 _)
    val b = arm("r13_registered", leak = false, rowR12 _)
    val c = arm("r13_signed_reuse", leak = false, rowR13 _)
    println(s"""{"metric":"gate_ab","sf":"$sfDir","cpus":$cpus,$p,$a,$b,$c}""")
    spark.stop()
  }
}
