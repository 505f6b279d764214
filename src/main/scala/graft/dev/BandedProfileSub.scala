package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only SUB-PHASE profiler for the banded near-dup ingest: inlines
  * the body of [[IngestOps.appendDedupNearDupRouted]] with a wall-clock
  * AND Spark-job counter per sub-stage, so the routed phase's ~7 s
  * (BandedProfile, r12) decomposes into named costs. Eager counts are
  * inserted between stages for attribution — totals shift slightly vs
  * the production lazy pipeline; the JOB breakdown is the signal.
  * Not part of any round artifact. Lives in package graft.ext to reach
  * the private[ext] signature helpers.
  */
object BandedProfileSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val nTriggers = args.headOption.map(_.toInt).getOrElse(24)
    val sliceSize = args.drop(1).headOption.map(_.toInt).getOrElse(250)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._

    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobCount.incrementAndGet(); () }
    })

    val wh = java.nio.file.Files.createTempDirectory("graft-bprofsub").toString
    val frag = new graft.runtime.FragmentedTable(spark, wh, "c", "doc_id")
    val sigStore = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigs",
      "doc_id", buckets = 2)
    val bandStore = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigbands",
      "__bk", buckets = 4, routeCol = Some("band_key"))

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect().take(nTriggers * sliceSize)
    val slices = all.grouped(sliceSize).toArray
    println(s"[bpsub] ${all.length} docs, ${slices.length} triggers of $sliceSize")

    val names = Array("exact", "sigfrm", "inpair", "keys", "probe", "verify",
      "fragUp", "sigUp", "bandUp", "cadence")
    val tms = Array.fill(slices.length, names.length)(0.0)
    val jbs = Array.fill(slices.length, names.length)(0)

    val threshold = 0.9; val numHashes = 32; val bands = 8; val shingleK = 1
    val rows = numHashes / bands

    slices.zipWithIndex.foreach { case (slice, t) =>
      var tPrev = System.nanoTime(); var jPrev = jobCount.get()
      def lap(i: Int): Unit = {
        val now = System.nanoTime(); tms(t)(i) = (now - tPrev) / 1e6; tPrev = now
        val j = jobCount.get(); jbs(t)(i) = j - jPrev; jPrev = j
      }
      val incoming = slice.toSeq.toDF("doc_id", "text")
      // === inlined appendDedupNearDupRouted, eagerized per stage ===
      val exact = DedupOps.dedupExact(incoming, "text", "doc_id").persist()
      exact.count(); lap(0)
      val inAll = DedupOps.minHashSigFrame(exact, numHashes, shingleK, "text",
        "doc_id", Nil).persist()
      inAll.count(); lap(1)
      val batch = DedupOps.removeNearDups(exact,
        DedupOps.pairsOfSigFrame(inAll, bands, rows, threshold), "doc_id").persist()
      batch.count(); lap(2)
      val inS = inAll.join(broadcast(batch.select(col("doc_id"))),
        Seq("doc_id"), "left_semi").persist()
      val inBands = DedupOps.lshBands(inS, "sig", bands, rows).persist()
      val keys = inBands.select("band_key").distinct()
        .collect().map(_.getLong(0)).toSeq
      lap(3)
      val noDrops = batch.select(col("doc_id")).limit(0)
      val candOpt = bandStore.readRoutedSuperset(keys) match {
        case None => None
        case Some(exBands) =>
          val cand = exBands
            .select(col("doc_id").as("ex_id"), col("band"), col("band_key"))
            .join(broadcast(inBands.select(col("doc_id").as("in_id"),
              col("band"), col("band_key"))), Seq("band", "band_key"))
            .select("ex_id", "in_id").distinct()
          Some((cand.collect(), cand.schema))
      }
      lap(4)
      val drops = candOpt match {
        case None => noDrops
        case Some((candRows, candSchema)) if candRows.isEmpty => noDrops
        case Some((candRows, candSchema)) =>
          val candLocal = spark.createDataFrame(
            java.util.Arrays.asList(candRows: _*), candSchema)
          val exIds = candRows.map(_.get(0)).distinct.toSeq
          sigStore.readWhere(col("doc_id").isin(exIds: _*)) match {
            case None => noDrops
            case Some(exSigRows) =>
              exSigRows.filter(size(col("toks")) > 0)
                .select(col("doc_id").as("ex_id"), col("toks").as("ex_toks"))
                .join(broadcast(candLocal), Seq("ex_id"))
                .join(broadcast(inS.select(col("doc_id").as("in_id"),
                  col("toks").as("in_toks"))), Seq("in_id"))
                .filter(size(array_intersect(col("ex_toks"), col("in_toks"))).cast("double") /
                  size(array_union(col("ex_toks"), col("in_toks"))) >= threshold)
                .select(col("in_id").as("doc_id"))
          }
      }
      val pinned = batch.join(broadcast(drops), Seq("doc_id"), "left_anti").persist()
      pinned.count()
      lap(5)
      // === sink body (as BandedProfile) ===
      if (!pinned.isEmpty) {
        frag.upsert(pinned.coalesce(1))
        lap(6)
        // mirrors the r12 sink: reuse the probe's signatures (inS)
        // instead of re-tokenizing the survivors
        val signed = inS.join(broadcast(pinned.select(col("doc_id"))),
          Seq("doc_id"), "left_semi").persist()
        val withTombs =
          if (signed.count() == pinned.count()) signed
          else signed.unionByName(pinned.select(col("doc_id"))
            .join(signed.select("doc_id"), Seq("doc_id"), "left_anti")
            .select(col("doc_id"),
              array().cast("array<string>").as("toks"),
              array().cast("array<bigint>").as("sig")))
        sigStore.upsert(withTombs.coalesce(1))
        lap(7)
        bandStore.upsertLight(IngestOps.bandRowsOf(signed, 8, 4).coalesce(1))
        lap(8)
        signed.unpersist(false)
      }
      Seq(exact, inAll, batch, inS, inBands, pinned).foreach(_.unpersist(false))
      if (t % 8 == 7) {
        frag.compactTiered(); frag.compactIfOver(8)
        sigStore.maybeCompact(2)
        bandStore.maybeCompact(2)
        sigStore.maybeRebucket(32L << 20)
        bandStore.maybeRebucket(32L << 20)
      }
      lap(9)
      if (t % 4 == 3 || t == slices.length - 1)
        println(f"[bpsub] t=$t%3d " +
          names.zipWithIndex.map { case (p, i) =>
            f"$p=${tms(t)(i)}%5.0f/${jbs(t)(i)}%2d" }.mkString(" "))
    }
    val warm = (4 until slices.length)
    println("[bpsub] steady-state avg ms/trigger (jobs) by sub-phase:")
    names.zipWithIndex.foreach { case (p, i) =>
      println(f"[bpsub]   $p%8s ${warm.map(tms(_)(i)).sum / warm.size}%8.0f ms  " +
        f"${warm.map(jbs(_)(i)).sum.toDouble / warm.size}%5.1f jobs")
    }
    println(f"[bpsub]   total    ${warm.map(tms(_).sum).sum / warm.size}%8.0f ms  " +
      f"${warm.map(jbs(_).sum).sum.toDouble / warm.size}%5.1f jobs")
    graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
