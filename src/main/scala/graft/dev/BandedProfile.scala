package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only phase profiler for the banded near-dup ingest: replays the
  * EXACT per-trigger body of
  * [[graft.streaming.StreamingOps.corpusIngestNearDupBandedSink]]
  * (routed probe → corpus upsert → sig upsert → band upsert → cadence)
  * with a wall-clock per phase and a Spark-job counter per trigger, so
  * the 12 s/trigger sf1 constant (VERDICT r11 task 5) decomposes into
  * named costs instead of a guess. Not part of any round artifact.
  *
  * `java -cp "target/scala-2.13/classes:/opt/spark/jars/&#42;" -Xmx8g \
  *    graft.dev.BandedProfile [nTriggers] [sliceSize]`
  */
object BandedProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val nTriggers = args.headOption.map(_.toInt).getOrElse(40)
    val sliceSize = args.drop(1).headOption.map(_.toInt).getOrElse(250)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._

    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobCount.incrementAndGet(); () }
    })

    val wh = java.nio.file.Files.createTempDirectory("graft-bprof").toString
    val frag = new graft.runtime.FragmentedTable(spark, wh, "c", "doc_id")
    val sigStore = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigs",
      "doc_id", buckets = 2)
    val bandStore = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigbands",
      "__bk", buckets = 4, routeCol = Some("band_key"))

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect().take(nTriggers * sliceSize)
    val slices = all.grouped(sliceSize).toArray
    println(s"[bprof] ${all.length} docs, ${slices.length} triggers of $sliceSize")

    val phases = Array("routed", "fragUp", "sigUp", "bandUp", "cadence")
    val sums = Array.fill(slices.length, phases.length)(0.0)
    val jobs = Array.fill(slices.length)(0)

    slices.zipWithIndex.foreach { case (slice, t) =>
      val j0 = jobCount.get()
      var tPrev = System.nanoTime()
      def lap(): Double = {
        val now = System.nanoTime(); val d = (now - tPrev) / 1e6; tPrev = now; d
      }
      val batch = slice.toSeq.toDF("doc_id", "text")
      val (pinned, signed) = graft.ext.IngestOps.appendDedupNearDupRoutedSigned(
        keys => bandStore.readRoutedSuperset(keys),
        ids => sigStore.readWhere(col("doc_id").isin(ids: _*)),
        batch, threshold = 0.9)
      sums(t)(0) = lap()
      if (!pinned.isEmpty) {
        frag.upsert(pinned)
        sums(t)(1) = lap()
        val tomb = pinned.select(col("doc_id"))
          .join(signed.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"),
            array().cast("array<string>").as("toks"),
            array().cast("array<bigint>").as("sig"))
        sigStore.upsert(signed.unionByName(tomb))
        sums(t)(2) = lap()
        bandStore.upsert(graft.ext.IngestOps.bandRowsOf(signed, 8, 4))
        sums(t)(3) = lap()
      }
      signed.unpersist(false)
      pinned.unpersist(false)
      if (t % 8 == 7) {
        frag.compactTiered(); frag.compactIfOver(8)
        sigStore.maybeCompact(2)
        bandStore.maybeCompact(2)
        sigStore.maybeRebucket(32L << 20)
        bandStore.maybeRebucket(32L << 20)
      }
      sums(t)(4) = lap()
      jobs(t) = jobCount.get() - j0
      if (t % 8 == 7 || t == slices.length - 1)
        println(f"[bprof] t=$t%3d jobs=${jobs(t)}%3d " +
          phases.zipWithIndex.map { case (p, i) => f"$p=${sums(t)(i)}%6.0f" }.mkString(" ") +
          f" total=${sums(t).sum}%6.0f ms")
    }
    val warm = (4 until slices.length)
    println("[bprof] steady-state avg ms/trigger by phase:")
    phases.zipWithIndex.foreach { case (p, i) =>
      println(f"[bprof]   $p%8s ${warm.map(sums(_)(i)).sum / warm.size}%8.0f")
    }
    println(f"[bprof]   total    ${warm.map(sums(_).sum).sum / warm.size}%8.0f   " +
      f"jobs/trigger ${warm.map(jobs(_)).sum.toDouble / warm.size}%.1f")
    graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(wh))
    spark.stop()
  }
}
