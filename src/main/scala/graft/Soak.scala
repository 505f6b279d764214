package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Sustained-ingest soak for the STATEFUL surfaces at the sf1 tier
  * (VERDICT r9 task 5): hundreds of triggers through
  * [[graft.streaming.StreamingOps.corpusIngestNearDupFragmentedSink]]
  * over the LSM fragment store, recording the curves a steady-state
  * deployment lives on — not just the end state:
  *
  *  - read amplification: live fragment counts (corpus + signature
  *    side-table) and the zone-probe scan fraction of a point read;
  *  - compaction debt: the same counts THROUGH the cadence folds (the
  *    tier policy must keep them bounded, not merely end bounded);
  *  - ingest latency: per-trigger wall clock, whose mild upward drift
  *    is the sink's documented O(corpus) map-side signature scan;
  *  - dedup recall over time: every trigger injects known exact and
  *    near duplicates of earlier docs under fresh ids — the fraction
  *    dropped so far is the live recall of the side-table as it grows;
  *  - deletion honor: periodically tombstoned keys must stay invisible
  *    at every later checkpoint, and the final full fold purges them.
  *
  * Emits one JSON object (default `soak_out.json`, override with
  * argv(0)): a `checkpoints` series plus a `final` block after the
  * full fold. Input: the sf1 synthesis (`dev/make_sf1.py`, default
  * /tmp/sf1) or any dir with a `documents.parquet`.
  */
object Soak {

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("soak_out.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val nTriggers = sys.env.getOrElse("SPARK_GRAFT_SOAK_TRIGGERS", "200").toInt
    val checkpointEvery = sys.env.getOrElse("SPARK_GRAFT_SOAK_CHECKPOINT", "10").toInt
    val deleteEvery = 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val warehouse = Files.createTempDirectory("graft-soak").toString
    val frag = new graft.runtime.FragmentedTable(spark, warehouse, "corpus", "doc_id")
    val sigs = new graft.runtime.FragmentedTable(spark, warehouse, "corpus__sigs", "doc_id")

    // the full doc stream, driver-sliced into deterministic triggers
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val sliceSize = math.max(1, math.ceil(all.length.toDouble / nTriggers).toInt)
    val slices = all.grouped(sliceSize).toArray
    println(s"[soak] ${all.length} docs, ${slices.length} triggers of ~$sliceSize, " +
      s"checkpoint every $checkpointEvery, deletions every $deleteEvery")

    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.corpusIngestNearDupFragmentedSink(
      in.toDF().toDF("doc_id", "text"), frag, sigs,
      threshold = 0.9, compactEvery = 8L).start()

    // injected-duplicate bookkeeping (driver-side, bounded: 10/trigger)
    val ExactBase = 100000000L
    val NearBase = 200000000L
    var exactInjected = 0L
    // (copyId, sourceId) of injected near-dups: a copy is only
    // GUARANTEED droppable while its source (or an exact twin) is live
    // in the corpus — a copy of an already-dropped source is one
    // similarity hop removed from the retained witness and may fall
    // below the threshold legitimately, so recall is measured over the
    // source-live subset
    val nearPairs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val deletedIds = scala.collection.mutable.LinkedHashSet[Long]()
    var deletedRequested = 0L

    final case class Cp(t: Int, corpusRows: Long, corpusFrags: Int, sigFrags: Int,
                        diskMb: Double, pointScan: Int, pointTotal: Int,
                        ingestMsAvg: Double,
                        exactInj: Long, exactDropped: Long,
                        nearInj: Long, nearDropped: Long,
                        delRequested: Long, delVisible: Long)
    val cps = scala.collection.mutable.ArrayBuffer[Cp]()
    var windowMs = 0.0
    var windowN = 0

    def dirMb(): Double = {
      var b = 0L
      val w = Files.walk(Paths.get(warehouse))
      try w.forEach(p => if (Files.isRegularFile(p)) b += Files.size(p))
      finally w.close()
      math.round(b / 1048.576) / 1000.0
    }

    def checkpoint(t: Int): Unit = {
      val corpus = frag.read().get.cache()
      val rows = corpus.count()
      val exactDropped = exactInjected -
        corpus.filter(col("doc_id") >= ExactBase && col("doc_id") < NearBase).count()
      val (nearEligible, nearDropped) = if (nearPairs.isEmpty) (0L, 0L) else {
        val srcIds = nearPairs.map(_._2).distinct
        val liveSrc = corpus.filter(col("doc_id").isInCollection(srcIds))
          .select("doc_id").as[Long].collect().toSet
        val liveCopies = corpus.filter(col("doc_id") >= NearBase)
          .select("doc_id").as[Long].collect().toSet
        val eligible = nearPairs.filter(p => liveSrc(p._2))
        (eligible.length.toLong, eligible.count(p => !liveCopies(p._1)).toLong)
      }
      val delVisible =
        if (deletedIds.isEmpty) 0L
        else corpus.filter(col("doc_id").isInCollection(deletedIds)).count()
      corpus.unpersist()
      val probeId = slices(0).head._1
      val (_, rep) = frag.readWhereReport(col("doc_id") === probeId)
      cps += Cp(t, rows, frag.fragmentCount(), sigs.fragmentCount(), dirMb(),
        rep.scanned, rep.total,
        if (windowN == 0) 0 else math.round(windowMs / windowN * 10) / 10.0,
        exactInjected, exactDropped,
        nearEligible, nearDropped,
        deletedRequested, delVisible)
      windowMs = 0.0; windowN = 0
      println(s"[soak] ${cps.last}")
    }

    slices.zipWithIndex.foreach { case (slice, t) =>
      // inject duplicates of the PREVIOUS trigger's docs under new ids:
      // 5 exact copies and 5 one-extra-token near copies (a true
      // near-dup at 0.9 only when the doc has >= 9 distinct tokens —
      // only those count toward the recall denominator)
      val injected: Seq[(Long, String)] = if (t == 0) Nil else {
        val prev = slices(t - 1)
        val exact = prev.take(5).map { case (id, tx) => (ExactBase + id, tx) }
        val near = prev.slice(5, 10).flatMap { case (id, tx) =>
          val n = tx.trim.split("\\s+").distinct.length
          if (n >= 9) { nearPairs += ((NearBase + id, id)); Some((NearBase + id, tx + s" xqzsoak$id")) }
          else None
        }
        exactInjected += exact.length
        (exact ++ near).toSeq
      }
      val t0 = System.nanoTime()
      in.addData(slice.toSeq ++ injected)
      q.processAllAvailable()
      windowMs += (System.nanoTime() - t0) / 1e6
      windowN += 1
      // the forget cycle: tombstone 100 keys from an older range in
      // BOTH tables (corpus first, so the sink's repair step cannot
      // re-sign them in between)
      if (t > 0 && t % deleteEvery == 0) {
        val victims = slices(t - deleteEvery).take(100).map(_._1)
        val vdf = victims.toSeq.toDF("doc_id")
        frag.deleteKeys(vdf)
        sigs.deleteKeys(vdf)
        deletedIds ++= victims
        deletedRequested += victims.length
      }
      if ((t + 1) % checkpointEvery == 0 || t == slices.length - 1) checkpoint(t)
    }
    q.stop()

    // end state: the explicit O(corpus) full fold purges tombstones and
    // collapses each table to one fragment; deleted keys stay gone
    frag.compact(); sigs.compact()
    val finalRows = frag.read().get.count()
    val finalDelVisible =
      if (deletedIds.isEmpty) 0L
      else frag.read().get.filter(col("doc_id").isInCollection(deletedIds)).count()

    def j(cp: Cp): String =
      s"""{"t":${cp.t},"corpus_rows":${cp.corpusRows},"corpus_frags":${cp.corpusFrags},""" +
      s""""sig_frags":${cp.sigFrags},"disk_mb":${cp.diskMb},""" +
      s""""point_scan":${cp.pointScan},"point_total":${cp.pointTotal},""" +
      s""""ingest_ms_avg":${cp.ingestMsAvg},""" +
      s""""exact_injected":${cp.exactInj},"exact_dropped":${cp.exactDropped},""" +
      s""""near_injected":${cp.nearInj},"near_dropped":${cp.nearDropped},""" +
      s""""deleted_requested":${cp.delRequested},"deleted_visible":${cp.delVisible}}"""
    val json =
      s"""{"soak":"near_dup_ingest_sf1","sf_dir":"$sfDir","triggers":${slices.length},""" +
      s""""slice_size":$sliceSize,"compact_every":8,"delete_every":$deleteEvery,""" +
      s""""checkpoints":[${cps.map(j).mkString(",")}],""" +
      s""""final":{"corpus_rows":$finalRows,"corpus_frags":${frag.fragmentCount()},""" +
      s""""sig_frags":${sigs.fragmentCount()},"disk_mb":${dirMb()},""" +
      s""""deleted_visible":$finalDelVisible}}"""
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    println(json)
    graft.runtime.Fs.deleteRecursive(Paths.get(warehouse))
    spark.stop()
  }
}
