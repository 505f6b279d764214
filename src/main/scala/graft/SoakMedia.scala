package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Shared machinery for the MEDIA ingest soak + crash scenarios
  * (VERDICT r14 tasks 1 and 4): deterministic per-trigger media
  * generation from doc ids (every byte re-derivable from the id, so a
  * killed-and-respawned child and the clean reference run feed
  * IDENTICAL triggers without persisting blobs), the injection /
  * forget schedules, and the journaled trigger runner the crash
  * harness drives.
  *
  * Generation is LAZY per trigger — a respawned child materializes
  * only the slices it actually replays (an upfront all-slices encode
  * would cost more than the kill delay and starve the crash loop).
  */
private[graft] object SoakMedia {

  // id namespaces for injected rows (sf1 doc ids stay far below 1e8)
  val NearBase = 200000000L  // BMP re-encode of a live doc → must DROP
  val JunkBase = 300000000L  // unknown magic → reject known_container
  val NullBase = 400000000L  // NULL payload → reject media_present
  val CutBase = 500000000L   // truncated WAV → reject media_decodes
  val DeleteEvery = 25

  def loadIdSlices(spark: SparkSession, sfDir: String,
                   nTriggers: Int, sliceSize: Int): Array[Array[Long]] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).orderBy("doc_id")
      .as[Long].collect().take(nTriggers * sliceSize)
      .grouped(sliceSize).toArray
  }

  /** (doc_id, media) pairs: decorrelated block images of `ids` in
    * `fmt`, generated on executors, collected for the MemoryStream.
    */
  def pics(spark: SparkSession, ids: Seq[Long],
           fmt: String): Seq[(Long, Array[Byte])] = {
    import spark.implicits._
    if (ids.isEmpty) Nil
    else graft.ext.MultimodalOps.withGeneratedBlockImages(
        ids.toDF("doc_id"), fmt)
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toSeq
  }

  def junkOf(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
    ids.map(id => (id, "XX".getBytes("UTF-8") ++
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))))

  def cutWavOf(spark: SparkSession, ids: Seq[Long]): Seq[(Long, Array[Byte])] = {
    import spark.implicits._
    if (ids.isEmpty) Nil
    else graft.ext.MultimodalOps.withGeneratedAudioVariants(
        ids.toDF("doc_id"), "wav")
      .select(col("doc_id"), expr("substring(media, 1, 16)").as("media"))
      .as[(Long, Array[Byte])].collect().toSeq
  }

  /** Injections for trigger t, derived from slice t−1: 3 BMP
    * re-encodes (near-dups the banded probe must drop), 2 junk, 1
    * NULL, 2 truncated WAVs (the three quarantine classes).
    */
  def injectionsFor(spark: SparkSession, t: Int,
                    slices: Array[Array[Long]]): Seq[(Long, Array[Byte])] =
    if (t == 0) Nil
    else {
      val prev = slices(t - 1)
      // the BMP must re-encode the SOURCE doc's picture (pixels derive
      // from the id), so generate from the source ids and re-tag
      pics(spark, prev.take(3), "bmp")
        .map { case (src, m) => (NearBase + src, m) } ++
        junkOf(prev.slice(3, 5).map(JunkBase + _)) ++
        prev.slice(5, 6).map(id =>
          (NullBase + id, null.asInstanceOf[Array[Byte]])) ++
        cutWavOf(spark, prev.slice(6, 8).map(CutBase + _))
    }

  /** (injectedId, sourceId) pairs of the BMP re-encodes at trigger t. */
  def nearPairsFor(t: Int, slices: Array[Array[Long]]): Seq[(Long, Long)] =
    if (t == 0) Nil
    else slices(t - 1).take(3).map(id => (NearBase + id, id)).toSeq

  def victimsFor(t: Int, slices: Array[Array[Long]]): Seq[Long] =
    if (t > 0 && t % DeleteEvery == 0)
      slices(t - DeleteEvery).take(100).toSeq
    else Nil

  final case class MediaStores(frag: graft.runtime.FragmentedTable,
                               rej: graft.runtime.FragmentedTable,
                               bands: graft.runtime.BucketedFragmentStore)

  def openStores(spark: SparkSession, wh: String): MediaStores =
    MediaStores(
      new graft.runtime.FragmentedTable(spark, wh, "mcorpus", "doc_id"),
      new graft.runtime.FragmentedTable(spark, wh, "mcorpus__rejects", "doc_id"),
      graft.runtime.BucketedFragmentStore(spark, wh, "mcorpus__bands", "__bk",
        buckets = 4, routeCol = Some("band_key")))

  /** Run triggers [from, until) through a fresh media sink over the
    * given warehouse, journaling progress + forget intents when a
    * journal path is supplied (the crash harness's T/FI/FD protocol;
    * un-DONE forget intents re-issue FIRST on resume — the
    * caller-must-retry contract of [[graft.streaming.StreamingOps.sigBandForget]]).
    */
  def runTriggers(spark: SparkSession, wh: String,
                  slices: Array[Array[Long]], from: Int, until: Int,
                  journal: Option[java.nio.file.Path]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val st = openStores(spark, wh)
    def logLine(s: String): Unit = journal.foreach { p =>
      Files.write(p, (s + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.DSYNC)
    }
    journal.filter(Files.exists(_)).foreach { p =>
      val lines = Files.readAllLines(p).asScala
      def nums(prefix: String): Seq[Int] = lines.collect {
        case l if l.startsWith(prefix) =>
          scala.util.Try(l.drop(prefix.length).trim.toInt).toOption
      }.flatten.toSeq
      val done = nums("FD ").toSet
      nums("FI ").distinct.filterNot(done).foreach { t =>
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victimsFor(t, slices).toDF("doc_id"))
        logLine(s"FD $t")
      }
    }
    val in = MemoryStream[(Long, Array[Byte])]
    val q = graft.streaming.StreamingOps.corpusIngestMediaSink(
      in.toDF().toDF("doc_id", "media"), st.frag, st.rej, st.bands,
      maxDist = 6, compactEvery = 8L).start()
    (from until until).foreach { t =>
      in.addData(pics(spark, slices(t).toSeq, "png") ++
        injectionsFor(spark, t, slices))
      q.processAllAvailable()
      val victims = victimsFor(t, slices)
      if (victims.nonEmpty) {
        logLine(s"FI $t")
        graft.streaming.StreamingOps.sigBandForget(st.frag, st.bands,
          victims.toDF("doc_id"))
        logLine(s"FD $t")
      }
      logLine(s"T $t")
    }
    q.stop()
  }
}
