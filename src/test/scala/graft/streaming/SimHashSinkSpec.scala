package graft.streaming

import graft.SparkSpec
import graft.runtime.{BucketedFragmentStore, FragmentedTable}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The cheap-rung text sink (VERDICT r14 task 5, sink form):
  * SimHash-routed dedup against a persisted band store, 8 bytes of
  * dedup state per corpus doc. Gates: whitespace re-serializations
  * drop across triggers, novel text keeps, replay idempotent,
  * crash-gap repair re-bands from the stored sig column (no
  * re-tokenize), forget honored on re-ingest, route guard.
  */
class SimHashSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-shsink").toString

  private def stores(dir: String) = (
    new FragmentedTable(spark, dir, "tcorpus", "doc_id"),
    BucketedFragmentStore(spark, dir, "tcorpus__bands", "__bk",
      buckets = 4, routeCol = Some("band_key")))

  private def ids(f: FragmentedTable): Set[Long] = f.read()
    .map(_.select("doc_id").as[Long].collect().toSet).getOrElse(Set.empty)

  // md5-token synthetic text: decorrelated token sets never land within
  // the hamming radius of each other (the registry row's construction)
  private def novel(id: Long): String =
    (0 to 7).map(i => java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id#$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .mkString(" ")

  test("simhash sink: whitespace twins drop, novel keeps, replay idempotent, sig rides") {
    implicit val sqlCtx = spark.sqlContext
    val (frag, bands) = stores(freshDir())
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.corpusIngestSimHashBandedSink(
      in.toDF().toDF("doc_id", "text"), frag, bands,
      maxDist = 3, compactEvery = 2L).start()
    try {
      in.addData((10L, novel(10L)), (20L, novel(20L)))
      q.processAllAvailable()
      assert(ids(frag) == Set(10L, 20L))
      // trigger 1: a whitespace re-serialization of doc 10 (token-set
      // identical → hamming 0 → dropped) + one genuinely new doc
      in.addData((110L, novel(10L).replace(" ", "   ") + " "), (30L, novel(30L)))
      q.processAllAvailable()
      assert(ids(frag) == Set(10L, 20L, 30L), ids(frag).toString)
      // the corpus carries the 8-byte dedup state
      assert(frag.read().get.filter(col("sig").isNull).count() == 0L)
      // replay: every row is a hamming-0 dup of its own previous append
      in.addData((30L, novel(30L)))
      q.processAllAvailable()
      assert(ids(frag) == Set(10L, 20L, 30L))
    } finally q.stop()
  }

  test("crash-gap repair + forget honored on re-ingest") {
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val (frag, bands) = stores(dir)
    // crash window: corpus committed (with sigs), band rows lost
    frag.upsert(graft.ext.DedupOps.simHash(
        Seq((10L, novel(10L)), (20L, novel(20L))).toDF("doc_id", "text"))
      .join(Seq((10L, novel(10L)), (20L, novel(20L))).toDF("doc_id", "text"),
        Seq("doc_id")))
    assert(bands.read().isEmpty)
    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.corpusIngestSimHashBandedSink(
      in.toDF().toDF("doc_id", "text"), frag, bands, maxDist = 3).start()
    try {
      // construction repair re-banded both docs from the stored sigs
      assert(bands.read().get.select("doc_id").distinct()
        .as[Long].collect().toSet == Set(10L, 20L))
      // so doc 10's re-serialization dedups instead of re-entering
      in.addData((110L, novel(10L) + "  "))
      q.processAllAvailable()
      assert(ids(frag) == Set(10L, 20L), ids(frag).toString)
      // forget doc 10, then its twin re-ingests as NEW — deletion honored
      StreamingOps.sigBandForget(frag, bands, Seq(10L).toDF("doc_id"))
      assert(ids(frag) == Set(20L))
      in.addData((111L, novel(10L) + " "))
      q.processAllAvailable()
      assert(ids(frag) == Set(20L, 111L), ids(frag).toString)
    } finally q.stop()
  }

  test("simhash sink refuses a band store not routed by band_key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "tcorpus", "doc_id")
    val wrong = BucketedFragmentStore(spark, dir, "tcorpus__bands", "__bk",
      buckets = 4)
    val in = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      StreamingOps.corpusIngestSimHashBandedSink(
        in.toDF().toDF("doc_id", "text"), frag, wrong)
    }
    assert(e.getMessage.contains("band_key"))
  }
}
