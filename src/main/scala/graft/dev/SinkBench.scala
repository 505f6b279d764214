package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Dev-only A/B timing of the un-banded vs banded near-dup ingest sinks
  * over identical trigger sequences — the per-trigger overhead and
  * slope comparison that sizes the soak's flat-ingest gate. Not part of
  * any round artifact; run by hand:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.dev.SinkBench [nTriggers]"`.
  */
object SinkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nTriggers = args.headOption.map(_.toInt).getOrElse(30)
    val which = sys.env.getOrElse("SPARK_GRAFT_SINK", "both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.runtime.Sources.bootstrap(spark)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).orderBy("doc_id")
      .as[(Long, String)].collect()
    val sliceSize = math.max(1, math.ceil(all.length.toDouble / nTriggers).toInt)
    val slices = all.grouped(sliceSize).toArray
    println(s"[sinkbench] ${all.length} docs, ${slices.length} triggers of ~$sliceSize")

    def run(name: String)(mk: (String, MemoryStream[(Long, String)]) =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
      val wh = Files.createTempDirectory(s"graft-sb-$name").toString
      val in = MemoryStream[(Long, String)]
      val q = mk(wh, in).start()
      val times = slices.map { slice =>
        val t0 = System.nanoTime()
        in.addData(slice.toSeq)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }
      q.stop()
      val head = times.slice(1, 4).sum / 3.0
      val tail = times.takeRight(3).sum / 3.0
      println(f"[sinkbench] $name: total ${times.sum / 1000}%.1f s, " +
        f"early $head%.0f ms, late $tail%.0f ms, slope ${tail / head}%.2f")
      println(s"[sinkbench] $name per-trigger ms: " +
        times.map(t => math.round(t)).mkString(","))
      graft.runtime.Fs.deleteRecursive(java.nio.file.Paths.get(wh))
    }

    if (which == "both" || which == "old") run("unbanded") { (wh, in) =>
      val frag = new graft.runtime.FragmentedTable(spark, wh, "c", "doc_id")
      val sigs = new graft.runtime.FragmentedTable(spark, wh, "c__sigs", "doc_id")
      graft.streaming.StreamingOps.corpusIngestNearDupFragmentedSink(
        in.toDF().toDF("doc_id", "text"), frag, sigs, threshold = 0.9,
        compactEvery = 8L)
    }
    if (which == "both" || which == "new") run("banded") { (wh, in) =>
      val frag = new graft.runtime.FragmentedTable(spark, wh, "c", "doc_id")
      val sigs = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigs",
        "doc_id", buckets = 2)
      val bandS = graft.runtime.BucketedFragmentStore(spark, wh, "c__sigbands",
        "__bk", buckets = 4, routeCol = Some("band_key"))
      graft.streaming.StreamingOps.corpusIngestNearDupBandedSink(
        in.toDF().toDF("doc_id", "text"), frag, sigs, bandS, threshold = 0.9,
        compactEvery = 8L)
    }
    spark.stop()
  }
}
