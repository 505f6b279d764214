package graft.ext

import graft.SparkSpec
import graft.runtime.Sources
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the decode is a stub, so these tests pin the
  * REAL parts — schema contract, batching/partition behavior,
  * determinism — which survive a real-codec swap unchanged.
  */
class MultimodalSpec extends SparkSpec {

  private def media = MultimodalOps.withFakeMedia(
    Sources(spark, "/root/testdata/sf0.001").documents)

  test("media table schema: binary payload + typed metadata struct") {
    val sch = media.schema
    assert(sch("media").dataType.typeName == "binary")
    val meta = sch("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fields.map(f => (f.name, f.dataType)).toSeq ==
      MultimodalOps.mediaMetaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("decodeFeatures drops the blob, keeps partitioning, emits fixed-width features") {
    val in = media.repartition(3)
    val out = MultimodalOps.decodeFeatures(in)
    assert(out.rdd.getNumPartitions == 3, "mapPartitions must not reshuffle")
    assert(!out.columns.contains("media"), "payload must not flow downstream")
    val row = out.select(size(col("features")).as("n"),
        aggregate(col("features"), lit(0.0), (a, v) => a + v).as("sum"),
        col("media_bytes"))
      .filter(col("media_bytes") > 0).head()
    assert(row.getAs[Int]("n") == 16)
    assert(math.abs(row.getAs[Double]("sum") - 1.0) < 1e-9, "histogram normalized")
  }

  test("decodeFeatures is deterministic across runs") {
    val a = MultimodalOps.decodeFeatures(media)
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = MultimodalOps.decodeFeatures(media)
      .select("doc_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("sampleFrames yields n byte-slices per row") {
    val out = MultimodalOps.sampleFrames(media, 4)
    val r = out.select(size(col("frames")).as("n")).head()
    assert(r.getAs[Int]("n") == 4)
  }
}
