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

  test("resizeStub: schema preserved, metadata dims updated, payload shrunk by the stride") {
    val in = media.repartition(3)
    val out = MultimodalOps.resizeStub(in, 64, 64)
    assert(out.schema == in.schema, "resize must preserve the multimodal schema")
    assert(out.rdd.getNumPartitions == 3, "mapPartitions must not reshuffle")
    val r = out.select(
        col("doc_id"),
        col("media_meta.width").as("w"), col("media_meta.height").as("h"),
        col("media_meta.format").as("fmt"),
        length(col("media")).as("nb")).head()
    assert(r.getAs[Int]("w") == 64 && r.getAs[Int]("h") == 64)
    val docId = r.getAs[Long]("doc_id")
    // original fixture dims: ((doc_id%8)+1)*64 × ((doc_id%6)+1)*64 → stride
    val k = ((docId % 8) + 1) * ((docId % 6) + 1)
    val origBytes = media.filter(col("doc_id") === docId)
      .select(length(col("media"))).head().getInt(0)
    assert(r.getAs[Int]("nb") == (origBytes + k - 1) / k, s"stride-$k decimation")
    // format rides through untouched
    assert(Seq("jpeg", "png", "wav").contains(r.getAs[String]("fmt")))
  }
}
