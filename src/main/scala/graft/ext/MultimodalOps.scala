package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal-column plumbing (charter, SURVEY §0(c)): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature-extract as partition-local batch
  * functions.
  *
  * The SPARK side is real: schema convention, partition-preserving
  * `mapPartitions` execution (the Scala analog of `mapInPandas` — one
  * iterator per partition, so a real decoder amortizes model/codec init
  * across the batch), deterministic output schema. The DECODE itself is
  * a clearly-marked STUB (`fakeDecodeFeatures`): this container has no
  * image/audio codecs, so it computes a byte-histogram feature vector —
  * swap `decodeBatch` for a real codec call (JNI/ONNX/javacv) without
  * touching any of the plumbing.
  *
  * Scale notes: binary payloads ride the scan (parquet keeps them
  * column-pruned away unless selected); feature extraction is map-only
  * (no shuffle); metadata predicates (format/width filters) push down
  * ahead of the expensive decode because they live in plain columns, not
  * inside the blob.
  */
object MultimodalOps {

  /** Typed metadata carried next to every media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Build a multimodal table from the `documents` fixture: the text
    * bytes stand in for an encoded media payload (deterministic), with
    * metadata derived from doc_id. Real pipelines would read
    * (path, blob, meta) from parquet/object storage directly.
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        ((col("doc_id") % 8 + 1) * 64).cast("int").as("width"),
        ((col("doc_id") % 6 + 1) * 64).cast("int").as("height"),
        (col("doc_id") % 5000).cast("int").as("duration_ms")).as("media_meta"))

  private val FeatureBins = 16

  /** STUB decoder — byte-value histogram, normalized to sum 1. A real
    * implementation replaces ONLY this function with a codec call
    * (the ??? of this module); signature and batching stay identical.
    */
  private def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val h = new Array[Double](FeatureBins)
    if (payload != null && payload.nonEmpty) {
      payload.foreach { b => h((b & 0xFF) / (256 / FeatureBins)) += 1.0 }
      var i = 0
      while (i < FeatureBins) { h(i) /= payload.length; i += 1 }
    }
    h
  }

  /** Decode + feature-extract: partition-local batch execution. Output
    * schema: input columns minus the blob, plus `features
    * array<double>[16]` and `media_bytes bigint`. The blob is dropped
    * on output so downstream stages don't shuffle payload bytes.
    */
  def decodeFeatures(media: DataFrame, mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("features", ArrayType(DoubleType, containsNull = false)),
        StructField("media_bytes", LongType)))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      // per-partition init happens HERE (codec/model load in a real impl)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        val feats = fakeDecodeFeatures(payload)
        val kept = keepIdx.map(r.get)
        Row.fromSeq(kept.toSeq ++ Seq(feats.toSeq,
          if (payload == null) 0L else payload.length.toLong))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** STUB frame sampler: n evenly-spaced byte-slices stand in for video
    * frames (real impl: container demux + frame decode). Demonstrates
    * blob → array<binary> expansion without leaving the executor.
    */
  def sampleFrames(media: DataFrame, n: Int, mediaCol: String = "media"): DataFrame =
    media.withColumn("frames",
      expr(s"transform(sequence(0, ${n - 1}), i -> " +
        s"substring($mediaCol, cast(length($mediaCol) * i / $n as int) + 1, 64))"))

  /** STUB resize: partition-local payload resample to `targetW`×`targetH`.
    * The decimation stride comes from the METADATA dims (area ratio,
    * floor-div, min 1) — the typed-metadata-drives-the-decode pattern a
    * real resampler uses — and the output metadata carries the new dims
    * while format/duration ride through. The byte decimation is the
    * declared stub (swap for a codec resample); the plumbing — metadata
    * read/update, partition-local batch execution, schema preservation —
    * is real and oracle-gated.
    */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int,
                 mediaCol: String = "media", metaCol: String = "media_meta"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val metaIdx = inSchema.fieldIndex(metaCol)
    media.mapPartitions { rows =>
      // per-partition init happens HERE (resampler setup in a real impl)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        val meta = r.getAs[Row](metaIdx)   // (format, width, height, duration_ms)
        // no usable dims → a real resampler cannot act: pass the payload
        // through untouched and keep the ORIGINAL metadata (claiming the
        // target dims for an un-resampled payload would lie downstream)
        val hasDims = meta != null && !meta.isNullAt(1) && !meta.isNullAt(2)
        val stride =
          if (hasDims) math.max(1, (meta.getInt(1) / targetW) * (meta.getInt(2) / targetH))
          else 1
        val resized =
          if (payload == null) Array.emptyByteArray
          else payload.indices.by(stride).map(payload).toArray
        val newMeta =
          if (hasDims) Row(meta.get(0), targetW, targetH, meta.get(3))
          else meta
        Row.fromSeq(r.toSeq.updated(mediaIdx, resized).updated(metaIdx, newMeta))
      }
    }(RowEncoder.encoderFor(inSchema))
  }
}
