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

  // deterministic test PNG: w×h with pixel (x,y) = f(docId, x, y)
  private def makePng(docId: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (docId * 31 + y * w + x) * 0x9E3779B9)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def pngMedia = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until 6).map { i =>
      val (w, h) = (8 + i, 6 + i)
      // doc 5 carries CORRUPT bytes — not an image
      val blob = if (i == 5) Array[Byte](1, 2, 3, 4) else makePng(i, w, h)
      Row(i.toLong, blob, Row("png", w, h, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media", BinaryType),
        StructField("media_meta", MultimodalOps.mediaMetaType))))
  }

  test("decodeImage: real PNG decode yields true dims + luminance histogram; corrupt rows kept with NULLs") {
    val out = MultimodalOps.decodeImage(pngMedia)
    assert(out.rdd.getNumPartitions == 2, "mapPartitions must not reshuffle")
    assert(!out.columns.contains("media"))
    val rows = out.select("doc_id", "decoded_width", "decoded_height", "features")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    (0 until 5).foreach { i =>
      val (w, h, f) = rows(i.toLong)
      // dims come from the DECODED pixels and match what was encoded
      assert(w.contains(8 + i) && h.contains(6 + i), s"doc $i: $w x $h")
      val hist = f.get.asInstanceOf[scala.collection.Seq[Double]]
      assert(hist.length == 16 && math.abs(hist.sum - 1.0) < 1e-9)
    }
    val (cw, ch, cf) = rows(5L)
    assert(cw.isEmpty && ch.isEmpty && cf.isEmpty, "corrupt blob must yield NULLs, not vanish")
  }

  test("resizeImage: decodable payloads resample to target dims, corrupt ones ride through") {
    val out = MultimodalOps.resizeImage(pngMedia, 4, 4)
    assert(out.schema == pngMedia.schema)
    val rows = out.select("doc_id", "media", "media_meta.width", "media_meta.height")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))).toMap
    (0 until 5).foreach { i =>
      val (blob, w, h) = rows(i.toLong)
      assert(w == 4 && h == 4, s"doc $i metadata dims: $w x $h")
      // the payload really IS a 4×4 image now — decode it back
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img.getWidth == 4 && img.getHeight == 4, s"doc $i payload dims")
    }
    // corrupt payload: untouched bytes, ORIGINAL metadata (honesty rule)
    val (cb, cw, ch) = rows(5L)
    assert(cb.toSeq == Seq[Byte](1, 2, 3, 4) && cw == 13 && ch == 11)
  }

  test("resizeBilinear: target dims, decodable output, deterministic; corrupt → None") {
    // the gate the method's doc promises: no analytic oracle (sample
    // placement is the JDK's), so dims + decodability + determinism
    val png = makePng(1, 8, 6)
    val out = ImageIoCodec.resizeBilinear(png, 4, 3)
    assert(out.isDefined, "valid PNG must resize")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.get))
    assert(img.getWidth == 4 && img.getHeight == 3, s"${img.getWidth}x${img.getHeight}")
    assert(out.get.toSeq == ImageIoCodec.resizeBilinear(png, 4, 3).get.toSeq,
      "bilinear resample must be deterministic")
    assert(ImageIoCodec.resizeBilinear(Array[Byte](1, 2, 3), 4, 3).isEmpty,
      "corrupt payload must yield None, not throw")
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

  test("codec breadth: BMP/GIF decode bit-exactly, JPEG dims-exact with bounded luma drift, truncated JPEG falls back") {
    import spark.implicits._
    val docs = Seq(3L, 5L, 42L).toDF("doc_id")
    def gp(d: Long, i: Int): Long = ((d * 31 + i) * 0x9E3779B9L) & 0xFFFFFFL
    def expectedDims(d: Long): (Int, Int) =
      (((d % 8 + 1) * 8).toInt, ((d % 6 + 1) * 8).toInt)
    def rgbLuma(p: Long): Int =
      ((299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)) / 1000).toInt
    // BMP: lossless RGB — histogram matches the generator analytically
    // GIF: indexed gray — luminance is exactly the generator's low byte
    for ((fmt, lumaOf) <- Seq(
        ("bmp", (p: Long) => rgbLuma(p)),
        ("gif", (p: Long) => (p & 0xFF).toInt))) {
      val rows = MultimodalOps.decodeImage(
        MultimodalOps.withGeneratedImages(docs, fmt)).collect()
      assert(rows.length == 3)
      rows.foreach { r =>
        val d = r.getAs[Long]("doc_id")
        val (w, h) = expectedDims(d)
        assert(r.getAs[Int]("decoded_width") == w &&
          r.getAs[Int]("decoded_height") == h, s"$fmt dims for $d")
        val want = new Array[Double](16)
        (0 until w * h).foreach(i => want(lumaOf(gp(d, i)) / 16) += 1.0 / (w * h))
        val got = r.getSeq[Double](r.fieldIndex("features"))
        assert(want.zip(got).forall { case (a, b) => math.abs(a - b) < 1e-12 },
          s"$fmt must round-trip bit-exactly for doc $d")
      }
    }
    // JPEG: dims exact; pixels lossy but mean luminance stays close
    val jrows = MultimodalOps.decodeImage(
      MultimodalOps.withGeneratedImages(docs, "jpeg")).collect()
    jrows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val (w, h) = expectedDims(d)
      assert(r.getAs[Int]("decoded_width") == w && r.getAs[Int]("decoded_height") == h)
      val got = r.getSeq[Double](r.fieldIndex("features"))
      assert(math.abs(got.sum - 1.0) < 1e-9, "histogram mass")
      val gotMean = got.zipWithIndex.map { case (m, b) => m * (b * 16 + 8) }.sum
      val srcMean = (0 until w * h).map(i => rgbLuma(gp(d, i))).sum.toDouble / (w * h)
      assert(math.abs(gotMean - srcMean) < 24.0,
        s"jpeg mean luma drifted: $gotMean vs $srcMean")
    }
    // truncated JPEG: decode → NULLs (kept); decodeFeatures → byte fallback
    val jpegBytes = MultimodalOps.withGeneratedImages(Seq(42L).toDF("doc_id"), "jpeg")
      .select("media").head().getAs[Array[Byte]](0)
    val cut = jpegBytes.take(jpegBytes.length * 3 / 5)
    val corrupt = Seq((42L, cut, ("jpeg", 40, 40, null.asInstanceOf[Integer])))
      .toDF("doc_id", "media", "media_meta")
    val dec = MultimodalOps.decodeImage(corrupt).head()
    assert(dec.isNullAt(dec.fieldIndex("decoded_width")) &&
      dec.isNullAt(dec.fieldIndex("features")),
      "truncated JPEG must map to NULLs, not throw and not fake pixels")
    val feat = MultimodalOps.decodeFeatures(corrupt).head()
    val fb = feat.getSeq[Double](feat.fieldIndex("features"))
    assert(math.abs(fb.sum - 1.0) < 1e-9,
      "truncated JPEG must featurize via the byte-histogram fallback")
  }

  test("audio codec: WAV round-trip recovers exact sample stats; corrupt/unsupported payloads → NULLs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(0L, 3L, 7L, 13L).toDF("doc_id")
    val rows = MultimodalOps.decodeAudio(MultimodalOps.withGeneratedWav(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 4)
    rows.foreach { case (id, r) =>
      val n = ((id % 4) + 1) * 800
      val amp = ((id % 5) + 1) * 4000
      assert(r.getAs[Int]("sample_rate") == 8000 && r.getAs[Int]("channels") == 1)
      assert(r.getAs[Long]("n_samples") == n, s"doc $id sample count")
      assert(r.getAs[Double]("duration_ms") == n / 8.0, s"doc $id duration")
      // square wave: every sample ±amp, so the stats are EXACT equalities
      assert(r.getAs[Double]("rms") == amp.toDouble, s"doc $id rms")
      assert(r.getAs[Int]("peak") == amp && r.getAs[Double]("mean") == 0.0)
    }
    // stereo + big-endian WAV through the same seam: real AudioSystem
    // write of 2-channel PCM; duration counts FRAMES, not samples
    val stereoPcm = new Array[Byte](400 * 2 * 2)
    (0 until 400).foreach { f =>
      val l = 1000; val rgt = -2000
      stereoPcm(4 * f) = (l & 0xFF).toByte; stereoPcm(4 * f + 1) = ((l >> 8) & 0xFF).toByte
      stereoPcm(4 * f + 2) = (rgt & 0xFF).toByte; stereoPcm(4 * f + 3) = ((rgt >> 8) & 0xFF).toByte
    }
    val sf = new javax.sound.sampled.AudioFormat(4000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(stereoPcm), sf, 400L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val sRow = MultimodalOps.decodeAudio(
      Seq((1L, bos.toByteArray)).toDF("doc_id", "media")).head()
    assert(sRow.getAs[Int]("channels") == 2 && sRow.getAs[Long]("n_samples") == 800)
    assert(sRow.getAs[Double]("duration_ms") == 100.0, "duration must count frames")
    assert(sRow.getAs[Int]("peak") == 2000 && sRow.getAs[Double]("mean") == -500.0)
    // corrupt payload and unsupported encoding (8-bit PCM) both → NULLs,
    // rows kept — the pinned fallback contract
    val eight = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](100)), eight, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val bad = MultimodalOps.decodeAudio(Seq(
        (2L, "definitely not a riff container".getBytes("UTF-8")),
        (3L, bos8.toByteArray)).toDF("doc_id", "media"))
      .collect()
    assert(bad.length == 2)
    bad.foreach(r => assert(r.isNullAt(r.fieldIndex("sample_rate")) &&
      r.isNullAt(r.fieldIndex("rms")),
      "undecodable audio must yield NULLs, not throw and not fake stats"))
  }

  test("video codec: animated-GIF demux + sampled-frame decode recover the exact generator windows; corrupt → NULL row") {
    import spark.implicits._
    val docs = Seq(0L, 3L, 7L, 13L).toDF("doc_id")
    val out = MultimodalOps.sampleFrameStats(
      MultimodalOps.withGeneratedGifVideo(docs), n = 2).collect()
    // n=2 sampling: exactly {first, last} per doc, frames = id%5+2 >= 2
    assert(out.length == 8, out.mkString(","))
    val byKey = out.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")) -> r).toMap
    Seq(0L, 3L, 7L, 13L).foreach { id =>
      val m = ((id % 5) + 2).toInt
      val w = ((id % 8) + 1).toInt * 8; val h = ((id % 6) + 1).toInt * 8
      Seq(0, m - 1).foreach { f =>
        val r = byKey((id, f))
        assert(r.getAs[Int]("n_frames") == m, s"doc $id frame count")
        assert(r.getAs[Int]("decoded_width") == w &&
          r.getAs[Int]("decoded_height") == h, s"doc $id dims")
        // indexed-gray GIF: luminance of sample i IS the quadratic
        // sample at the frame's window offset — recompute bin 0
        // exactly from the formula
        val expBin0 = (0 until w * h).count { i =>
          val x = id * 31 + f.toLong * w * h + i
          (((((x * x) & 0xFFFFFFL) * 0x9E3779B9L) >> 16 & 0xFFL) / 16) == 0
        }.toDouble / (w * h)
        val got = r.getSeq[Double](r.fieldIndex("features"))
        assert(math.abs(got.head - expBin0) < 1e-12,
          s"doc $id frame $f bin0: got ${got.head}, expected $expBin0")
      }
      // frame addressing is real: first and last frame come from
      // DISJOINT generator windows, so their histograms must differ
      val f0 = byKey((id, 0)).getSeq[Double](byKey((id, 0)).fieldIndex("features"))
      val fl = byKey((id, m - 1)).getSeq[Double](byKey((id, m - 1)).fieldIndex("features"))
      assert(f0 != fl, s"doc $id: sampled frames must be distinct windows")
    }
    // n larger than the frame count decodes every frame, no duplicates
    val allFrames = MultimodalOps.sampleFrameStats(
      MultimodalOps.withGeneratedGifVideo(Seq(3L).toDF("doc_id")), n = 10)
      .select("frame_idx").as[Int].collect().toSeq
    assert(allFrames == (0 until ((3 % 5) + 2)), allFrames.toString)
    // corrupt payload and a TRUNCATED gif both → one NULL row, kept
    val goodBytes = MultimodalOps.withGeneratedGifVideo(Seq(7L).toDF("doc_id"))
      .select("media").as[Array[Byte]].head()
    val bad = MultimodalOps.sampleFrameStats(Seq(
        (1L, "not a gif at all".getBytes("UTF-8")),
        (2L, goodBytes.take(20))).toDF("doc_id", "media"), n = 2)
      .collect()
    assert(bad.length == 2)
    bad.foreach(r => assert(r.isNullAt(r.fieldIndex("n_frames")),
      "undecodable video must yield a NULL row, not throw and not fake frames"))
  }

  test("perceptual hash: re-encoded twins collide, different pictures repel, corrupt → NULL, banding finds exactly the twins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(7L, 19L, 300L).toDF("doc_id")
    // one doc's picture, three containers → one identical dHash. This is
    // the property the q_ext_media_neardup oracle rides: the block
    // fixture confines JPEG error inside the ±8 gradient margin, so even
    // the lossy container hashes EQUAL, not merely near.
    val perFmt = Seq("png", "bmp", "jpeg").map { f =>
      MultimodalOps.perceptualHash(
        MultimodalOps.withGeneratedBlockImages(docs, f))
        .select(col("doc_id"), col("phash").as(s"phash_$f"))
    }
    val joined = perFmt.reduce(_.join(_, "doc_id")).collect()
    assert(joined.length == 3)
    joined.foreach { r =>
      assert(r.getAs[Long]("phash_png") == r.getAs[Long]("phash_bmp") &&
        r.getAs[Long]("phash_png") == r.getAs[Long]("phash_jpeg"),
        s"re-encoded twins must dHash identically for doc ${r.getAs[Long]("doc_id")}")
    }
    // falsifiability, repel direction: DIFFERENT pictures must not sit
    // within the pairing radius — else the collapse would merge
    // unrelated images and the oracle's n_survivors=1 would flip
    val hs = joined.map(_.getAs[Long]("phash_png"))
    for (i <- hs.indices; j <- hs.indices if i < j)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 6,
        "distinct docs' pictures must be farther than maxDist apart")
    // corrupt payload → NULL phash, row kept, excluded from pairing
    val corrupt = Seq((99L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "media")
    val cr = MultimodalOps.perceptualHash(corrupt).head()
    assert(cr.isNullAt(cr.fieldIndex("phash")),
      "undecodable payload must yield NULL phash, not throw")
    // banded search end-to-end: variants of the same doc pair up,
    // nothing else does, and NULL sigs stay out
    val variants = Seq("png" -> 1, "bmp" -> 2).map { case (f, k) =>
      MultimodalOps.withGeneratedBlockImages(docs, f)
        .select((col("doc_id") * 10 + k).as("doc_id"), col("media"))
    }.reduce(_.unionByName(_))
    val sigs = MultimodalOps.perceptualHash(variants)
      .unionByName(Seq((999L, null.asInstanceOf[java.lang.Long]))
        .toDF("doc_id", "phash"))
    val pairs = graft.ext.DedupOps.hammingNearDupPairsFromSigs(
      sigs, maxDist = 6, bands = 8, sigCol = "phash")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((71L, 72L), (191L, 192L), (3001L, 3002L)),
      s"banding must find exactly the twin pairs, got $pairs")
    // pigeonhole guard is enforced, not assumed
    intercept[IllegalArgumentException] {
      graft.ext.DedupOps.hammingNearDupPairsFromSigs(sigs, maxDist = 8, bands = 8)
    }
  }

  test("MJPEG-in-AVI: RIFF demux + JPEG frame decode; magic-byte dispatch; corrupt/truncated → NULL row") {
    import spark.implicits._
    val docs = Seq(2L, 9L, 41L).toDF("doc_id")
    val avi = MultimodalOps.withGeneratedBlockVideo(docs, "avi")
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    docs.as[Long].collect().foreach { id =>
      val payload = avi(id)
      // a second spec-conformant walker would accept it too: magic +
      // well-formed sizes are asserted by our own strict parser
      assert(new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 4, "US-ASCII") == "AVI ")
      val m = ((id % 5) + 2).toInt
      assert(MjpegAviCodec.frameCount(payload).contains(m), s"doc $id frames")
      val (w, h, _) = MjpegAviCodec.decodeFrame(payload, 0).get
      assert(w == 72 && h == 64)
      // frame addressing: first and last frames are different pictures
      val f0 = MjpegAviCodec.decodeFrame(payload, 0).get._3
      val fl = MjpegAviCodec.decodeFrame(payload, m - 1).get._3
      assert(!java.util.Arrays.equals(f0, fl), s"doc $id frame windows")
      // out-of-range frame index declines, never throws
      assert(MjpegAviCodec.decodeFrame(payload, m).isEmpty)
      // the router sniffs RIFF/AVI and delegates
      assert(AutoVideoCodec.frameCount(payload).contains(m))
    }
    // GIF twins route through the router to the GIF codec and decode
    // the IDENTICAL picture per frame — both palette variants, even
    // though their BYTES differ (permuted color table + LZW stream)
    val gifId = MultimodalOps.withGeneratedBlockVideo(docs, "gif")
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    val gifPm = MultimodalOps.withGeneratedBlockVideo(docs, "gif-perm")
      .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    docs.as[Long].collect().foreach { id =>
      assert(!java.util.Arrays.equals(gifId(id), gifPm(id)),
        s"doc $id: palette permutation must change the bytes")
      val a = AutoVideoCodec.decodeFrame(gifId(id), 0).get
      val b = AutoVideoCodec.decodeFrame(gifPm(id), 0).get
      assert(java.util.Arrays.equals(a._3, b._3),
        s"doc $id: palette permutation must not change the pixels")
      // and the lossy AVI stays inside the dHash gradient margin
      val (aw, ah, apx) = a
      val (vw, vh, vpx) = AutoVideoCodec.decodeFrame(avi(id), 0).get
      assert(MultimodalOps.dhash64(aw, ah, apx) ==
        MultimodalOps.dhash64(vw, vh, vpx),
        s"doc $id: AVI frame must dHash equal to its GIF twin")
    }
    // corrupt family: garbage, truncated AVI (mid-chunk), bad magic —
    // all map to None at the codec and a NULL row through the fold
    val good = avi(9L)
    val bads = Seq[Array[Byte]](
      "definitely not a container".getBytes("UTF-8"),
      good.take(good.length / 2),
      { val g = good.clone(); g(9) = 'X'.toByte; g })
    bads.foreach(b => assert(AutoVideoCodec.frameCount(b).isEmpty))
    val folded = MultimodalOps.videoFrameHashes(
      bads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("doc_id", "media"), n = 2).collect()
    assert(folded.length == 3)
    folded.foreach(r => assert(r.isNullAt(r.fieldIndex("sig")),
      "undecodable video must fold to a NULL-sig row, not throw"))
  }

  test("frameSigNearDupPairs: twins pair, one divergent aligned frame kills the pair, lengths must match") {
    import spark.implicits._
    // hand-planted signatures: exact control over aligned distances
    val base = Array(0x0123456789ABCDEFL, 0x0F0F0F0F0F0F0F0FL)
    val sigs = Seq(
      (1L, base.toSeq),                                   // subject
      (2L, base.toSeq),                                   // exact twin
      (3L, Seq(base(0) ^ 0x7L, base(1) ^ 0x30L)),         // within 6 on both
      (4L, Seq(base(0), base(1) ^ 0x00FF00FF00000000L)),  // frame 1 diverges (16)
      (5L, Seq(base(0))),                                 // shorter — never pairs
      (6L, null.asInstanceOf[Seq[Long]])                  // unsignable — excluded
    ).toDF("doc_id", "sig")
    val pairs = graft.ext.DedupOps.frameSigNearDupPairs(sigs, maxDist = 6, bands = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected exactly the twin triangle, got $pairs")
    // pigeonhole guard holds for the lifted form too
    intercept[IllegalArgumentException] {
      graft.ext.DedupOps.frameSigNearDupPairs(sigs, maxDist = 8, bands = 8)
    }
  }

  test("audio containers: WAV/AIFF/AU byte-distinct, magic-validated codecs + router recover identical samples; requantized twin halves exactly; corrupt → NULL") {
    import spark.implicits._
    val docs = Seq(3L, 10L, 47L).toDF("doc_id")
    def blobs(c: String): Map[Long, Array[Byte]] =
      MultimodalOps.withGeneratedAudioVariants(docs, c)
        .select("doc_id", "media").as[(Long, Array[Byte])].collect().toMap
    val wav = blobs("wav"); val aiff = blobs("aiff")
    val au = blobs("au"); val half = blobs("wav-half")
    docs.as[Long].collect().foreach { id =>
      // three genuinely different byte streams of one clip
      assert(!java.util.Arrays.equals(wav(id), aiff(id)))
      assert(!java.util.Arrays.equals(wav(id), au(id)))
      assert(!java.util.Arrays.equals(aiff(id), au(id)))
      // each per-container codec accepts ITS container, rejects the others
      assert(RiffWavCodec.decode(wav(id)).isDefined)
      assert(RiffWavCodec.decode(aiff(id)).isEmpty && RiffWavCodec.decode(au(id)).isEmpty)
      assert(AiffCodec.decode(aiff(id)).isDefined)
      assert(AiffCodec.decode(wav(id)).isEmpty && AiffCodec.decode(au(id)).isEmpty)
      assert(AuCodec.decode(au(id)).isDefined)
      assert(AuCodec.decode(wav(id)).isEmpty && AuCodec.decode(aiff(id)).isEmpty)
      // the router recovers IDENTICAL samples from all three — both
      // endiannesses and all three header walks, bit-exact
      val sw = AutoAudioCodec.decode(wav(id)).get
      val sa = AutoAudioCodec.decode(aiff(id)).get
      val su = AutoAudioCodec.decode(au(id)).get
      assert(sw._1 == 8000f && sw._2 == 1)
      val n = 65 * ((id % 4) + 1).toInt * 16
      assert(sw._3.length == n, s"doc $id samples")
      assert(java.util.Arrays.equals(sw._3, sa._3), s"doc $id aiff samples")
      assert(java.util.Arrays.equals(sw._3, su._3), s"doc $id au samples")
      // requantized twin: every sample exactly halved (amps are even)
      val sh = AutoAudioCodec.decode(half(id)).get
      assert(sw._3.zip(sh._3).forall { case (a, b) => a == 2 * b },
        s"doc $id requantized twin must be an exact half")
    }
    // corrupt family: garbage, truncated WAV, broken WAVE magic — all
    // map to None at the router and NULL rows through audioWindowSig
    val good = wav(10L)
    val bads = Seq[Array[Byte]](
      "definitely not audio".getBytes("UTF-8"),
      good.take(16),
      { val g = good.clone(); g(9) = 'X'.toByte; g })
    bads.foreach(b => assert(AutoAudioCodec.decode(b).isEmpty))
    val folded = MultimodalOps.audioWindowSig(
      bads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("doc_id", "media")).collect()
    assert(folded.length == 3)
    folded.foreach(r => assert(r.isNullAt(r.fieldIndex("sig")),
      "undecodable audio must fold to a NULL-sig row, not throw"))
  }

  test("audioWindowSig: bits match the envelope formula; planted divergent windows break the pair, sub-step drift does not") {
    import spark.implicits._
    // hand-built WAVs from an EXPLICIT amplitude-per-window array, so
    // the expected signature is computable in the test itself
    val winLen = 16
    def wavOf(amps: Array[Int]): Array[Byte] = {
      val n = amps.length * winLen
      val pcm = new Array[Byte](n * 2)
      for (w <- amps.indices; j <- 0 until winLen) {
        val s = if ((j / 8) % 2 == 0) amps(w) else -amps(w)
        val i = w * winLen + j
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def expectedSig(amps: Array[Int]): Long =
      (0 until amps.length - 1).foldLeft(0L)((acc, b) =>
        if (amps(b) < amps(b + 1)) acc | (1L << b) else acc)
    val base = Array.tabulate(65)(w => 34 * (1 + (w * 3) % 8))
    // FALSIFIABILITY: drift smaller than the inter-level step (amps are
    // multiples of 34) flips no comparison; re-leveling a window RUN
    // flips many
    val drift = base.clone(); drift(30) += 2
    val divergent = base.clone()
    for (w <- 20 until 28) divergent(w) = 34 * (1 + ((w * 3 + 4) % 8))
    assert(java.lang.Long.bitCount(
      expectedSig(base) ^ expectedSig(divergent)) > 6,
      "the planted divergence must exceed the verify radius")
    val sigRows = MultimodalOps.audioWindowSig(Seq(
        (1L, wavOf(base)), (2L, wavOf(drift)), (3L, wavOf(divergent)))
      .toDF("doc_id", "media"))
    val got = sigRows.select("doc_id", "sig").as[(Long, Long)].collect().toMap
    // the decode → windowing → envelope → bit pipeline matches the
    // formula exactly (this is the same derivation the DuckDB oracle
    // of q_ext_media_audio_neardup recomputes)
    assert(got(1L) == expectedSig(base), f"base sig ${got(1L)}%x")
    assert(got(2L) == expectedSig(base), "sub-step drift must not move a bit")
    assert(got(3L) == expectedSig(divergent))
    val pairs = graft.ext.DedupOps.hammingNearDupPairsFromSigs(
        sigRows, maxDist = 6, bands = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"drift pairs, divergence must not: $pairs")
  }

  test("mediaChecks: every corruption class rejects with its own first-failing check; null/empty payloads fail presence") {
    import spark.implicits._
    val media = MultimodalOps.withGeneratedMixedMedia(
      spark.range(0, 12).select(col("id").as("doc_id")))
    val got = media.withColumn("r",
        IngestOps.rejectReason(MultimodalOps.mediaChecks()))
      .select("doc_id", "r").as[(Long, String)].collect().toMap
    assert(got.keySet == (0L until 12L).toSet, "one row per doc")
    // every class must actually occur in this id range
    assert((0L until 12L).map(MultimodalOps.mixedMediaClass).toSet == (0L to 5L).toSet)
    got.foreach { case (id, r) =>
      MultimodalOps.mixedMediaClass(id) match {
        case 3L      => assert(r == "known_container", s"doc $id: $r")
        case 4L | 5L => assert(r == "media_decodes", s"doc $id: $r")
        case _       => assert(r == null, s"doc $id must pass, got $r")
      }
    }
    val degenerate = Seq((100L, null.asInstanceOf[Array[Byte]]),
        (101L, Array.emptyByteArray)).toDF("doc_id", "media")
      .withColumn("r", IngestOps.rejectReason(MultimodalOps.mediaChecks()))
      .select("r").as[String].collect()
    assert(degenerate.forall(_ == "media_present"), degenerate.toSeq.toString)
  }
}
