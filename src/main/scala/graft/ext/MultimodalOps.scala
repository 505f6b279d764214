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
  * across the batch), deterministic output schema.
  *
  * Decoding comes in two tiers behind the [[ImageCodec]] seam:
  *  - [[ImageIoCodec]] — a REAL image decoder (the JDK's
  *    `javax.imageio`, which ships PNG/JPEG/BMP/GIF readers in
  *    `java.desktop` and runs headless): [[decodeImage]] extracts true
  *    dimensions + a luminance histogram, [[resizeImage]] resamples
  *    through `java.awt.Image` and re-encodes. Spec-gated on
  *    generated PNGs (MultimodalSpec) — the fixture blobs are text
  *    bytes, so the DuckDB-oracled queries cannot use it.
  *  - `fakeDecodeFeatures` / `resizeStub` — the clearly-marked STUBS
  *    (byte histogram / byte decimation) that stand in for audio/video
  *    codecs the container lacks; deterministic, so the oracle-gated
  *    queries verify the plumbing end-to-end.
  *
  * Scale notes: binary payloads ride the scan (parquet keeps them
  * column-pruned away unless selected); feature extraction is map-only
  * (no shuffle); metadata predicates (format/width filters) push down
  * ahead of the expensive decode because they live in plain columns, not
  * inside the blob.
  */
/** JVM-global ImageIO stream tuning, applied once before any codec or
  * generator touches a stream (r18). With the JDK default
  * `ImageIO.getUseCache() == true`, EVERY
  * `createImageInput/OutputStream` — including the ones `ImageIO.read`
  * and `ImageIO.write` create internally — backs the stream with a TEMP
  * FILE on disk, even when the payload is a ByteArray stream that never
  * needed one. Per decode/encode that is a file create + write + delete
  * on the working filesystem; under 32 parallel decode tasks it is also
  * filesystem-level contention (measured: the GIF frame-hash row's
  * cumulative task time ran ~9× its compute under parallel decode until
  * this was set; the standalone 32-thread ImageIO loop scales ~16× with
  * it). The bench's decode canary sets the flag as a side effect, which
  * used to mask this on full-bench runs — the engine must not depend on
  * a measurement harness side effect, so every codec/generator entry
  * point references [[ready]] before touching ImageIO.
  */
private[ext] object JdkImageIo {
  lazy val ready: Boolean = { javax.imageio.ImageIO.setUseCache(false); true }
  @inline def ensure(): Unit = { val _ = ready }
}

/** Pluggable image-decode seam: partition-local operators take a codec
  * instance, so a JNI/ONNX decoder drops in without touching plumbing.
  * Implementations must be Serializable (the instance ships in the
  * `mapPartitions` closure) and decode-on-executor only.
  */
trait ImageCodec extends Serializable {
  /** (width, height, row-major ARGB pixels), or None if the payload is
    * not decodable by this codec (corrupt bytes, wrong container).
    */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])]

  /** Resample to exactly targetW×targetH and re-encode; None if the
    * payload is not decodable.
    */
  def resize(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]]
}

/** The JDK's own image codec (`javax.imageio`): real PNG/JPEG/BMP/GIF
  * decode with zero extra dependencies, headless-safe (BufferedImage
  * never touches a display). Re-encode is PNG (lossless, deterministic).
  */
object ImageIoCodec extends ImageCodec {

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    JdkImageIo.ensure()
    if (payload == null || payload.isEmpty) None
    // ImageIO THROWS (not null) on a payload whose header sniffs as a
    // known format but whose body is garbage — a corrupt blob must map
    // to None (the not-decodable contract), never fail the task
    else scala.util.Try(
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    ).toOption.flatten
  }

  override def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    readImage(payload).map { img =>
      val w = img.getWidth; val h = img.getHeight
      (w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }

  /** Nearest-neighbor resample with a PINNED source mapping — dst (x,y)
    * reads src (⌊x·srcW/dstW⌋, ⌊y·srcH/dstH⌋), the canonical NN kernel —
    * rather than `Graphics2D.drawImage`, whose sample placement is
    * implementation-defined. Pinning makes the resample bit-exact and
    * platform-independent, so an analytic oracle can recompute every
    * output pixel (q_ext_media_resize_real); bilinear lives in
    * [[resizeBilinear]] for callers preferring smoothness over
    * reproducibility.
    */
  override def resize(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    readImage(payload).map { img =>
      val sw = img.getWidth; val sh = img.getHeight
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        val sy = y * sh / targetH
        var x = 0
        while (x < targetW) { out.setRGB(x, y, img.getRGB(x * sw / targetW, sy)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Bilinear resample via `Graphics2D` with the BILINEAR interpolation
    * hint — smoother output than the pinned nearest-neighbor kernel,
    * but sample placement is the JDK's, so no analytic oracle; dims +
    * decodability + determinism are spec-gated instead
    * (MultimodalSpec). NB deliberately NOT `AffineTransformOp`: its
    * `filter` throws ImagingOpException on downscales of the image
    * types PNG decode produces (the gate caught exactly that).
    */
  def resizeBilinear(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    readImage(payload).map { img =>
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
}

/** Pluggable audio-decode seam — the [[ImageCodec]] analog for the
  * non-image media path. Implementations must be Serializable (the
  * instance ships in the `mapPartitions` closure) and decode on the
  * executor only.
  */
trait AudioCodec extends Serializable {
  /** (sampleRateHz, channels, interleaved PCM samples), or None if the
    * payload is not decodable by this codec (corrupt bytes, wrong
    * container, unsupported encoding).
    */
  def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])]
}

/** The JDK's own audio codec (`javax.sound.sampled`): real WAV/AIFF/AU
  * container parsing with zero extra dependencies, headless-safe. Scope
  * is deliberately the formats whose decode is EXACT — 16-bit signed
  * PCM — so every downstream statistic is bit-reproducible; compressed
  * or float encodings map to None (the not-decodable contract), same
  * honesty rule as a corrupt payload.
  */
object WavCodec extends AudioCodec {
  override def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    Pcm16Decode(payload)
}

/** The shared 16-bit-PCM-exact decode body behind every audio container
  * codec here: `javax.sound.sampled` container parse (WAV RIFF walk,
  * AIFF FORM walk, AU header — whichever provider the stream sniffs),
  * then endianness-aware sample extraction. Kept separate so the
  * per-container codecs below can VALIDATE magic bytes first and share
  * the decode — the [[AutoVideoCodec]] structure applied to audio.
  */
private[ext] object Pcm16Decode {
  def apply(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    if (payload == null || payload.isEmpty) None
    else JdkAudio.parse(payload).flatMap { in =>
      // parse errors map the blob to None (corrupt ≡ undecodable); a
      // PARSED stream that fails mid-read does too
      scala.util.Try {
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val n = bytes.length / 2
            val out = new Array[Int](n)
            var i = 0
            if (fmt.isBigEndian)
              while (i < n) { out(i) = (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF); i += 1 }
            else
              while (i < n) { out(i) = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF); i += 1 }
            Some((fmt.getSampleRate, fmt.getChannels, out))
          }
        } finally in.close()
      }.toOption.flatten
    }
}

/** The JDK audio codec with its providers resolved ONCE per JVM (r18).
  *
  * `AudioSystem.getAudioInputStream` / `AudioSystem.write` re-run a
  * JVM-GLOBAL synchronized provider scan on EVERY call
  * (`JDK13Services.getProviders` behind the
  * `com.sun.media.sound.JSSecurityManager` class monitor — thread-dump
  * verified: 32 decode tasks sit BLOCKED on that monitor). Measured on
  * this host: 14.1k decodes/s at 1 thread collapsing to 867/s per
  * thread at 32 (2× total scaling on 32 cores); resolving the JDK's own
  * `AudioFileReader`/`AudioFileWriter` providers once via ServiceLoader
  * and handing each payload STRAIGHT to the right parser measures 64.8k
  * decodes/s at 1 thread and 800k/s at 32 — same real JDK container
  * parse, no per-call registry walk. Decode routing tries the
  * magic-matched provider first (probed behaviorally at init — no
  * class-name strings), then the rest in ServiceLoader order, so the
  * FIRST provider that parses decides — exactly `AudioSystem`'s
  * contract, including the float-WAV case where a later provider parses
  * what the PCM reader refuses. Falls back to `AudioSystem` if
  * ServiceLoader finds nothing (exotic classloader layouts).
  */
private[ext] object JdkAudio {
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
  import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

  private lazy val readers: List[AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    scala.util.Try(java.util.ServiceLoader.load(classOf[AudioFileReader])
      .iterator().asScala.toList).getOrElse(Nil)
  }
  private lazy val writers: List[AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    scala.util.Try(java.util.ServiceLoader.load(classOf[AudioFileWriter])
      .iterator().asScala.toList).getOrElse(Nil)
  }

  /** A minimal valid container of `t`, for behavioral provider probes. */
  private def probeBytes(t: AudioFileFormat.Type): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), fmt, 32), t, bos)
    bos.toByteArray
  }

  private def readerFor(t: AudioFileFormat.Type): Option[AudioFileReader] =
    scala.util.Try(probeBytes(t)).toOption.flatMap { bytes =>
      readers.find(r => scala.util.Try(
        r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)).close()).isSuccess)
    }

  private lazy val wavReader = readerFor(AudioFileFormat.Type.WAVE)
  private lazy val aiffReader = readerFor(AudioFileFormat.Type.AIFF)
  private lazy val auReader = readerFor(AudioFileFormat.Type.AU)

  /** First provider that PARSES the payload decides (AudioSystem's
    * contract); magic-matched provider tried first so the common case
    * pays one attempt and zero exceptions.
    */
  def parse(payload: Array[Byte]): Option[AudioInputStream] = {
    if (readers.isEmpty)
      return scala.util.Try(AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))).toOption
    val first =
      if (RiffWavCodec.matches(payload)) wavReader
      else if (AiffCodec.matches(payload)) aiffReader
      else if (AuCodec.matches(payload)) auReader
      else None
    (first.iterator ++ readers.iterator.filterNot(first.contains))
      .map(r => scala.util.Try(
        r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))))
      .collectFirst { case scala.util.Success(in) => in }
  }

  private lazy val writerFor: Map[AudioFileFormat.Type, AudioFileWriter] =
    Seq(AudioFileFormat.Type.WAVE, AudioFileFormat.Type.AIFF, AudioFileFormat.Type.AU)
      .flatMap(t => writers.find(_.isFileTypeSupported(t)).map(t -> _)).toMap

  /** `AudioSystem.write` minus the per-call provider scan. */
  def write(in: AudioInputStream, t: AudioFileFormat.Type,
            out: java.io.OutputStream): Unit =
    writerFor.get(t) match {
      case Some(w) => w.write(in, t, out); ()
      case None => AudioSystem.write(in, t, out); ()
    }
}

/** Per-container audio codecs (VERDICT r13 task 4 — the audio analog of
  * the [[GifVideoCodec]]/[[MjpegAviCodec]] pair): each validates ITS
  * container's magic bytes before the shared PCM-exact decode, so a WAV
  * blob handed to [[AiffCodec]] maps to None. That strictness is what
  * makes [[AutoAudioCodec]]'s routing a provable seam
  * (`q_ext_media_audio_formats`) instead of a convenience: a dispatch
  * bug cannot hide behind a decoder that accepts everything.
  */
object RiffWavCodec extends AudioCodec {
  private[ext] def matches(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'
  override def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    if (matches(payload)) Pcm16Decode(payload) else None
}

/** AIFF (`FORM….AIFF`, big-endian PCM). Scope is AIFF proper — AIFC
  * (compressed variants) fails the magic check, same honesty rule as a
  * corrupt payload.
  */
object AiffCodec extends AudioCodec {
  private[ext] def matches(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
      p(8) == 'A' && p(9) == 'I' && p(10) == 'F' && p(11) == 'F'
  override def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    if (matches(payload)) Pcm16Decode(payload) else None
}

/** Sun/NeXT AU (`.snd` magic, big-endian PCM). */
object AuCodec extends AudioCodec {
  private[ext] def matches(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 &&
      p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'
  override def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    if (matches(payload)) Pcm16Decode(payload) else None
}

/** Container dispatch by MAGIC BYTES — the audio counterpart of
  * [[AutoVideoCodec]]: `RIFF….WAVE` routes to [[RiffWavCodec]],
  * `FORM….AIFF` to [[AiffCodec]], `.snd` to [[AuCodec]], anything else
  * is undecodable (None). The codec a mixed-container audio corpus
  * column uses: one decode pass over blobs of any of the three formats,
  * no per-row format column required.
  */
object AutoAudioCodec extends AudioCodec {
  private[ext] def route(p: Array[Byte]): Option[AudioCodec] =
    if (RiffWavCodec.matches(p)) Some(RiffWavCodec)
    else if (AiffCodec.matches(p)) Some(AiffCodec)
    else if (AuCodec.matches(p)) Some(AuCodec)
    else None
  override def decode(payload: Array[Byte]): Option[(Float, Int, Array[Int])] =
    route(payload).flatMap(_.decode(payload))
}

/** Pluggable video-decode seam — the multi-frame analog of
  * [[ImageCodec]]: a container holds an ordered frame sequence; the
  * sampler asks for frame COUNT first, then decodes only the frames it
  * selected (the demux-then-decode-selected shape a real video pipeline
  * uses — decoding every frame of a corpus to sample two is the scale
  * mistake). Implementations must be Serializable (the instance ships
  * in the `mapPartitions` closure) and decode on the executor only.
  */
trait VideoCodec extends Serializable {
  /** Number of frames, or None if the payload is not decodable. */
  def frameCount(payload: Array[Byte]): Option[Int]

  /** (width, height, row-major ARGB pixels) of frame `idx` (0-based),
    * or None if the payload/frame is not decodable.
    */
  def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Int])]

  /** Decode several frames in ONE container parse where the format
    * allows (ADVICE r13: per-frame [[decodeFrame]] calls re-walk the
    * container per frame — O(n·payload) redundant demux per row at
    * corpus scale). Contract identical to mapping [[decodeFrame]] over
    * `indices` — that mapping is the default; containers override with
    * a single-walk implementation.
    */
  def decodeFrames(payload: Array[Byte],
                   indices: Seq[Int]): Seq[Option[(Int, Int, Array[Int])]] =
    indices.map(decodeFrame(payload, _))
}

/** The JDK's own multi-frame codec: ANIMATED GIF through
  * `javax.imageio`'s ImageReader sequence API — real container demux
  * (frame count from the stream directory) and real per-frame LZW
  * decode, zero extra dependencies. Scope note: frames are read RAW
  * (not composited onto prior frames), which is exact for full-frame
  * sequences like [[MultimodalOps.withGeneratedGifVideo]]'s and for any
  * writer that does not delta-optimize; delta-optimized GIFs would need
  * disposal-method compositing — out of scope, documented, and
  * irrelevant to the decode-seam contract this gates.
  */
object GifVideoCodec extends VideoCodec {

  private def withReader[A](payload: Array[Byte])(
      f: javax.imageio.ImageReader => A): Option[A] =
    if (payload == null || payload.isEmpty) None
    // reader lookup/parse THROWS on garbage — corrupt maps to None,
    // never fails the task (same contract as the image/audio seams)
    else scala.util.Try {
      JdkImageIo.ensure()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some(f(r)) } finally r.dispose()
        }
      } finally iis.close()
    }.toOption.flatten

  override def frameCount(payload: Array[Byte]): Option[Int] =
    withReader(payload)(_.getNumImages(true)).filter(_ > 0)

  override def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Int])] =
    withReader(payload) { r =>
      val img = r.read(idx)
      val w = img.getWidth; val h = img.getHeight
      (w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }

  // one reader (one stream-directory parse) serves every sampled frame
  override def decodeFrames(payload: Array[Byte],
                            indices: Seq[Int]): Seq[Option[(Int, Int, Array[Int])]] =
    withReader(payload) { r =>
      indices.map { idx =>
        scala.util.Try {
          val img = r.read(idx)
          val w = img.getWidth; val h = img.getHeight
          (w, h, img.getRGB(0, 0, w, h, null, 0, w))
        }.toOption
      }
    }.getOrElse(indices.map(_ => None))
}

/** MJPEG-in-AVI: the second real container behind the [[VideoCodec]]
  * seam (VERDICT r12 task 8 — BMP/GIF/JPEG proved the image seam's
  * dispatch the same way). The RIFF walk is hand-rolled (fourcc +
  * little-endian size + even padding, LIST recursion), frames are the
  * `00dc`/`00db` chunks of the `movi` list in stream order, and each
  * frame body is a complete JPEG decoded by `javax.imageio` — so
  * demux (container walk) and per-frame decode are genuinely separate
  * stages, which is what makes decode-only-sampled-frames real here
  * too. Any structural violation — bad magic, a chunk extending past
  * the buffer, truncation mid-walk — maps to None (the corrupt-blob
  * contract of every media seam in this file), never an exception.
  */
object MjpegAviCodec extends VideoCodec {

  /** Byte offsets+lengths of the movi list's video chunks, in file
    * order; None when the payload is not a structurally valid AVI.
    */
  private def frameChunks(payload: Array[Byte]): Option[Array[(Int, Int)]] =
    if (payload == null || payload.length < 12) None
    else scala.util.Try {
      def fourcc(o: Int) = new String(payload, o, 4, "US-ASCII")
      def u32(o: Int): Long =
        (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
          ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
      require(fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      val riffEnd = math.min(payload.length.toLong, 8L + u32(4)).toInt
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(o)
          val sz = u32(o + 4)
          val body = o + 8
          require(body + sz <= to, s"chunk $id overruns")
          if (id == "LIST") {
            require(sz >= 4)
            val listType = fourcc(body)
            walk(body + 4, body + sz.toInt, inMovi || listType == "movi")
          } else if (inMovi && (id == "00dc" || id == "00db") && sz > 0)
            out += ((body, sz.toInt))
          o = body + sz.toInt + (sz.toInt & 1) // chunks pad to even
        }
      }
      walk(12, riffEnd, inMovi = false)
      out.toArray
    }.toOption.filter(_.nonEmpty)

  override def frameCount(payload: Array[Byte]): Option[Int] =
    frameChunks(payload).map(_.length)

  private def decodeChunk(payload: Array[Byte],
                          ch: (Int, Int)): Option[(Int, Int, Array[Int])] =
    scala.util.Try {
      JdkImageIo.ensure()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, ch._1, ch._2))
      require(img != null)
      val w = img.getWidth; val h = img.getHeight
      (w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }.toOption

  override def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Int])] =
    frameChunks(payload).filter(ch => idx >= 0 && idx < ch.length)
      .flatMap(ch => decodeChunk(payload, ch(idx)))

  // one RIFF walk serves every sampled frame (ADVICE r13: the per-frame
  // form re-walked the container per decode)
  override def decodeFrames(payload: Array[Byte],
                            indices: Seq[Int]): Seq[Option[(Int, Int, Array[Int])]] =
    frameChunks(payload) match {
      case None => indices.map(_ => None)
      case Some(ch) => indices.map(idx =>
        if (idx >= 0 && idx < ch.length) decodeChunk(payload, ch(idx)) else None)
    }
}

/** Container dispatch by MAGIC BYTES — the video counterpart of
  * ImageIO's format sniffing on the image seam: `GIF8` routes to
  * [[GifVideoCodec]], `RIFF....AVI ` to [[MjpegAviCodec]], anything
  * else is undecodable (None). This is the codec a mixed-container
  * corpus column uses: one `videoFrameHashes` pass over blobs of
  * either format, no per-row format column required.
  */
object AutoVideoCodec extends VideoCodec {
  private def route(payload: Array[Byte]): Option[VideoCodec] =
    if (payload == null || payload.length < 12) None
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8') Some(GifVideoCodec)
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
      payload(10) == 'I' && payload(11) == ' ') Some(MjpegAviCodec)
    else None

  override def frameCount(payload: Array[Byte]): Option[Int] =
    route(payload).flatMap(_.frameCount(payload))

  override def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Int])] =
    route(payload).flatMap(_.decodeFrame(payload, idx))

  override def decodeFrames(payload: Array[Byte],
                            indices: Seq[Int]): Seq[Option[(Int, Int, Array[Int])]] =
    route(payload) match {
      case Some(c) => c.decodeFrames(payload, indices)
      case None    => indices.map(_ => None)
    }
}

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

  /** FALLBACK featurizer for payloads no codec accepts — byte-value
    * histogram, normalized to sum 1. Kept (a) for the synthetic-payload
    * fixture rows whose blobs are text bytes by construction and (b) so
    * a corrupt blob in a real pipeline still yields a filterable
    * feature vector instead of a dropped row.
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

  /** 16-bin normalized luminance histogram over decoded ARGB pixels
    * (ITU-R 601 integer luma) — the shared feature kernel of
    * [[decodeImage]] and [[decodeFeatures]].
    */
  private def lumaHistogram(px: Array[Int]): Array[Double] = {
    val hist = new Array[Double](FeatureBins)
    px.foreach { p =>
      val y = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
        114 * (p & 0xFF)) / 1000
      hist(y / (256 / FeatureBins)) += 1.0
    }
    var i = 0
    while (i < FeatureBins) { hist(i) /= px.length; i += 1 }
    hist
  }

  /** Decode + feature-extract: partition-local batch execution. Output
    * schema: input columns minus the blob, plus `features
    * array<double>[16]` and `media_bytes bigint`. The blob is dropped
    * on output so downstream stages don't shuffle payload bytes.
    *
    * Features come from the REAL codec path by default: payloads the
    * codec decodes yield the luminance histogram over their actual
    * pixels (the same kernel as [[decodeImage]]); payloads it rejects
    * fall back to the byte-histogram stub — so image corpora get pixel
    * features while synthetic/corrupt blobs still featurize. Pass
    * `codec = None` to force the byte path for every row.
    */
  def decodeFeatures(media: DataFrame, mediaCol: String = "media",
                     codec: Option[ImageCodec] = Some(ImageIoCodec)): DataFrame = {
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
        val feats = codec.flatMap(_.decode(payload)) match {
          case Some((_, _, px)) => lumaHistogram(px)
          case None             => fakeDecodeFeatures(payload)
        }
        val kept = keepIdx.map(r.get)
        Row.fromSeq(kept.toSeq ++ Seq(feats.toSeq,
          if (payload == null) 0L else payload.length.toLong))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Deterministic pixel generator shared by [[withGeneratedPng]] and
    * its analytic DuckDB oracle: pixel i of doc d is the low 24 bits of
    * (d·31 + i) · 0x9E3779B9 (RGB packed; row-major i = y·w + x).
    */
  private def genPixel(docId: Long, i: Int): Int =
    (((docId * 31 + i) * 0x9E3779B9L) & 0xFFFFFFL).toInt

  /** Media table whose blobs are REAL PNGs, encoded executor-side from
    * the deterministic generator above (dims doc_id-derived, 8×8 up to
    * 64×48 so the codec work stays proportional to the corpus). This
    * exists to ORACLE-GATE the real decode path: the pixels are a pure
    * function of doc_id, so DuckDB can compute the expected luminance
    * statistics analytically while the engine must round-trip them
    * through genuine PNG encode → [[ImageIoCodec]] decode — a match
    * proves bit-exact pixel recovery, not just plumbing.
    */
  def withGeneratedPng(docs: DataFrame): DataFrame =
    withGeneratedImages(docs, "png")

  /** [[withGeneratedPng]] generalized over the in-JVM codec formats —
    * the format-dispatch breadth gate (VERDICT r10 task 6). Pixel
    * content by format:
    *
    *  - `png` / `bmp`: RGB from [[genPixel]] — both encode losslessly,
    *    so decode recovers every pixel bit-exactly and the analytic
    *    RGB-luminance oracle applies unchanged;
    *  - `gif`: INDEXED 256-gray palette (palette entry v = (v,v,v)),
    *    sample v = low byte of [[genPixel]], written straight into the
    *    raster — GIF's LZW is lossless over indexed data and `getRGB`
    *    reads palette entries verbatim (no colorspace conversion, which
    *    a TYPE_BYTE_GRAY image would apply), so luminance of pixel i is
    *    EXACTLY v: analytically computable;
    *  - `jpeg`: RGB from [[genPixel]] — lossy by design, so only the
    *    decoded DIMENSIONS are oracle-exact; pixel statistics are
    *    spec-bounded (mean-luma tolerance), not hash-pinned.
    */
  def withGeneratedImages(docs: DataFrame, format: String): DataFrame = {
    require(Set("png", "bmp", "gif", "jpeg")(format),
      s"unsupported generator format '$format'")
    val base = docs.select(col("doc_id"),
      ((col("doc_id") % 8 + 1) * 8).cast("int").as("w"),
      ((col("doc_id") % 6 + 1) * 8).cast("int").as("h"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(base, col("doc_id")).mapPartitions { rows =>
      JdkImageIo.ensure()
      // encoder allocation is per-partition; images are built row-local
      val grayPalette = if (format == "gif") {
        val ramp = Array.tabulate(256)(_.toByte)
        new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      } else null
      rows.map { r =>
        val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
        val img =
          if (format == "gif") {
            val im = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
            val raster = im.getRaster
            var i = 0
            while (i < w * h) {
              raster.setSample(i % w, i / w, 0, genPixel(id, i) & 0xFF); i += 1
            }
            im
          } else {
            val im = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var i = 0
            while (i < w * h) { im.setRGB(i % w, i / w, genPixel(id, i)); i += 1 }
            im
          }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, format, bos)
        Row(id, bos.toByteArray, Row(format, w, h, null))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image decode through the [[ImageCodec]] seam: partition-local
    * batch execution, one codec per partition iterator. Output: input
    * columns minus the blob, plus the TRUE `decoded_width` /
    * `decoded_height` read from the image bytes (not the metadata — a
    * decoder trusts pixels, metadata is a hint) and a 16-bin luminance
    * histogram over the decoded pixels. Payloads the codec rejects
    * yield NULL dims/features (kept, so a quality filter can count
    * corrupt blobs) — rows are never silently dropped.
    */
  def decodeImage(media: DataFrame, codec: ImageCodec = ImageIoCodec,
                  mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("decoded_width", IntegerType),
        StructField("decoded_height", IntegerType),
        StructField("features", ArrayType(DoubleType, containsNull = false))))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      // per-partition init happens HERE (a heavier codec loads once)
      rows.map { r =>
        val decoded = codec.decode(r.getAs[Array[Byte]](mediaIdx))
        val kept = keepIdx.map(r.get)
        decoded match {
          case Some((w, h, px)) =>
            Row.fromSeq(kept.toSeq ++ Seq(w, h, lumaHistogram(px).toSeq))
          case None =>
            Row.fromSeq(kept.toSeq ++ Seq(null, null, null))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL image resize through the [[ImageCodec]] seam: resample every
    * decodable payload to `targetW`×`targetH` (re-encoded PNG) and
    * update the metadata dims; payloads the codec rejects pass through
    * untouched with their ORIGINAL metadata (claiming target dims for
    * an un-resampled payload would lie downstream — same honesty rule
    * as [[resizeStub]]). Schema-preserving, partition-local.
    */
  def resizeImage(media: DataFrame, targetW: Int, targetH: Int,
                  codec: ImageCodec = ImageIoCodec,
                  mediaCol: String = "media", metaCol: String = "media_meta"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val metaIdx = inSchema.fieldIndex(metaCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        codec.resize(r.getAs[Array[Byte]](mediaIdx), targetW, targetH) match {
          case Some(resized) =>
            val meta = r.getAs[Row](metaIdx)
            val newMeta =
              if (meta == null) Row("png", targetW, targetH, null)
              else Row(meta.get(0), targetW, targetH, meta.get(3))
            Row.fromSeq(r.toSeq.updated(mediaIdx, resized).updated(metaIdx, newMeta))
          case None => r
        }
      }
    }(RowEncoder.encoderFor(inSchema))
  }

  /** Media table whose blobs are 72×64 BLOCK-STRUCTURED images — a 9×8
    * grid of 8×8-pixel constant gray blocks — built so the PERCEPTUAL
    * hash pipeline gets an analytic oracle AND a guaranteed-robust
    * JPEG re-encode, neither of which the noise-pixel generator
    * ([[genPixel]]) can give (measured: noise images re-encode to
    * dHash hamming up to 9, and different docs' rasters are shifted
    * copies of one stream, colliding at hamming 0):
    *
    *  - block luma v(gx,gy) = 17 · (2·(m mod 8) + gx mod 2), where m is
    *    the low hex digit of md5("id:gx:gy") — md5 decorrelates docs
    *    (no affine shift structure) and IS DuckDB-expressible, so the
    *    oracle recomputes every block, hence every expected hash bit;
    *  - the gx-parity term forces adjacent-in-x blocks onto disjoint
    *    odd/even level sets: they differ by ≥17 luma, so every dHash
    *    gradient sign has a ±8 noise margin;
    *  - blocks are exactly the dHash grid cells (72/9 = 64/8 = 8 px)
    *    AND exactly JPEG's 8×8 DCT blocks: a constant block encodes to
    *    its DC coefficient alone, whose quantization error (±4 luma at
    *    the JDK's default quality) is inside the margin — so
    *    PNG, BMP, and JPEG encodings of one doc dHash IDENTICALLY, by
    *    construction rather than by luck (probe-verified).
    */
  def withGeneratedBlockImages(docs: DataFrame, format: String): DataFrame = {
    require(Set("png", "bmp", "jpeg")(format),
      s"unsupported block-generator format '$format'")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(
      docs.select(col("doc_id")), col("doc_id")).mapPartitions { rows =>
      JdkImageIo.ensure()
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val im = new java.awt.image.BufferedImage(
          72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 9) {
            val dig = md.digest(s"$id:$gx:$gy".getBytes("UTF-8"))
            val v = 17 * (2 * ((dig(0) & 0xFF) % 8) + gx % 2)
            val rgb = (v << 16) | (v << 8) | v
            var y = gy * 8
            while (y < gy * 8 + 8) {
              var x = gx * 8
              while (x < gx * 8 + 8) { im.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            gx += 1
          }
          gy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, format, bos)
        Row(id, bos.toByteArray, Row(format, 72, 64, null))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** 64-bit difference hash (dHash) over a decoded ARGB raster: the
    * luminance plane is box-filtered (area-average, ITU-R 601 luma —
    * the same coefficients as [[lumaHistogram]]) onto a 9×8 grid, and
    * bit (y·8+x) is set iff grid(y,x) < grid(y,x+1) — 64 horizontal
    * gradient signs. The hash is a function of IMAGE CONTENT, not
    * bytes: a re-encode (PNG↔BMP) reproduces it exactly, lossy JPEG
    * and mild resampling perturb only the few bits whose neighboring
    * cell averages were already close, so near-dup detection is a
    * small-radius hamming search — the same shape as SimHash, and it
    * reuses SimHash's chunk-banding for candidate generation
    * ([[DedupOps.hammingNearDupPairsFromSigs]]). dHash over pHash
    * (DCT): equal robustness to re-encode/resize at a fraction of the
    * kernel cost, and no DCT basis to pin for cross-platform
    * determinism.
    */
  def dhash64(w: Int, h: Int, px: Array[Int]): Long = {
    val gw = 9; val gh = 8
    val grid = new Array[Double](gw * gh)
    var gy = 0
    while (gy < gh) {
      // cell (gx,gy) averages source rows [gy·h/gh, (gy+1)·h/gh) —
      // floor-div boundaries, widened to at least one pixel so tiny
      // sources (w < 9) sample rather than vanish
      val y0 = gy * h / gh; val y1 = math.min(h, math.max(y0 + 1, (gy + 1) * h / gh))
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.min(w, math.max(x0 + 1, (gx + 1) * w / gw))
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            s += (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
              114 * (p & 0xFF)) / 1000.0
            n += 1; x += 1
          }
          y += 1
        }
        grid(gy * gw + gx) = s / n
        gx += 1
      }
      gy += 1
    }
    var out = 0L; var b = 0
    var yy = 0
    while (yy < gh) {
      var xx = 0
      while (xx < 8) {
        if (grid(yy * gw + xx) < grid(yy * gw + xx + 1)) out |= (1L << b)
        b += 1; xx += 1
      }
      yy += 1
    }
    out
  }

  /** Perceptual (visual) hash column over a media table: decode each
    * payload through the [[ImageCodec]] seam and emit its [[dhash64]].
    * Output: input columns minus the blob, plus `phash bigint` (NULL
    * for payloads the codec rejects — kept, so corrupt blobs are
    * countable and excluded from pair generation by the NULL filter
    * downstream, never silently dropped here). Partition-local decode,
    * map-only — the expensive pixel work never shuffles; only the
    * 8-byte hash does.
    */
  def perceptualHash(media: DataFrame, codec: ImageCodec = ImageIoCodec,
                     mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) :+
        StructField("phash", LongType))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val hashed = codec.decode(r.getAs[Array[Byte]](mediaIdx))
          .map { case (w, h, px) => dhash64(w, h, px) }
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ hashed.orNull)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Media table whose blobs are REAL WAV files (RIFF container written
    * by `javax.sound.sampled` itself): a 16-bit signed PCM mono square
    * wave at 8 kHz — amplitude A = (doc_id % 5 + 1)·4000, half-period 8
    * samples (a 500 Hz tone), length (doc_id % 4 + 1)·800 samples
    * (0.1–0.4 s). A SQUARE wave rather than a sine because every sample
    * is EXACTLY ±A: RMS = A, peak = A, and mean = 0 over the
    * whole-period length, all integer-analytic — a sine's rounded
    * samples would hinge the oracle on cross-engine `sin()` ULP
    * agreement, which IEEE does not promise. This exists to oracle-gate
    * the real audio decode path: a match proves genuine WAV encode →
    * [[WavCodec]] decode recovers every sample bit-exactly.
    */
  def withGeneratedWav(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(
      docs.select(col("doc_id")), col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = ((id % 4) + 1).toInt * 800
        val amp = ((id % 5) + 1).toInt * 4000
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = if ((i / 8) % 2 == 0) amp else -amp
          pcm(2 * i) = (s & 0xFF).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        JdkAudio.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray, Row("wav", null, null, (n / 8): Integer))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Audio fixture for the perceptual near-dup + container-dispatch
    * gates (VERDICT r13 tasks 3–4): per doc, 65 equal WINDOWS of a
    * 16-bit PCM mono square wave at 8 kHz, window w's amplitude
    * md5-derived — A_w = u·(1 + (first md5 byte of "id:w" mod 8)) with
    * u = 34 — so DuckDB recomputes every window's exact mean |sample|
    * (= A_w: square wave, whole periods per window) and from the
    * A_w < A_{w+1} comparisons every signature bit
    * ([[MultimodalOps.audioWindowSig]]). Window length L = (id%4+1)·16
    * (a multiple of the 16-sample period), total 65·L samples.
    *
    * `container` picks the RE-ENCODING: "wav" (RIFF, little-endian),
    * "aiff" (FORM, big-endian), "au" (.snd, big-endian) — three
    * byte-distinct containers of the SAME samples — and "wav-half", the
    * REQUANTIZED twin: every amplitude exactly halved (u = 17; A_w is
    * always even so integer halving is exact), which scales every
    * window mean by ½ and therefore preserves every comparison bit.
    * Four encodings, one signature — invisible to byte-exact dedup,
    * collapsed by the banded signature join.
    */
  def withGeneratedAudioVariants(docs: DataFrame, container: String): DataFrame = {
    require(Set("wav", "aiff", "au", "wav-half")(container),
      s"unsupported audio-generator container '$container'")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(
      docs.select(col("doc_id")), col("doc_id")).mapPartitions { rows =>
      JdkImageIo.ensure()
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val windows = 65
        val winLen = ((id % 4) + 1).toInt * 16
        val n = windows * winLen
        val unit = if (container == "wav-half") 17 else 34
        val big = container == "aiff" || container == "au"
        val pcm = new Array[Byte](n * 2)
        var w = 0
        while (w < windows) {
          val dig = md.digest(s"$id:$w".getBytes("UTF-8"))
          val amp = unit * (1 + (dig(0) & 0xFF) % 8)
          var j = 0
          while (j < winLen) {
            val s = if ((j / 8) % 2 == 0) amp else -amp
            val i = w * winLen + j
            if (big) { pcm(2 * i) = ((s >> 8) & 0xFF).toByte; pcm(2 * i + 1) = (s & 0xFF).toByte }
            else { pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte }
            j += 1
          }
          w += 1
        }
        // the stream's declared endianness matches the byte layout we
        // built, and each writer gets its container's canonical order —
        // no reliance on writer-side conversion
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, big)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val ftype = container match {
          case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
          case "au"   => javax.sound.sampled.AudioFileFormat.Type.AU
          case _      => javax.sound.sampled.AudioFileFormat.Type.WAVE
        }
        val bos = new java.io.ByteArrayOutputStream()
        JdkAudio.write(ais, ftype, bos)
        Row(id, bos.toByteArray,
          Row(if (container == "wav-half") "wav" else container,
            null, null, (n / 8): Integer))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Doc-level perceptual AUDIO signature (VERDICT r13 task 3 — the
    * [[videoFrameHashes]] discipline on the audio seam): decode through
    * the [[AudioCodec]] seam, split the interleaved samples into
    * `windows` equal spans (window w = samples [⌊w·n/W⌋, ⌊(w+1)·n/W⌋)),
    * take each window's mean |sample| (an energy envelope), and emit
    * the W−1 delta-sign bits as one `sig bigint` — bit b set iff
    * env_b < env_{b+1}, exactly [[dhash64]]'s gradient-sign rule on a
    * 1-D envelope. Re-encodes of the same audio (container swap,
    * endianness swap, uniform requantization) preserve the envelope's
    * ORDER and therefore every bit; near-misses stay within a small
    * hamming radius, which is what
    * [[DedupOps.hammingNearDupPairsFromSigs]] bands on. Undecodable
    * payloads — or clips shorter than `windows` samples — yield NULL
    * fields (kept, countable, excluded from pair generation by the
    * NULL filter, never silently dropped). Partition-local decode;
    * only 8 bytes of signature per doc shuffle.
    */
  /** The audio envelope-signature kernel shared by [[audioWindowSig]]
    * and [[mediaValidateAndSig]]: W equal spans' mean |sample|, then
    * the W−1 delta-sign bits ([[dhash64]]'s gradient-sign rule on a
    * 1-D envelope). Requires `samples.length >= windows`.
    */
  private[ext] def envelopeSig64(samples: Array[Int], windows: Int): Long = {
    val n = samples.length
    val env = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      val from = (w.toLong * n / windows).toInt
      val to = ((w + 1).toLong * n / windows).toInt
      var s = 0.0; var i = from
      while (i < to) { s += math.abs(samples(i).toDouble); i += 1 }
      env(w) = s / (to - from)
      w += 1
    }
    var sig = 0L; var b = 0
    while (b < windows - 1) {
      if (env(b) < env(b + 1)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def audioWindowSig(media: DataFrame, windows: Int = 65,
                     codec: AudioCodec = AutoAudioCodec,
                     mediaCol: String = "media"): DataFrame = {
    require(windows >= 2 && windows <= 65,
      s"windows must be in [2, 65] (W-1 bits must fit a bigint), got $windows")
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("sample_rate", IntegerType),
        StructField("n_samples", LongType),
        StructField("sig", LongType)))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get).toSeq
        codec.decode(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some((rate, _, samples)) if samples.length >= windows =>
            Row.fromSeq(kept ++ Seq[Any](rate.toInt, samples.length.toLong,
              envelopeSig64(samples, windows)))
          case _ =>
            Row.fromSeq(kept ++ Seq(null, null, null))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL audio decode through the [[AudioCodec]] seam: partition-local
    * batch execution. Output: input columns minus the blob, plus the
    * TRUE `sample_rate`/`channels` read from the container, the
    * interleaved `n_samples` count, `duration_ms` (frames / rate), and
    * the amplitude statistics `rms`, `peak` (max |sample|), `mean` —
    * the filterable features an audio-curation pipeline screens on
    * (silence, clipping, level). Payloads the codec rejects yield NULL
    * fields (kept, countable, never silently dropped) — the same
    * corrupt-blob contract as [[decodeImage]].
    */
  def decodeAudio(media: DataFrame, codec: AudioCodec = WavCodec,
                  mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("sample_rate", IntegerType),
        StructField("channels", IntegerType),
        StructField("n_samples", LongType),
        StructField("duration_ms", DoubleType),
        StructField("rms", DoubleType),
        StructField("peak", IntegerType),
        StructField("mean", DoubleType)))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get).toSeq
        codec.decode(r.getAs[Array[Byte]](mediaIdx)) match {
          case Some((rate, ch, samples)) if samples.nonEmpty =>
            var sum = 0L; var sq = 0.0; var peak = 0
            var i = 0
            while (i < samples.length) {
              val s = samples(i)
              sum += s; sq += s.toDouble * s
              val a = math.abs(s); if (a > peak) peak = a
              i += 1
            }
            val n = samples.length
            // Seq[Any] is load-bearing: a bare Seq of mixed numerics
            // weakly-conforms every element to Double, corrupting the
            // Row's runtime types against the Int/Long schema fields
            Row.fromSeq(kept ++ Seq[Any](rate.toInt, ch, n.toLong,
              (n / ch).toDouble / rate * 1000.0,
              math.sqrt(sq / n), peak, sum.toDouble / n))
          case _ =>
            Row.fromSeq(kept ++ Seq(null, null, null, null, null, null, null))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Media table whose blobs are REAL multi-frame videos: animated GIFs
    * written by `javax.imageio`'s sequence writer, (doc_id % 5 + 2)
    * full frames each, dims as [[withGeneratedImages]]. Frame f's
    * indexed-gray raster is a DISJOINT window [f·w·h, (f+1)·w·h) of the
    * QUADRATIC sample sequence v(x) = bits 16–23 of ((x² mod 2²⁴)·φ),
    * x = doc_id·31 + f·w·h + i — so every sampled-frame statistic is
    * analytically computable (GIF is lossless over indexed data and the
    * 256-gray palette makes luminance EXACTLY the sample value, same
    * argument as the still-GIF gate), while the engine must round-trip
    * it through genuine multi-frame GIF encode → [[GifVideoCodec]]
    * demux + per-frame decode. Quadratic-high-bits rather than
    * [[genPixel]]'s low byte deliberately: the low byte of a LINEAR
    * sequence is a bijection per 256 consecutive indices, which makes
    * every frame's histogram identically uniform — a gate that could
    * not see a frame-addressing bug. The quadratic's high bits vary per
    * window (spec-pinned distinct first/last frames).
    */
  def withGeneratedGifVideo(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(
      docs.select(col("doc_id")), col("doc_id")).mapPartitions { rows =>
      JdkImageIo.ensure()
      val ramp = Array.tabulate(256)(_.toByte)
      val grayPalette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
      rows.map { r =>
        val id = r.getLong(0)
        val w = ((id % 8) + 1).toInt * 8
        val h = ((id % 6) + 1).toInt * 8
        val nFrames = ((id % 5) + 2).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val im = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          val raster = im.getRaster
          var i = 0
          while (i < w * h) {
            val x = id * 31 + f.toLong * w * h + i
            val v = ((((x * x) & 0xFFFFFFL) * 0x9E3779B9L) >> 16) & 0xFFL
            raster.setSample(i % w, i / w, 0, v.toInt)
            i += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        Row(id, bos.toByteArray, Row("gif", w, h, (nFrames * 40): Integer))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** A minimal, structurally well-formed MJPEG-in-AVI byte stream:
    * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh 'vids'/'MJPG',
    * strf BITMAPINFOHEADER}} → LIST(movi){'00dc' JPEG ...} → idx1.
    * Every size field is real and every chunk pads to even, so any
    * spec-conformant RIFF walker demuxes it — not just ours.
    */
  private def aviOf(jpegs: Array[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def le(vals: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putInt); bb.array()
    }
    def cat(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write); out.toByteArray
    }
    def fcc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cat(fcc(id), le(body.length), body,
        if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", cat(fcc(typ), children))
    val n = jpegs.length
    val avih = le(40000, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    val strh = cat(fcc("vids"), fcc("MJPG"), le(0), le(0) /*prio+lang*/,
      le(0, 1, 25, 0, n, 0, -1, 0),
      { val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putShort(0); bb.putShort(0)
        bb.putShort(w.toShort); bb.putShort(h.toShort); bb.array() })
    val strf = cat(le(40, w, h),
      { val bb = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putShort(1); bb.putShort(24); bb.array() },
      fcc("MJPG"), le(w * h * 3, 0, 0, 0, 0))
    val hdrl = list("hdrl", cat(chunk("avih", avih),
      list("strl", cat(chunk("strh", strh), chunk("strf", strf)))))
    val frames = jpegs.map(j => chunk("00dc", j))
    val movi = list("movi", cat(frames: _*))
    // idx1 offsets are relative to the 'movi' fourcc (the common
    // convention); our reader walks the list directly and never needs
    // them, but a conformant player does
    val idxBody = {
      var off = 4
      cat(frames.zip(jpegs).map { case (f, j) =>
        val e = cat(fcc("00dc"), le(0x10, off, j.length))
        off += f.length; e
      }: _*)
    }
    val body = cat(fcc("AVI "), hdrl, movi, chunk("idx1", idxBody))
    cat(fcc("RIFF"), le(body.length), body)
  }

  /** Media table whose blobs are BLOCK-STRUCTURED multi-frame videos in
    * a chosen container — the video counterpart of
    * [[withGeneratedBlockImages]], and the fixture for the video
    * near-dup + container-dispatch rows. Every variant of one doc_id
    * renders the IDENTICAL 72×64 picture sequence ((doc_id % 5) + 2
    * frames; block (gx,gy) of frame f is the md5-derived gray
    * 17·(2·(digest("id:f:gx:gy")[0] mod 8) + gx mod 2) — the image
    * fixture's formula with the frame in the key), while the BYTES
    * differ by construction:
    *
    *   - `"gif"`      — animated GIF, identity gray palette
    *   - `"gif-perm"` — the same GIF picture through a PERMUTED
    *                    palette (index j shows gray (181·j+7) mod 256,
    *                    samples inverted to compensate): byte-distinct
    *                    palette + LZW stream, pixel-identical decode —
    *                    a pure re-encode twin
    *   - `"avi"`      — MJPEG-in-AVI ([[aviOf]]), frames JPEG-encoded:
    *                    lossy, but the 8×8 block grid aligns with the
    *                    dHash cells so gradient signs survive exactly
    *                    (the q_ext_media_neardup margin argument)
    *
    * 72×64 with the 9×8 dHash grid means each hash cell averages
    * EXACTLY one constant block — the cell value IS the block value,
    * which is what makes the DuckDB oracle able to recompute every
    * per-frame hash bit analytically.
    */
  def withGeneratedBlockVideo(docs: DataFrame, container: String): DataFrame = {
    require(Set("gif", "gif-perm", "avi")(container),
      s"unsupported block-video container '$container'")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    graft.runtime.Parallelize.fanOut(
      docs.select(col("doc_id")), col("doc_id")).mapPartitions { rows =>
      JdkImageIo.ensure()
      val md = java.security.MessageDigest.getInstance("MD5")
      val perm = Array.tabulate(256)(v => (v * 181 + 7) & 0xFF) // odd mult → bijection
      val inv = new Array[Int](256)
      locally { var i = 0; while (i < 256) { inv(perm(i)) = i; i += 1 } }
      val w = 72; val h = 64
      rows.map { r =>
        val id = r.getLong(0)
        val nFrames = ((id % 5) + 2).toInt
        def frameVals(f: Int): Array[Int] = {
          val px = new Array[Int](w * h)
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 9) {
              val dig = md.digest(s"$id:$f:$gx:$gy".getBytes("UTF-8"))
              val v = 17 * (2 * ((dig(0) & 0xFF) % 8) + gx % 2)
              var y = gy * 8
              while (y < gy * 8 + 8) {
                var x = gx * 8
                while (x < gx * 8 + 8) { px(y * w + x) = v; x += 1 }
                y += 1
              }
              gx += 1
            }
            gy += 1
          }
          px
        }
        val bytes = container match {
          case "avi" =>
            val jpegs = Array.tabulate(nFrames) { f =>
              val im = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val vals = frameVals(f)
              var j = 0
              while (j < w * h) {
                val v = vals(j)
                im.setRGB(j % w, j / w, (v << 16) | (v << 8) | v)
                j += 1
              }
              val b = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(im, "jpeg", b)
              b.toByteArray
            }
            aviOf(jpegs, w, h)
          case g =>
            val permuted = g == "gif-perm"
            val ramp = Array.tabulate(256)(j =>
              (if (permuted) perm(j) else j).toByte)
            val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
            val bos = new java.io.ByteArrayOutputStream()
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("gif").next()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < nFrames) {
              val im = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
              val raster = im.getRaster
              val vals = frameVals(f)
              var i = 0
              while (i < w * h) {
                val v = vals(i)
                raster.setSample(i % w, i / w, 0, if (permuted) inv(v) else v)
                i += 1
              }
              writer.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
              f += 1
            }
            writer.endWriteSequence()
            writer.dispose()
            ios.close()
            bos.toByteArray
        }
        Row(id, bytes,
          Row(if (container == "avi") "avi" else "gif", w, h,
            (nFrames * 40): Integer))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Doc-level perceptual VIDEO signature (VERDICT r12 task 5): demux
    * via the [[VideoCodec]] seam, decode ONLY the n pinned sample
    * frames (idx_k = ⌊k·(m−1)/(n−1)⌋ — [[sampleFrameStats]]'s rule),
    * and fold their [[dhash64]]s into one `sig array<bigint>` in
    * sample order. Two re-encodes of the same animation produce the
    * same frame sequence, hence bitwise-equal signatures; near-misses
    * (mild per-frame perturbation) stay within a small aligned
    * hamming radius, which is exactly what
    * [[DedupOps.frameSigNearDupPairs]] bands on. Also emits the
    * container frame count and first sampled frame's decoded dims.
    * Undecodable payloads — or any sampled frame the codec rejects —
    * yield one row with NULL sig (kept, countable, excluded from pair
    * generation by the NULL filter, never silently dropped).
    * Partition-local decode; only n·8 bytes of hash per doc shuffle.
    */
  def videoFrameHashes(media: DataFrame, n: Int,
                       codec: VideoCodec = AutoVideoCodec,
                       mediaCol: String = "media"): DataFrame = {
    require(n >= 2, s"frame sampling needs n >= 2, got $n")
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("n_frames", IntegerType),
        StructField("decoded_width", IntegerType),
        StructField("decoded_height", IntegerType),
        StructField("sig", ArrayType(LongType))))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      rows.map { r =>
        val kept = keepIdx.map(r.get).toSeq
        val payload = r.getAs[Array[Byte]](mediaIdx)
        codec.frameCount(payload) match {
          case Some(m) =>
            val picks =
              if (m <= n) 0 until m
              else (0 until n).map(k => k * (m - 1) / (n - 1)).distinct
            val decoded = codec.decodeFrames(payload, picks)
            if (decoded.exists(_.isEmpty))
              Row.fromSeq(kept ++ Seq[Any](m, null, null, null))
            else {
              val ds = decoded.map(_.get)
              Row.fromSeq(kept ++ Seq[Any](m, ds.head._1, ds.head._2,
                ds.map { case (fw, fh, px) => dhash64(fw, fh, px) }))
            }
          case None =>
            Row.fromSeq(kept ++ Seq(null, null, null, null))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** REAL frame sampling through the [[VideoCodec]] seam: per payload,
    * read the frame COUNT from the container directory, pick `n`
    * evenly-spaced frame indices by the pinned rule
    * idx_k = ⌊k·(frames−1)/(n−1)⌋ (k = 0..n−1; all frames when the
    * video has ≤ n), decode ONLY those, and emit one row per sampled
    * frame with the true decoded dims and the shared 16-bin luminance
    * histogram. Only selected frames are ever decoded — the
    * demux-then-decode-selected shape that keeps corpus-scale frame
    * sampling ∝ n, not ∝ total frames. Payloads the codec rejects
    * yield ONE row with NULL frame fields (kept, countable, never
    * silently dropped) — the corrupt-blob contract of every decode op
    * here.
    */
  def sampleFrameStats(media: DataFrame, n: Int,
                       codec: VideoCodec = GifVideoCodec,
                       mediaCol: String = "media"): DataFrame = {
    require(n >= 2, s"frame sampling needs n >= 2, got $n")
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(
      inSchema.fields.filterNot(_.name == mediaCol) ++ Seq(
        StructField("n_frames", IntegerType),
        StructField("frame_idx", IntegerType),
        StructField("decoded_width", IntegerType),
        StructField("decoded_height", IntegerType),
        StructField("features", ArrayType(DoubleType))))
    val keepIdx = inSchema.fields.zipWithIndex
      .filterNot(_._1.name == mediaCol).map(_._2)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val kept = keepIdx.map(r.get).toSeq
        val payload = r.getAs[Array[Byte]](mediaIdx)
        codec.frameCount(payload) match {
          case Some(m) =>
            val picks =
              if (m <= n) 0 until m
              else (0 until n).map(k => k * (m - 1) / (n - 1)).distinct
            picks.zip(codec.decodeFrames(payload, picks)).map {
              case (idx, Some((w, h, px))) =>
                Row.fromSeq(kept ++ Seq[Any](m, idx, w, h,
                  lumaHistogram(px).toSeq))
              case (idx, None) =>
                Row.fromSeq(kept ++ Seq[Any](m, idx, null, null, null))
            }
          case None =>
            Seq(Row.fromSeq(kept ++ Seq(null, null, null, null, null)))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Container CATEGORY by magic bytes — the dispatch rule
    * [[mediaChecks]] validates against: video (GIF — stills are 1-frame
    * videos — and RIFF-AVI), audio (RIFF-WAVE, FORM-AIFF, .snd), image
    * (PNG, BMP, JPEG). None = no known container claims the bytes.
    */
  private[ext] def sniffCategory(p: Array[Byte]): Option[String] =
    if (p == null || p.length < 4) None
    else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') Some("video")
    else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' ') Some("video")
    else if (RiffWavCodec.matches(p) || AiffCodec.matches(p) || AuCodec.matches(p))
      Some("audio")
    else if ((p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some("image")
    else if (p(0) == 'B' && p(1) == 'M') Some("image")
    else if ((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) Some("image")
    else None

  /** Codec-validation checks for a media ingest quarantine (VERDICT r13
    * task 5) in the `checks` shape every quarantine sink takes
    * (name → predicate that must HOLD; first failing name becomes
    * `reject_reason`):
    *
    *   1. `media_present` — non-null, non-empty payload;
    *   2. `known_container` — some container's magic bytes claim it
    *      ([[sniffCategory]]);
    *   3. `media_decodes` — the claimed container's own codec really
    *      demuxes/decodes it ([[AutoVideoCodec.frameCount]] /
    *      [[AutoAudioCodec]] / [[ImageIoCodec]]), so a truncated or
    *      byte-corrupted payload behind a valid magic still rejects.
    *
    * With these composed into `corpusIngestQuarantineRoutedSink`,
    * corrupt media lands in `__rejects` carrying the first failing
    * check's name instead of silently featurizing as NULL rows
    * downstream. The decode probe is a Scala UDF by necessity (the
    * codec seams are JVM parsers, not Column expressions); its cost is
    * one decode per INGESTED row, on the executor, partition-local.
    */
  def mediaChecks(mediaCol: String = "media"): Seq[(String, org.apache.spark.sql.Column)] = {
    val knownUdf = udf((p: Array[Byte]) => sniffCategory(p).isDefined)
    val decodesUdf = udf((p: Array[Byte]) => sniffCategory(p) match {
      case Some("video") => AutoVideoCodec.frameCount(p).isDefined
      case Some("audio") => AutoAudioCodec.decode(p).isDefined
      case Some("image") => ImageIoCodec.decode(p).isDefined
      case _             => false
    })
    Seq(
      ("media_present", col(mediaCol).isNotNull && length(col(mediaCol)) > 0),
      ("known_container", knownUdf(col(mediaCol))),
      ("media_decodes", decodesUdf(col(mediaCol))))
  }

  /** ONE-decode validation + perceptual signature for a media ingest
    * path (VERDICT r14 task 1's decode-once fix: [[mediaChecks]]'s
    * `media_decodes` fully decodes to return a boolean and downstream
    * featurization then decodes the SAME payload again — two decodes
    * per ingested row in a composed sink). This op sniffs the container
    * category, decodes through the claimed codec ONCE, and emits in the
    * same pass:
    *
    *   - `media_category string` — [[sniffCategory]]'s claim (NULL when
    *     no container's magic matches: the `known_container` reject);
    *   - `media_ok boolean` — the claimed codec really demuxes/decodes
    *     it, with semantics IDENTICAL to [[mediaChecks]]'s
    *     `media_decodes` (video: container directory walks +
    *     frame count reads; audio/image: full decode succeeds) —
    *     spec-gated equivalent on the mixed fixture;
    *   - `sig bigint` — the modality's 64-bit perceptual signature, fed
    *     straight to [[graft.ext.IngestOps.bandRowsOfSigs]] hamming
    *     routing: image → [[dhash64]] of the decoded raster (exactly
    *     [[perceptualHash]]), audio → [[envelopeSig64]] over the
    *     decoded samples (exactly [[audioWindowSig]], 65 windows),
    *     video → [[dhash64]] of decoded frame 0 (the cheap first-rung
    *     video signature: re-encodes preserve every frame, so frame 0's
    *     hash survives; the precise rung is [[videoFrameHashes]] +
    *     aligned frame-sig banding). NULL when the payload is invalid
    *     OR decodes but carries no signal (audio shorter than 65
    *     samples, a video whose frame 0 fails decode) — NULL-sig valid
    *     rows ride into the corpus with no dedup signal, the
    *     [[graft.ext.IngestOps.appendDedupHammingRouted]] contract.
    *
    * Partition-local, map-only, one codec decode per row; the payload
    * column rides through untouched (the sink stores it).
    */
  def mediaValidateAndSig(media: DataFrame,
                          mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("media_category", StringType),
      StructField("media_ok", BooleanType, nullable = false),
      StructField("sig", LongType)))
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](mediaIdx)
        val cat = if (payload == null || payload.isEmpty) None
                  else sniffCategory(payload)
        val (ok, sig): (Boolean, Any) = cat match {
          case Some("image") => ImageIoCodec.decode(payload) match {
            case Some((w, h, px)) => (true, dhash64(w, h, px))
            case None             => (false, null)
          }
          case Some("audio") => AutoAudioCodec.decode(payload) match {
            case Some((_, _, samples)) =>
              (true, if (samples.length >= 65) envelopeSig64(samples, 65) else null)
            case None => (false, null)
          }
          case Some("video") => AutoVideoCodec.frameCount(payload) match {
            case Some(_) =>
              (true, AutoVideoCodec.decodeFrame(payload, 0)
                .map { case (w, h, px) => dhash64(w, h, px) }.orNull)
            case None => (false, null)
          }
          case _ => (false, null)
        }
        Row.fromSeq(r.toSeq ++ Seq[Any](cat.orNull, ok, sig))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** The mixed-media fixture's class selector: `(⌊id/10⌋ + id) mod 6`.
    * NOT a bare `id mod 6` — the registry's pairwise subset is the
    * multiples of 10, on which `id mod 6` cycles through only {0, 2, 4}
    * and half the corruption classes would never be exercised; this
    * selector covers all six classes on both dense ids and multiples
    * of 10 (a DuckDB oracle states it as `(doc_id // 10 + doc_id) % 6`).
    */
  def mixedMediaClass(id: Long): Long = (id / 10 + id) % 6

  private def mixedMediaClassCol: org.apache.spark.sql.Column =
    (expr("doc_id div 10") + col("doc_id")) % 6

  /** Mixed valid/corrupt media fixture for the quarantine gate — the
    * validation outcome is ANALYTIC BY CONSTRUCTION
    * ([[mixedMediaClass]] picks the class), so a DuckDB oracle states
    * each row's expected route and reason without re-implementing the
    * codecs:
    *
    *   - 0: real WAV           → corpus
    *   - 1: real animated GIF  → corpus
    *   - 2: real PNG           → corpus
    *   - 3: unknown magic ("XX"-prefixed md5 junk) → `known_container`
    *   - 4: TRUNCATED AVI (valid RIFF/AVI magic, chunks cut mid-walk)
    *        → `media_decodes`
    *   - 5: TRUNCATED WAV (valid RIFF/WAVE magic, body gone)
    *        → `media_decodes`
    */
  def withGeneratedMixedMedia(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"))
    def ofClass(k: Int) = ids.filter(mixedMediaClassCol === k)
    val valid = Seq(
      withGeneratedAudioVariants(ofClass(0), "wav"),
      withGeneratedBlockVideo(ofClass(1), "gif"),
      withGeneratedBlockImages(ofClass(2), "png"))
      .map(_.select(col("doc_id"), col("media")))
    val junk = ofClass(3)
      .select(col("doc_id"),
        concat(lit("XX".getBytes("UTF-8")),
          unhex(md5(col("doc_id").cast("string")))).as("media"))
    val cutAvi = withGeneratedBlockVideo(ofClass(4), "avi")
      .select(col("doc_id"), expr("substring(media, 1, 200)").as("media"))
    val cutWav = withGeneratedAudioVariants(ofClass(5), "wav")
      .select(col("doc_id"), expr("substring(media, 1, 16)").as("media"))
    (valid ++ Seq(junk, cutAvi, cutWav)).reduce(_.unionByName(_))
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
