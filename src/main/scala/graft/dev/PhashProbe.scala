package graft.dev

import graft.ext.{ImageIoCodec, MultimodalOps}

/** Throwaway empirical probe: distribution of dHash hamming distance
  * between a generated image's lossless encoding and its JPEG
  * re-encode, plus the cross-image distance floor — the two numbers
  * that decide whether q_ext_media_neardup's analytic oracle
  * (3 encodings collapse to exactly 1 survivor per doc) can hold.
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600)
    def genPixel(docId: Long, i: Int): Int =
      (((docId * 31 + i) * 0x9E3779B9L) & 0xFFFFFFL).toInt
    def imageOf(id: Long): java.awt.image.BufferedImage = {
      val w = ((id % 8 + 1) * 8).toInt; val h = ((id % 6 + 1) * 8).toInt
      val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < w * h) { im.setRGB(i % w, i / w, genPixel(id, i)); i += 1 }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos); bos.toByteArray
    }
    def ph(bytes: Array[Byte]): Long = {
      val (w, h, px) = ImageIoCodec.decode(bytes).get
      MultimodalOps.dhash64(w, h, px)
    }
    val ids = (0 until n).map(_.toLong * 10)
    val pngH = ids.map(id => id -> ph(enc(imageOf(id), "png"))).toMap
    val jpgD = ids.map(id => java.lang.Long.bitCount(pngH(id) ^ ph(enc(imageOf(id), "jpeg"))))
    val bmpD = ids.map(id => java.lang.Long.bitCount(pngH(id) ^ ph(enc(imageOf(id), "bmp"))))
    println(s"jpeg hamming: min ${jpgD.min} max ${jpgD.max} " +
      s"mean ${jpgD.sum.toDouble / n} p99 ${jpgD.sorted.apply((n * 0.99).toInt)}")
    println(s"jpeg hist: ${jpgD.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1).mkString(" ")}")
    println(s"bmp  hamming: min ${bmpD.min} max ${bmpD.max}")
    // cross-image floor over all pairs of the probe set
    val hs = pngH.values.toArray
    var minCross = 64
    var i = 0
    while (i < hs.length) {
      var j = i + 1
      while (j < hs.length) {
        val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
        if (d < minCross) minCross = d
        j += 1
      }
      i += 1
    }
    println(s"cross-image min hamming over ${hs.length} hashes: $minCross")

    // block generator: the fixture the registered row actually uses
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def blockImage(id: Long): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (gy <- 0 until 8; gx <- 0 until 9) {
        val dig = mdig.digest(s"$id:$gx:$gy".getBytes("UTF-8"))
        val v = 17 * (2 * ((dig(0) & 0xFF) % 8) + gx % 2)
        val rgb = (v << 16) | (v << 8) | v
        for (y <- gy * 8 until gy * 8 + 8; x <- gx * 8 until gx * 8 + 8) im.setRGB(x, y, rgb)
      }
      im
    }
    def expectedHash(id: Long): Long = {
      def v(gx: Int, gy: Int): Int = {
        val dig = mdig.digest(s"$id:$gx:$gy".getBytes("UTF-8"))
        17 * (2 * ((dig(0) & 0xFF) % 8) + gx % 2)
      }
      var out = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (v(gx, gy) < v(gx + 1, gy)) out |= (1L << (gy * 8 + gx))
      out
    }
    val bids = (0 until n).map(_.toLong * 10)
    val bPng = bids.map(id => id -> ph(enc(blockImage(id), "png"))).toMap
    val bJpgD = bids.map(id => java.lang.Long.bitCount(bPng(id) ^ ph(enc(blockImage(id), "jpeg"))))
    val bBmpD = bids.map(id => java.lang.Long.bitCount(bPng(id) ^ ph(enc(blockImage(id), "bmp"))))
    val analyticMiss = bids.count(id => bPng(id) != expectedHash(id))
    println(s"block jpeg hamming: min ${bJpgD.min} max ${bJpgD.max}")
    println(s"block bmp  hamming: min ${bBmpD.min} max ${bBmpD.max}")
    println(s"block png-vs-analytic mismatches: $analyticMiss / $n")
    val bhs = bPng.values.toArray
    var bMinCross = 64
    var bi = 0
    while (bi < bhs.length) {
      var bj = bi + 1
      while (bj < bhs.length) {
        val d = java.lang.Long.bitCount(bhs(bi) ^ bhs(bj))
        if (d < bMinCross) bMinCross = d
        bj += 1
      }
      bi += 1
    }
    println(s"block cross-image min hamming over ${bhs.length} hashes: $bMinCross")
  }
}
