package graft.dev

/** Throwaway empirical probe (r19, guide §1.1): does the block-image
  * generate→encode→decode→hash loop scale with threads, or convoy on a
  * JVM-global lock the way `AudioSystem` did (r18)? Prints per-thread
  * and total throughput at 1/8/32 threads for each stage in isolation:
  *   gen    = raster paint only (no ImageIO)
  *   enc    = + ImageIO.write(png|jpeg|bmp)
  *   dec    = ImageIO.read of pre-encoded bytes
  *   hash   = dhash64 over pre-decoded pixels
  * Usage: runMain graft.dev.ImageIoScaleProbe [itersPerThread]
  */
object ImageIoScaleProbe {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val iters = args.headOption.map(_.toInt).getOrElse(300)

    def blockImage(id: Long): java.awt.image.BufferedImage = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val im = new java.awt.image.BufferedImage(72, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
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
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos); bos.toByteArray
    }

    val pngBytes = enc(blockImage(7L), "png")

    def timed(name: String, threads: Int)(work: Long => Unit): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < iters) { work(t.toLong * 100000 + i); i += 1 }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val tot = threads.toLong * iters
      println(f"$name%-10s threads=$threads%2d  ${tot / sec}%9.0f ops/s total  ${tot / sec / threads}%9.0f ops/s/thread")
    }

    for (round <- 1 to 2; threads <- Seq(1, 8, 32)) {
      if (round == 2) println("--- warmed ---")
      timed("gen", threads)(id => { val _ = blockImage(id) })
      timed("gen+png", threads)(id => { val _ = enc(blockImage(id), "png") })
      timed("gen+jpeg", threads)(id => { val _ = enc(blockImage(id), "jpeg") })
      timed("gen+bmp", threads)(id => { val _ = enc(blockImage(id), "bmp") })
      timed("dec(png)", threads)(_ => {
        val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pngBytes))
        val _ = im.getWidth
      })
      timed("dec+hash", threads)(_ => {
        graft.ext.ImageIoCodec.decode(pngBytes).foreach { case (w, h, px) =>
          val _ = graft.ext.MultimodalOps.dhash64(w, h, px)
        }
      })
    }
  }
}
