package graft.tools

/** The image twin of [[AudioProbe]] (r11): `ImageIO.read(InputStream)`
  * defaults to `useCache = true`, which backs every decode with a
  * `FileCacheImageInputStream` — a TEMP FILE created, written, and
  * deleted PER BLOB. At sf10 the real-image phash query decodes 500 k
  * half-kilobyte PNGs twice (min-of-2), so the default turns a
  * memory-only parse into a million filesystem round-trips. Measures
  * decode µs/op and 1/8/32-thread aggregate throughput with the cache
  * on vs off; run before changing the codec — measure, don't guess. */
object ImageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 50000
    // genuine PNG blobs, same construction as syntheticPngMedia's idea:
    // small grayscale rasters from text bytes
    val blobs = Array.tabulate(64) { k =>
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < 256) {
        img.getRaster.setSample(i % 16, i / 16, 0, (k * 37 + i * 11) % 256)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(b: Array[Byte]): Unit = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) throw new IllegalStateException("decode failed")
    }

    for (cache <- Seq(true, false)) {
      javax.imageio.ImageIO.setUseCache(cache)
      var i = 0
      while (i < math.min(n / 10, 5000)) { decode(blobs(i % 64)); i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { decode(blobs(i % 64)); i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"useCache=$cache%-5s single-thread $us%8.2f us/op")
      for (threads <- Seq(8, 32)) {
        val per = n / threads
        val t1 = System.nanoTime()
        val ts = (1 to threads).map { _ =>
          val t = new Thread(() => {
            var j = 0
            while (j < per) { decode(blobs(j % 64)); j += 1 }
          })
          t.start(); t
        }
        ts.foreach(_.join())
        val sec = (System.nanoTime() - t1) / 1e9
        println(f"useCache=$cache%-5s x$threads%-2d threads   ${threads * per / sec}%9.0f op/s aggregate")
      }
    }
  }
}
