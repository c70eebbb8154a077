package graft.tools

import graft.ops.Multimodal

/** Micro-decomposition of the real-audio query cost (r11): at sf10 the
  * two `mm_real_audio_*` queries read 115/128 s — the heaviest
  * non-pagerank entries — and the suspect list is (a) the per-blob
  * `AudioSystem.write` WAV encode in [[Multimodal.syntheticWavMedia]],
  * (b) the per-blob `AudioSystem.getAudioInputStream` SPI reader scan in
  * [[Multimodal.AudioPcmCodec]], (c) the PCM frame decode itself, or
  * (d) plain Spark overhead of the 500 k-row pipeline. No JVM-wide SPI
  * cache can be assumed — measure, don't guess. Single-threaded loop,
  * no Spark: prints ns/op per stage so the per-stage shares are exact.
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val texts = Array.tabulate(64)(i => ("corpus text block " + i) * (i % 5 + 1))

    def wavOf(text: String, nSamples: Int = 256): Array[Byte] = {
      val b = text.getBytes("UTF-8")
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = if (b.isEmpty) 0 else ((b(i % b.length) & 0xff) - 128) * 256
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def wavOfCached(text: String, nSamples: Int = 256): Array[Byte] = {
      val b = text.getBytes("UTF-8")
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = if (b.isEmpty) 0 else ((b(i % b.length) & 0xff) - 128) * 256
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      Multimodal.AudioSpi.writeWave(ais, bos)
      bos.toByteArray
    }

    val blobs = Array.tabulate(64)(i => wavOf(texts(i)))
    val codec = new Multimodal.AudioPcmCodec(8)
    val meta = Multimodal.MediaMeta("wav", 0, 0, 32L)

    def time(label: String)(body: Int => Unit): Unit = {
      // warmup
      var i = 0; while (i < math.min(n / 10, 20000)) { body(i); i += 1 }
      val t0 = System.nanoTime()
      i = 0; while (i < n) { body(i); i += 1 }
      val ns = (System.nanoTime() - t0).toDouble / n
      println(f"$label%-28s ${ns / 1000}%8.2f us/op  (${n / ((System.nanoTime() - t0) / 1e9)}%9.0f op/s)")
    }

    time("encode (AudioSystem.write)") { i => wavOf(texts(i % 64)) }
    time("encode (cached writer)") { i => wavOfCached(texts(i % 64)) }
    time("decode+features (codec)") { i =>
      codec.features("audio", blobs(i % 64), meta)
    }
    time("SPI getAudioInputStream") { i =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blobs(i % 64)))
      ais.close()
    }
    time("pixels (phash input)") { i =>
      codec.pixels("audio", blobs(i % 64), meta, 8, 8)
    }

    // The number that matters for a 32-thread executor: AGGREGATE
    // throughput under concurrency. JDK 17's AudioSystem provider
    // lookup goes through a synchronized static registry
    // (JDK13Services), so per-call SPI scans serialize every task
    // thread; near-flat scaling here = global-lock contention.
    for (threads <- Seq(1, 8, 32)) {
      val per = n / threads
      val t0 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        val t = new Thread(() => {
          var i = 0
          while (i < per) { codec.features("audio", blobs(i % 64), meta); i += 1 }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"decode x$threads%-2d threads         ${threads * per / sec}%9.0f op/s aggregate")
    }
  }
}
