package graft

/** Dev probe: raw codec throughput serial vs threaded, no Spark — used
  * to locate JVM-global locks in the javax codec paths (round-14
  * optimization evidence; see OPTIMIZATION_r14.md multimodal section). */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    import graft.llm.Multimodal
    val n = 5000
    val cands = Seq(500.0, 1000.0, 1500.0, 2000.0)
    def tone(id: Long): Unit = {
      val nf = (800 + id % 3 * 80).toInt
      val f = cands((id % 4).toInt)
      val wav = Multimodal.WavCodec.encode(8000, 1, nf,
        (_, i) => (12000.0 * math.sin(2.0 * math.Pi * f * i / 8000.0)).toShort)
      val s = Multimodal.WavCodec.channelSamples(id, wav, 0)
      var best = -1; var bestP = -1.0
      cands.zipWithIndex.foreach { case (c, i) =>
        // goertzel-ish single-bin power (probe only)
        val w = 2.0 * math.Pi * c / 8000.0
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var k = 0
        while (k < s.length) { s0 = s(k) + 2.0 * math.cos(w) * s1 - s2; s2 = s1; s1 = s0; k += 1 }
        val p = s1 * s1 + s2 * s2 - 2.0 * math.cos(w) * s1 * s2
        if (p > bestP) { bestP = p; best = i }
      }
      require(best >= 0)
    }
    def png(id: Long): Unit = {
      val b = Multimodal.ImageIoCodec.encodePng(32, 24, (x, y) => {
        val p = y * 32 + x
        (((id * 31 + p * 7) % 256).toInt, ((id * 17 + p * 5) % 256).toInt,
          ((id * 13 + p * 3) % 256).toInt)
      })
      Multimodal.ImageIoCodec.decodeStats(id, b)
      ()
    }
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def par(f: Long => Unit): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      try {
        val fs = (0 until n).map(i =>
          pool.submit(new Runnable { def run(): Unit = f(i.toLong) }))
        fs.foreach(_.get())
      } finally pool.shutdown()
    }
    Seq("warm1", "serial", "parallel32").foreach {
      case "warm1" => time("tone warm")((0 until 500).foreach(i => tone(i.toLong)))
      case "serial" =>
        time("tone serial")((0 until n).foreach(i => tone(i.toLong)))
        time("png  serial")((0 until n).foreach(i => png(i.toLong)))
      case "parallel32" =>
        val watcher = new Thread(() => {
          Thread.sleep(600)
          (1 to 3).foreach { _ =>
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              if (t.getName.startsWith("pool-")) {
                println(s"[stack] ${t.getName} ${t.getState}")
                st.take(12).foreach(e => println(s"[stack]   $e"))
              }
            }
            Thread.sleep(300)
          }
        })
        watcher.setDaemon(true)
        watcher.start()
        time("tone par32")(par(tone))
        time("png  par32")(par(png))
    }
  }
}
