package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sp: SparkSession = spark

  private def docs = Seq(
    (0L, "an image-bearing document"),
    (1L, "an audio-bearing document")
  ).toDF("doc_id", "text")

  test("attachSyntheticMedia produces the typed media struct") {
    val m = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
    val f = m.select("media.*").schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f == Map("bytes" -> "binary", "mime" -> "string", "width" -> "int",
      "height" -> "int", "duration_ms" -> "bigint"))
    val mimes = m.select("media.mime").as[String].collect().toSet
    assert(mimes == Set("image/png", "audio/wav"))
  }

  test("decodeFeatures is deterministic, batch-shaped, right-dimensional") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val feats = Multimodal.decodeFeatures(media, dim = 16).collect()
    assert(feats.length == 2)
    assert(feats.forall(_.features.length == 16))
    val again = Multimodal.decodeFeatures(media, dim = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resizeMedia caps output at the geometry budget, deterministic") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val small = Multimodal.resizeMedia(media, 8, 8).collect() // budget = 1
    assert(small.forall(_.bytes.length == 1))
    val big = Multimodal.resizeMedia(media, 1000, 1000).collect() // budget ≥ payload
    assert(big.find(_.id == 0L).get.bytes.toSeq ==
      "an image-bearing document".getBytes("UTF-8").toSeq)
    assert(big.forall(r => r.width == 1000 && r.height == 1000))
  }

  test("sampleFrames yields n frames per item covering the payload") {
    val media = Multimodal.attachSyntheticMedia(docs, "doc_id", "text")
      .select(col("doc_id"), col("media.bytes")).as[(Long, Array[Byte])]
    val frames = Multimodal.sampleFrames(media, n = 4).collect()
    assert(frames.count(_.id == 0L) == 4)
    assert(frames.map(_.frameIdx).toSet == Set(0, 1, 2, 3))
    val total = frames.filter(_.id == 0L).map(_.frame.length).sum
    assert(total >= "an image-bearing document".getBytes.length)
  }

  test("PpmCodec: encode→decode round-trips geometry and exact pixels") {
    val bytes = Multimodal.PpmCodec.encode(3, 2, (x, y) => (x * 10, y * 100, x + y))
    val (w, h, px) = Multimodal.PpmCodec.decode(bytes)
    assert(w == 3 && h == 2)
    assert(px.length == 18)
    // pixel (2,1): r=20, g=100, b=3 at offset (1*3+2)*3
    val off = (1 * 3 + 2) * 3
    assert((px(off) & 0xff, px(off + 1) & 0xff, px(off + 2) & 0xff) == ((20, 100, 3)))
  }

  test("PpmCodec: header grammar (comments, whitespace) and malformed rejects") {
    val body = Array.fill(3 * 1 * 1)(7.toByte)
    val withComment = ("P6\n# a comment line\n 1\t1 \n255\n".getBytes("US-ASCII") ++ body)
    val (w, h, px) = Multimodal.PpmCodec.decode(withComment)
    assert(w == 1 && h == 1 && px.toSeq == body.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode("P5\n1 1\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode("P6\n2 2\n255\n".getBytes("US-ASCII")) // truncated
    }
  }

  test("decodeImageStats: real distributed decode, exact channel means") {
    val imgs = spark.createDataset(Seq(
      (1L, Multimodal.PpmCodec.encode(2, 2, (x, y) => (255, 0, x + y))),
      (2L, Multimodal.PpmCodec.encode(4, 1, (x, _) => (x, x, x)))))
    val out = Multimodal.decodeImageStats(imgs).collect()
      .map(s => s.id -> s).toMap
    assert(out(1L).width == 2 && out(1L).height == 2)
    assert(out(1L).mean_r == 255.0 && out(1L).mean_g == 0.0)
    assert(out(1L).mean_b == (0 + 1 + 1 + 2) / 4.0)
    assert(out(2L).mean_r == (0 + 1 + 2 + 3) / 4.0)
  }

  test("ImageIoCodec: PNG round-trips pixels losslessly and deterministically") {
    val pixel = (x: Int, y: Int) => ((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 3) % 256)
    val png = Multimodal.ImageIoCodec.encodePng(9, 7, pixel)
    // PNG magic, then a real decode back to the exact pixel function
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(Multimodal.ImageIoCodec.encodePng(9, 7, pixel).toSeq == png.toSeq)
    val st = Multimodal.ImageIoCodec.decodeStats(5L, png)
    assert(st.width == 9 && st.height == 7)
    val n = 63.0
    val exp = (for (y <- 0 until 7; x <- 0 until 9) yield pixel(x, y))
    assert(st.mean_r == exp.map(_._1).sum / n)
    assert(st.mean_g == exp.map(_._2).sum / n)
    assert(st.mean_b == exp.map(_._3).sum / n)
  }

  test("ImageIoCodec: JPEG decode preserves geometry and channel means within tolerance") {
    val w = 16; val h = 12
    val pixel = (x: Int, y: Int) => (32 + x * 192 / (w - 1), 32 + y * 192 / (h - 1), 100)
    val jpg = Multimodal.ImageIoCodec.encodeJpeg(w, h, 0.9f, pixel)
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // JPEG SOI
    val st = Multimodal.ImageIoCodec.decodeStats(7L, jpg)
    assert(st.width == w && st.height == h)
    val exp = (for (y <- 0 until h; x <- 0 until w) yield pixel(x, y))
    val n = (w * h).toDouble
    assert(math.abs(st.mean_r - exp.map(_._1).sum / n) <= 3.0)
    assert(math.abs(st.mean_g - exp.map(_._2).sum / n) <= 3.0)
    assert(math.abs(st.mean_b - exp.map(_._3).sum / n) <= 3.0)
  }

  test("WavCodec: encode→decode round-trips format, frames, and exact samples") {
    // stereo, distinct per-channel waveforms — proves interleaving order
    val wav = Multimodal.WavCodec.encode(12000, 2, 100,
      (ch, i) => (if (ch == 0) i * 3 - 50 else -i * 2 + 7).toShort)
    // RIFF....WAVE container magic
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val st = Multimodal.WavCodec.decodeStats(9L, wav)
    assert(st.sample_rate == 12000 && st.channels == 2 && st.n_frames == 100L)
    assert(st.sum_l == (0 until 100).map(i => i * 3 - 50).sum.toLong)
    assert(st.sum_r == (0 until 100).map(i => -i * 2 + 7).sum.toLong)
    val sqL = (0 until 100).map(i => (i * 3 - 50).toLong * (i * 3 - 50)).sum
    assert(st.rms_l == math.sqrt(sqL.toDouble / 100))
    // deterministic encoder
    assert(Multimodal.WavCodec.encode(12000, 2, 100,
      (ch, i) => (if (ch == 0) i * 3 - 50 else -i * 2 + 7).toShort).toSeq == wav.toSeq)
  }

  test("WavCodec: full-scale negative amplitudes survive byte-order round-trip") {
    val extremes = Array[Short](Short.MinValue, -1, 1, Short.MaxValue)
    val wav = Multimodal.WavCodec.encode(8000, 1, 4, (_, i) => extremes(i))
    val st = Multimodal.WavCodec.decodeStats(1L, wav)
    assert(st.channels == 1 && st.n_frames == 4L)
    assert(st.sum_l == (-32768L - 1L + 1L + 32767L) && st.sum_r == 0L)
  }

  test("WavCodec: non-audio payload fails fast with the id in the error") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decodeStats(77L, "definitely not a wav".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("77"))
  }

  test("decodeAudioStats: real distributed decode of WAV payloads") {
    val wavs = spark.createDataset(Seq(
      (1L, Multimodal.WavCodec.encode(8000, 2, 10, (ch, i) => (ch * 100 + i).toShort)),
      (2L, Multimodal.WavCodec.encode(16000, 2, 20, (_, _) => 5.toShort))))
    val out = Multimodal.decodeAudioStats(wavs).collect().map(s => s.id -> s).toMap
    assert(out(1L).sample_rate == 8000 && out(1L).n_frames == 10L)
    assert(out(1L).sum_l == (0 until 10).sum.toLong)
    assert(out(1L).sum_r == (0 until 10).map(_ + 100).sum.toLong)
    assert(out(2L).sample_rate == 16000 && out(2L).sum_l == 100L && out(2L).sum_r == 100L)
    assert(out(2L).rms_l == 5.0)
  }

  test("ImageIoCodec: non-image payload fails fast with the id in the error") {
    val e = intercept[Exception] {
      Multimodal.ImageIoCodec.decodeStats(42L, "not an image at all".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("42"))
  }

  test("decodeImageStatsIo: distributed decode of mixed PNG and JPEG payloads") {
    val imgs = spark.createDataset(Seq(
      (1L, Multimodal.ImageIoCodec.encodePng(4, 4, (_, _) => (200, 100, 50))),
      (2L, Multimodal.ImageIoCodec.encodeJpeg(8, 8, 0.9f, (_, _) => (60, 120, 180)))))
    val out = Multimodal.decodeImageStatsIo(imgs).collect().map(s => s.id -> s).toMap
    assert(out(1L).width == 4 && out(1L).mean_r == 200.0 &&
      out(1L).mean_g == 100.0 && out(1L).mean_b == 50.0)
    assert(out(2L).width == 8 && math.abs(out(2L).mean_g - 120.0) <= 3.0)
  }

  test("AviMjpegCodec: encode→decode round-trips container metadata and real frames") {
    val avi = Multimodal.AviMjpegCodec.encode(16, 12, 25, 4, 0.9f,
      (f, _, _) => (40 + f * 50, 90, 140))
    assert(new String(avi.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val (info, frames) = Multimodal.AviMjpegCodec.decode(avi)
    assert(info.width == 16 && info.height == 12 && info.nFrames == 4 &&
      info.usPerFrame == 40000)
    assert(frames.length == 4)
    // each frame is a genuine JPEG whose constant red channel tracks f
    frames.zipWithIndex.foreach { case (jpeg, f) =>
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8) // JPEG SOI
      val st = Multimodal.ImageIoCodec.decodeStats(f.toLong, jpeg)
      assert(st.width == 16 && st.height == 12)
      assert(math.abs(st.mean_r - (40 + f * 50)) <= 3.0, s"frame $f mean_r ${st.mean_r}")
    }
    // deterministic encoder
    assert(Multimodal.AviMjpegCodec.encode(16, 12, 25, 4, 0.9f,
      (f, _, _) => (40 + f * 50, 90, 140)).toSeq == avi.toSeq)
  }

  test("AviMjpegCodec: odd-length frames exercise even-byte chunk padding") {
    // force varying frame payload lengths; the parser must stay aligned
    // through odd-length chunks or every later frame misparses
    val avi = Multimodal.AviMjpegCodec.encode(8, 8, 10, 5, 0.8f,
      (f, x, y) => ((x * 37 + f * 91) % 256, (y * 53 + f) % 256, (x * y + f * 7) % 256))
    val (info, frames) = Multimodal.AviMjpegCodec.decode(avi)
    assert(info.nFrames == 5 && frames.length == 5)
    frames.foreach(j => assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8))
  }

  test("AviMjpegCodec: truncated and non-AVI payloads fail fast") {
    intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode("not remotely an avi".getBytes("UTF-8"))
    }
    val avi = Multimodal.AviMjpegCodec.encode(8, 8, 10, 2, 0.9f, (_, _, _) => (1, 2, 3))
    intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(java.util.Arrays.copyOfRange(avi, 0, avi.length / 2))
    }
  }

  test("AviMjpegCodec: a corrupt huge chunk-size field fails fast, never loops") {
    // size 0xFFFFFFF8 once wrapped to Int -8 and froze the chunk cursor
    // in place — a hung executor task; it must be a crisp parse error
    val avi = Multimodal.AviMjpegCodec.encode(8, 8, 10, 2, 0.9f, (_, _, _) => (9, 9, 9))
    val evil = avi.clone()
    // find the first '00dc' chunk and poison its size field
    val idx = evil.sliding(4).indexWhere(w => new String(w.toArray, "US-ASCII") == "00dc")
    assert(idx > 0)
    evil(idx + 4) = 0xf8.toByte; evil(idx + 5) = 0xff.toByte
    evil(idx + 6) = 0xff.toByte; evil(idx + 7) = 0xff.toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.AviMjpegCodec.decode(evil)
    }
    assert(e.getMessage.contains("corrupt") || e.getMessage.contains("truncated"))
  }

  test("AviMjpegCodec: 500 seeded byte-mutations never hang, OOB, or leak a raw error") {
    // parser contract under corruption: for ANY mutation the decode must
    // terminate promptly with either a successful parse or a descriptive
    // IllegalArgumentException — no index errors, no infinite walks
    val avi = Multimodal.AviMjpegCodec.encode(8, 6, 10, 3, 0.85f,
      (f, x, y) => ((x * 40 + f) % 256, (y * 50) % 256, 128))
    val rnd = new scala.util.Random(20260814L)
    (1 to 500).foreach { i =>
      val evil = avi.clone()
      // corrupt 1..4 bytes anywhere (headers, sizes, fourccs, payload)
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        evil(rnd.nextInt(evil.length)) = rnd.nextInt(256).toByte
      }
      try { Multimodal.AviMjpegCodec.decode(evil); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"mutation $i leaked ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  test("decodeVideoStats: distributed per-frame decode with container cross-checks") {
    val vids = spark.createDataset(Seq(
      (1L, Multimodal.AviMjpegCodec.encode(16, 8, 10, 3, 0.9f, (f, _, _) => (f * 80, 100, 50))),
      (2L, Multimodal.AviMjpegCodec.encode(8, 8, 25, 2, 0.9f, (_, _, _) => (10, 20, 30)))))
    val out = Multimodal.decodeVideoStats(vids).collect()
    assert(out.count(_.id == 1L) == 3 && out.count(_.id == 2L) == 2)
    val f2 = out.find(r => r.id == 1L && r.frame_idx == 2).get
    assert(f2.width == 16 && f2.height == 8 && f2.n_frames == 3 && f2.us_per_frame == 100000)
    assert(math.abs(f2.mean_r - 160.0) <= 3.0)
  }

  test("sampleVideoFrames: stride extraction yields real JPEG frame payloads") {
    val vids = spark.createDataset(Seq(
      (7L, Multimodal.AviMjpegCodec.encode(8, 8, 10, 6, 0.9f, (f, _, _) => (f * 40, 0, 0)))))
    val frames = Multimodal.sampleVideoFrames(vids, stride = 2).collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 2, 4))
    frames.foreach(fr => assert((fr.frame(0) & 0xff) == 0xff && (fr.frame(1) & 0xff) == 0xd8))
  }

  test("boxResizePng: exact integer area average, full re-encode round-trip") {
    // 4x2 image → 2x1: each output pixel is floor mean of its 2x2 block
    val src = Multimodal.ImageIoCodec.encodePng(4, 2, (x, y) => {
      val p = y * 4 + x
      (p * 10, 255 - p * 20, (p * p) % 256)
    })
    val out = Multimodal.ImageIoCodec.boxResizePng(src, 2, 2)
    val st = Multimodal.ImageIoCodec.decodeStats(0L, out)
    assert(st.width == 2 && st.height == 1)
    // block(0): p∈{0,1,4,5}; block(1): p∈{2,3,6,7} — floor means, then
    // the 2-pixel image mean divides their exact sum once
    def blockMean(ps: Seq[Int], f: Int => Int) = ps.map(f).sum / 4
    val r = Seq(blockMean(Seq(0, 1, 4, 5), _ * 10), blockMean(Seq(2, 3, 6, 7), _ * 10))
    assert(st.mean_r == r.sum / 2.0)
    val g = Seq(blockMean(Seq(0, 1, 4, 5), 255 - _ * 20), blockMean(Seq(2, 3, 6, 7), 255 - _ * 20))
    assert(st.mean_g == g.sum / 2.0)
  }

  test("resizeImages: distributed real resize rejects non-divisible geometry") {
    val ok = spark.createDataset(Seq(
      (1L, Multimodal.ImageIoCodec.encodePng(8, 4, (x, y) => (x * 30, y * 60, 128)))))
    val rs = Multimodal.resizeImages(ok, 4, 4).collect()
    assert(rs.head.width == 2 && rs.head.height == 1)
    val bad = spark.createDataset(Seq(
      (2L, Multimodal.ImageIoCodec.encodePng(9, 4, (_, _) => (1, 2, 3)))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizeImages(bad, 4, 4).collect()
    }
    assert(e.getMessage.contains("not divisible") ||
      e.getCause != null && e.getCause.getMessage.contains("not divisible"))
  }

  test("dHash64: brightness-invariant, content-sensitive, exact grid arithmetic") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    def png(f: (Int, Int) => (Int, Int, Int)) =
      Multimodal.ImageIoCodec.encodePng(36, 32, f)
    def base(x: Int, y: Int) = {
      val i = (y * 36 + x).toLong
      ((13 * (i + 17) * (i + 29) % 256).toInt,
        (29 * (i + 31) * (i + 7) % 256).toInt,
        (7 * (i + 13) * (i + 37) % 256).toInt)
    }
    // +40 uniform brightness, clamped: differences survive except at
    // clamp saturation — hamming must stay small; a DIFFERENT image is far
    def brighter(x: Int, y: Int) = {
      val (r, g, b) = base(x, y)
      (math.min(r + 40, 255), math.min(g + 40, 255), math.min(b + 40, 255))
    }
    def other(x: Int, y: Int) = {
      val i = (y * 36 + x).toLong
      ((41 * (i + 3) * (i + 11) % 256).toInt,
        (17 * (i + 19) * (i + 23) % 256).toInt,
        (31 * (i + 43) * (i + 5) % 256).toInt)
    }
    val hashed = Multimodal.dHash64(spark.createDataset(Seq(
        (0L, png(base)), (1L, png(brighter)), (2L, png(other)))))
      .collect().map(d => d.id -> Seq(d.h0, d.h1, d.h2, d.h3)).toMap
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(ham(hashed(0L), hashed(1L)) <= 8,
      s"brightness shift must barely move dHash: ${ham(hashed(0L), hashed(1L))}")
    assert(ham(hashed(0L), hashed(2L)) >= 16,
      s"different content must be far: ${ham(hashed(0L), hashed(2L))}")
    // identical image → identical hash (and h fields are 16-bit clean)
    val again = Multimodal.dHash64(spark.createDataset(Seq((9L, png(base)))))
      .collect().head
    assert(Seq(again.h0, again.h1, again.h2, again.h3) == hashed(0L))
    hashed.values.flatten.foreach(v => assert(v >= 0 && v <= 0xffff))
    // non-divisible geometry fails loudly
    val bad = spark.createDataset(Seq(
      (3L, Multimodal.ImageIoCodec.encodePng(35, 32, (_, _) => (1, 2, 3)))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.dHash64(bad).collect()
    }
    assert(e.getMessage.contains("not divisible") ||
      e.getCause != null && e.getCause.getMessage.contains("not divisible"))
  }

  test("detectTones: Goertzel finds the synthesized frequency with a dominant margin") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val cands = Seq(440.0, 880.0, 1320.0)
    // 8000 Hz, 800 frames → 10 Hz bins; 440/880/1320 all on-bin
    def tone(f: Double) = Multimodal.WavCodec.encode(8000, 1, 800,
      (_, i) => (10000.0 * math.sin(2.0 * math.Pi * f * i / 8000.0)).toShort)
    val media = spark.createDataset(Seq(
      (0L, tone(440.0)), (1L, tone(880.0)), (2L, tone(1320.0))))
    val out = Multimodal.detectTones(media, cands).collect()
      .map(t => t.id -> t).toMap
    assert(out(0L).best_idx == 0 && out(1L).best_idx == 1 && out(2L).best_idx == 2)
    out.values.foreach(t => assert(t.margin > 100.0,
      s"pure tone must dominate its bin: $t"))
    // stereo payload, channel-0 analysis: tone on channel 0, silence on 1
    val stereo = spark.createDataset(Seq((3L,
      Multimodal.WavCodec.encode(8000, 2, 800, (ch, i) =>
        if (ch == 0) (10000.0 * math.sin(2.0 * math.Pi * 880.0 * i / 8000.0)).toShort
        else 0.toShort))))
    assert(Multimodal.detectTones(stereo, cands).collect().head.best_idx == 1)
  }
}
