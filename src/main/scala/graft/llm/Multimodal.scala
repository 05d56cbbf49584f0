package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column conventions: image/audio/video as opaque binary
  * columns with typed metadata (builder mandate; SURVEY.md §7 Phase 4).
  *
  * Every modality now has a REAL codec path, all in-JDK and headless:
  * IMAGE via [[PpmCodec]] (dependency-free P6) and [[ImageIoCodec]]
  * (PNG/JPEG/BMP/GIF via `javax.imageio`); AUDIO via [[WavCodec]]
  * (WAV/PCM 16-bit via `javax.sound.sampled`); VIDEO via
  * [[AviMjpegCodec]] (AVI/RIFF container parsed byte-by-byte, frames
  * as real JPEGs through `javax.imageio` — Motion-JPEG needs no
  * inter-frame codec, so the one video format the JDK CAN decode is a
  * genuine, widely-used one). Inter-frame-compressed formats
  * (H.264/VP9/AV1) remain out of reach without native libraries;
  * [[FakeCodec]] survives only as the generic opaque-payload
  * featurizer for payloads that are not media at all.
  */
object Multimodal {

  // Internal persisted frames (decoded-hash tables are read 3× by the
  // image near-dup joins; without a persist the full codec pass re-runs
  // per leg) — released by the Bench/Verify sweeps between queries.
  private val persisted = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private[graft] def trackPersisted[T](ds: Dataset[T]): Dataset[T] =
    persisted.synchronized {
      persisted += ds
      ds.persist()
    }

  /** Unpersist every cache this module created (REPL/long-lived-driver
    * hygiene — the sweep mains call this between queries). */
  def releasePersistedState(): Unit = persisted.synchronized {
    persisted.foreach(_.unpersist())
    persisted.clear()
  }

  /** A decoded media batch row: (id, features). */
  final case class MediaFeatures(id: Long, features: Array[Float])

  /** A sampled frame: (id, frameIdx, frameBytes). */
  final case class Frame(id: Long, frameIdx: Int, frame: Array[Byte])

  /** Deterministic pseudo-features from opaque bytes. Images decode for
    * real via [[PpmCodec]]/[[ImageIoCodec]], audio via [[WavCodec]],
    * video via [[AviMjpegCodec]]; this featurizer remains only for
    * payloads that are NOT decodable media (the generic binary-column
    * convention — e.g. serialized blobs fingerprinted for similarity
    * blocking). A model-based embedder would replace the arithmetic
    * here; everything around it (distribution, batching, schema) is
    * unchanged.
    *
    * The arithmetic is deliberately BOUNDED (every intermediate stays far
    * below 2^63): a position-weighted unsigned-byte sum mod a small prime,
    * then a MINSTD-style LCG mod the same prime per feature. That makes
    * the stub exactly replayable in plain SQL — the multimodal queries
    * oracle-check end-to-end instead of rows-only — where the previous
    * 64-bit-wraparound hash needed 128-bit emulation to replay. */
  object FakeCodec {
    /** Prime modulus just under 10^12: rolling-hash products (M·256) and
      * LCG products (M·A) both fit comfortably in i64, while the hash
      * space is large enough that payload collisions are negligible (a
      * 10^6-sized modulus produced a dozen colliding doc pairs per 500
      * fixture docs — similar-length text is NOT uniform over small
      * moduli). */
    val M = 999999999989L
    /** MINSTD multiplier. */
    val A = 48271L
    /** LCG increment. */
    val C = 11L

    /** Polynomial rolling hash of the unsigned bytes mod [[M]] (base
      * 256) — the payload fingerprint seeding the per-feature LCG. */
    def payloadHash(bytes: Array[Byte]): Long = {
      var s = 0L
      var i = 0
      while (i < bytes.length) {
        s = (s * 256L + (bytes(i) & 0xff)) % M
        i += 1
      }
      s
    }

    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = payloadHash(bytes)
      var d = 0
      while (d < dim) {
        h = (h * A + C) % M
        // zero-mean in [-1, 1]: all-positive features would pile every
        // vector into the positive orthant and skew SRP-LSH buckets (one
        // hyperplane side gets nearly everything) — centered features
        // keep downstream similarity blocking balanced
        out(d) = (h % 2001 - 1000).toFloat / 1000.0f
        d += 1
      }
      out
    }
  }

  /** REAL codec for one dependency-free format: binary PPM (P6). The
    * format is plain bytes (`P6\n<w> <h>\n<maxval>\n` + RGB triplets), so
    * encode/decode need no native library — which makes the multimodal
    * path genuinely end-to-end for images in this container: real binary
    * column in, real parse + pixel math out. Compressed images (PNG/JPEG)
    * go through [[ImageIoCodec]], audio (WAV/PCM) through [[WavCodec]];
    * only video (H.264) remains behind [[FakeCodec]] with the same
    * plumbing. */
  object PpmCodec {
    /** Synthesize a P6 image from a pixel function (fixture builder). */
    def encode(width: Int, height: Int,
               pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(width > 0 && height > 0)
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + width * height * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var idx = header.length
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          out(idx) = r.toByte; out(idx + 1) = g.toByte; out(idx + 2) = b.toByte
          idx += 3; x += 1
        }
        y += 1
      }
      out
    }

    /** Parse a P6 payload → (width, height, rgb bytes). Handles the
      * format's whitespace/comment grammar; rejects non-P6 magics and
      * maxval ≠ 255 (the common 8-bit case — all this pipeline emits). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      var pos = 0
      def skipSpaceAndComments(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val c = bytes(pos)
          if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') pos += 1
          else go = false
        }
      }
      def readInt(): Int = {
        skipSpaceAndComments()
        var v = 0
        require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
          s"malformed PPM header at byte $pos")
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        "not a P6 PPM payload")
      pos = 2
      val w = readInt(); val h = readInt(); val maxval = readInt()
      require(maxval == 255, s"unsupported maxval $maxval (8-bit only)")
      pos += 1 // the single whitespace byte after maxval
      // Long math: a crafted "P6\n50000 50000\n255\n" header would wrap
      // w*h*3 in Int, defeat the truncation check, and crash downstream
      val n = w.toLong * h * 3L
      require(n <= Int.MaxValue, s"PPM geometry ${w}x$h too large")
      require(bytes.length - pos >= n, "truncated PPM pixel data")
      (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt))
    }
  }

  /** REAL compressed-image codec via the in-JDK `javax.imageio` (the
    * `java.desktop` module ships with JDK 17 and runs headless — no
    * native library needed). PNG is lossless: decoded pixels equal the
    * encoded pixel function bit-for-bit, so channel means replay exactly
    * in SQL (q_multimodal_png is a FULL oracle through a real compressed
    * codec). JPEG is lossy but mean-preserving (DCT DC coefficients carry
    * block averages), so its gate is the self-asserting form: exact
    * geometry plus decoded-mean-within-tolerance booleans against
    * encode-time ground truth. Audio goes through [[WavCodec]]; only
    * video remains behind [[FakeCodec]] — the JDK genuinely has no
    * codec for that. */
  object ImageIoCodec {
    // Must win the race with AWT class initialization: ImageIO pulls in
    // java.awt classes that consult this property once, executors included.
    System.setProperty("java.awt.headless", "true")

    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

    // ImageIO's stream cache defaults to DISK: every read/write wraps
    // its in-memory byte stream in a temp-FILE-backed cache stream. For
    // per-row codec work fanned across all cores that is one temp-file
    // create/write/delete per image and the codec stage collapses into
    // filesystem contention (measured at sf0.1: the 32-way spread of
    // q_multimodal_video ran 3× SLOWER than single-core until this).
    // Payloads here are small in-memory byte arrays — cache in memory.
    ImageIO.setUseCache(false)

    private def render(width: Int, height: Int,
                       pixel: (Int, Int) => (Int, Int, Int)): BufferedImage = {
      require(width > 0 && height > 0)
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
          x += 1
        }
        y += 1
      }
      img
    }

    /** Synthesize a PNG payload from a pixel function (fixture builder). */
    def encodePng(width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(render(width, height, pixel), "png", out)
      out.toByteArray
    }

    /** Synthesize a BMP payload (uncompressed 24-bit — lossless like
      * PNG, so decoded pixels equal the pixel function bit-for-bit). */
    def encodeBmp(width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(render(width, height, pixel), "bmp", out)
      out.toByteArray
    }

    /** Synthesize a JPEG payload at an explicit quality (deterministic:
      * the JDK encoder is a pure function of pixels + quality). */
    def encodeJpeg(width: Int, height: Int, quality: Float,
                   pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(quality > 0f && quality <= 1f, "quality must be in (0, 1]")
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(render(width, height, pixel), null, null), param)
      } finally { ios.close(); writer.dispose() }
      out.toByteArray
    }

    /** Decode ANY ImageIO-supported payload (PNG/JPEG/BMP/GIF…) → exact
      * integer channel sums divided once, same stats contract as
      * [[decodeImageStats]]. */
    def decodeStats(id: Long, bytes: Array[Byte]): ImageStats = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"payload for id=$id is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < px.length) {
        r += (px(i) >> 16) & 0xff; g += (px(i) >> 8) & 0xff; b += px(i) & 0xff
        i += 1
      }
      val n = (w.toLong * h).toDouble
      ImageStats(id, w, h, r / n, g / n, b / n)
    }

    /** Exact integer gray grid for [[Multimodal.dHash64]]: decode any
      * ImageIO payload, gray each pixel as ⌊(r+g+b)/3⌋, box-average
      * onto a gw×gh grid with floor division — all integer arithmetic,
      * so the grid (and every dHash bit derived from it) replays
      * bit-for-bit in SQL for losslessly-coded payloads. */
    def grayGrid(id: Long, bytes: Array[Byte], gw: Int, gh: Int): Array[Array[Long]] = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"payload for id=$id is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      require(w % gw == 0 && h % gh == 0,
        s"image ${w}x$h for id=$id not divisible into a ${gw}x$gh grid")
      val bx = w / gw; val by = h / gh
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val grid = Array.fill(gw)(new Array[Long](gh))
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          var s = 0L
          var j = 0
          while (j < by) {
            var i = 0
            while (i < bx) {
              val p = px((gy * by + j) * w + gx * bx + i)
              s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              i += 1
            }
            j += 1
          }
          grid(gx)(gy) = s / (bx.toLong * by)
          gx += 1
        }
        gy += 1
      }
      grid
    }

    /** REAL image resize: decode any ImageIO payload, downsample by
      * integer factors (fx, fy) with an area-averaging box filter —
      * each output pixel is the floor of the exact integer mean of its
      * fx×fy source block — and re-encode as lossless PNG. Exact
      * integer arithmetic end-to-end, so decode→resize→re-encode→decode
      * replays bit-for-bit in plain SQL (a full oracle through a real
      * resampling kernel; Graphics2D interpolation would be
      * platform-dependent and unverifiable). */
    def boxResizePng(bytes: Array[Byte], fx: Int, fy: Int): Array[Byte] =
      boxResizePngWithGeometry(bytes, fx, fy)._1

    /** [[boxResizePng]] plus the output geometry — callers that need
      * (w, h) use this instead of decoding the fresh PNG a second time
      * just to read its header. */
    def boxResizePngWithGeometry(bytes: Array[Byte], fx: Int,
                                 fy: Int): (Array[Byte], Int, Int) = {
      require(fx > 0 && fy > 0, "resize factors must be positive")
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth; val h = img.getHeight
      require(w % fx == 0 && h % fy == 0,
        s"geometry ${w}x$h not divisible by box $fx x $fy")
      val ow = w / fx; val oh = h / fy
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
      val area = fx * fy
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var r = 0; var g = 0; var b = 0
          var dy = 0
          while (dy < fy) {
            val rowBase = (oy * fy + dy) * w + ox * fx
            var dx = 0
            while (dx < fx) {
              val p = px(rowBase + dx)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              dx += 1
            }
            dy += 1
          }
          out.setRGB(ox, oy, ((r / area) << 16) | ((g / area) << 8) | (b / area))
          ox += 1
        }
        oy += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      (bos.toByteArray, ow, oh)
    }
  }

  /** REAL audio codec via the in-JDK `javax.sound.sampled` (ships in
    * the `java.desktop` module of JDK 17 and runs fully headless — no
    * AWT, no native library). WAV container + PCM_SIGNED 16-bit
    * little-endian samples are LOSSLESS: decoded samples equal the
    * synthesized waveform bit-for-bit, so exact per-channel integer
    * sums replay in plain SQL — a FULL oracle through a real audio
    * format, the same strength as the PNG leg (and strictly stronger
    * than a tolerance self-assert). A decoder that mis-parses the
    * header (sample rate, channel count, frame count), byte order, or
    * channel interleaving flips an exact integer column. */
  object WavCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}

    // AudioSystem.write / getAudioInputStream run a SYNCHRONIZED
    // ServiceLoader provider scan over the full classpath on EVERY call
    // (JDK13Services.getProviders) — per-row codec work fanned across
    // all cores serializes on that lock and pays the scan repeatedly
    // (measured: q_multimodal_wav/tone ran ~1.5–2× slower after the
    // 32-way spread until this). Resolve the WAVE reader/writer
    // provider ONCE per JVM — the identical in-JDK codec classes
    // AudioSystem itself would select — and call them directly.
    private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter on this JDK"))
    }
    // Resolve THE reader that decodes WAVE once, by probing a 1-frame
    // in-memory WAV at init. Iterating providers per decode (what
    // AudioSystem.getAudioInputStream does) asks each NON-matching
    // provider first, and the JDK's SoftMidiAudioFileReader answers
    // that question by running the synchronized JDK13Services classpath
    // scan — per row, under a global lock (thread dumps during the
    // 32-way probe showed every worker parked in
    // JDK13Services.getProviders via MidiSystem.getSequence).
    private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
      import scala.jdk.CollectionConverters._
      val probe = encode(8000, 1, 1, (_, _) => 0)
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala
        .find { r =>
          try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
          catch { case _: Exception => false }
        }
        .getOrElse(throw new IllegalStateException("no WAVE AudioFileReader on this JDK"))
    }
    private def readAudio(bytes: Array[Byte]): AudioInputStream =
      wavReader.getAudioInputStream(new ByteArrayInputStream(bytes))

    /** Synthesize a PCM_SIGNED 16-bit little-endian stereo-capable WAV
      * from a sample function (fixture builder): sample(channel, frame)
      * → signed 16-bit amplitude. */
    def encode(sampleRate: Int, channels: Int, nFrames: Int,
               sample: (Int, Int) => Short): Array[Byte] = {
      require(sampleRate > 0 && channels > 0 && nFrames > 0)
      val data = new Array[Byte](nFrames * channels * 2)
      var i = 0
      var idx = 0
      while (i < nFrames) {
        var ch = 0
        while (ch < channels) {
          val s = sample(ch, i)
          data(idx) = (s & 0xff).toByte // little-endian sample bytes
          data(idx + 1) = ((s >> 8) & 0xff).toByte
          idx += 2; ch += 1
        }
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat,
        /* bigEndian = */ false)
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nFrames.toLong)
      val out = new ByteArrayOutputStream()
      try wavWriter.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
      out.toByteArray
    }

    /** Decode a WAV payload → format metadata plus exact per-channel
      * integer sample sums (first two channels) and RMS amplitudes.
      * Integer sums are the oracle surface; RMS is
      * sqrt(exact-integer-sum-of-squares / frames), one division + one
      * correctly-rounded sqrt, so it is bit-reproducible across engines. */
    def decodeStats(id: Long, bytes: Array[Byte]): AudioStats = {
      val ais =
        try readAudio(bytes)
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"payload for id=$id is not a decodable audio stream", e)
        }
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"payload for id=$id is not 16-bit signed little-endian PCM ($fmt)")
        val channels = fmt.getChannels
        val data = ais.readAllBytes()
        val frameBytes = channels * 2
        require(frameBytes > 0 && data.length % frameBytes == 0,
          s"truncated PCM frame data for id=$id")
        val nFrames = data.length / frameBytes
        val sums = new Array[Long](channels)
        val sq = new Array[Long](channels)
        var idx = 0
        while (idx < data.length) {
          val ch = (idx / 2) % channels
          // low byte unsigned OR high byte signed = the 16-bit amplitude
          val s = ((data(idx) & 0xff) | (data(idx + 1).toInt << 8)).toLong
          sums(ch) += s
          sq(ch) += s * s
          idx += 2
        }
        def rms(ch: Int): Double =
          if (ch < channels && nFrames > 0) math.sqrt(sq(ch).toDouble / nFrames)
          else 0.0
        AudioStats(id, math.round(fmt.getSampleRate), channels, nFrames.toLong,
          if (channels > 0) sums(0) else 0L, if (channels > 1) sums(1) else 0L,
          rms(0), rms(1))
      } finally ais.close()
    }

    /** Decoded 16-bit amplitudes of ONE channel, frame order, as
      * doubles — the input surface for [[Multimodal.detectTones]]'
      * Goertzel recurrence. Same container validation as
      * [[decodeStats]]. */
    def channelSamples(id: Long, bytes: Array[Byte], channel: Int): Array[Double] = {
      val ais =
        try readAudio(bytes)
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"payload for id=$id is not a decodable audio stream", e)
        }
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"payload for id=$id is not 16-bit signed little-endian PCM ($fmt)")
        val channels = fmt.getChannels
        require(channel >= 0 && channel < channels,
          s"payload for id=$id has $channels channels; asked for $channel")
        val data = ais.readAllBytes()
        val frameBytes = channels * 2
        require(frameBytes > 0 && data.length % frameBytes == 0,
          s"truncated PCM frame data for id=$id")
        val nFrames = data.length / frameBytes
        val out = new Array[Double](nFrames)
        var i = 0
        while (i < nFrames) {
          val idx = (i * channels + channel) * 2
          out(i) = ((data(idx) & 0xff) | (data(idx + 1).toInt << 8)).toDouble
          i += 1
        }
        out
      } finally ais.close()
    }
  }

  /** Decoded audio statistics: exact integer per-channel sample sums
    * (bit-reproducible across engines) plus derived RMS amplitudes. */
  final case class AudioStats(id: Long, sample_rate: Int, channels: Int,
                              n_frames: Long, sum_l: Long, sum_r: Long,
                              rms_l: Double, rms_r: Double)

  /** Perceptual difference-hash (dHash; the public classic cheap image
    * near-dup key): decode → integer gray (⌊(r+g+b)/3⌋) → EXACT integer
    * box means onto a 9×8 grid (width must divide by 9, height by 8 —
    * the [[resizeImages]] exact-arithmetic discipline) → 64 bits, bit
    * (x, y) set iff grid[x+1][y] > grid[x][y]. Global brightness and
    * contrast shifts barely move it; content changes do.
    *
    * The 64 bits are emitted as FOUR 16-bit band ints (band b = grid
    * rows 2b and 2b+1; in-band bit index j·8+x for row offset j),
    * deliberately: bands are the pigeonhole blocking unit for the
    * near-dup join (hamming ≤ k with k < 4·ceil ⇒ some band matches
    * exactly... the standard SimHash-style argument), and small
    * non-negative ints sidestep every signed-shift pitfall a packed
    * 64-bit key would meet in cross-engine SQL. Hamming distance =
    * Σ_b bit_count(h_b XOR h_b'). Output: (id, h0, h1, h2, h3). */
  final case class DHash(id: Long, h0: Int, h1: Int, h2: Int, h3: Int)

  def dHash64(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[DHash] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) =>
      val g = ImageIoCodec.grayGrid(id, bytes, 9, 8)
      val bands = new Array[Int](4)
      var b = 0
      while (b < 4) {
        var acc = 0
        var j = 0
        while (j < 2) {
          val y = 2 * b + j
          var x = 0
          while (x < 8) {
            if (g(x + 1)(y) > g(x)(y)) acc |= 1 << (j * 8 + x)
            x += 1
          }
          j += 1
        }
        bands(b) = acc
        b += 1
      }
      DHash(id, bands(0), bands(1), bands(2), bands(3))
    })
  }

  /** Tone detection over decoded PCM — REAL frequency-domain DSP, not
    * container stats: per candidate frequency, Goertzel's single-bin
    * DFT power (the O(N) recurrence used for DTMF detection; Goertzel
    * 1958, public classic), evaluated on channel 0 of a decoded WAV.
    * Candidates snap to the nearest DFT bin (k = round(N·f/sr)) so a
    * pure tone at a candidate lands its full energy in one bin.
    * Output per doc: the winning candidate index, plus the win margin
    * power ratio best/secondBest (≥ 1; a real tone dominates by
    * orders of magnitude, a mis-parsed stream does not). */
  final case class ToneStats(id: Long, sample_rate: Int, n_frames: Long,
                             best_idx: Int, margin: Double)

  def detectTones(media: Dataset[(Long, Array[Byte])],
                  candidatesHz: Seq[Double])(
      implicit spark: SparkSession): Dataset[ToneStats] = {
    require(candidatesHz.size >= 2, "need at least two candidate tones")
    import spark.implicits._
    val cands = candidatesHz.toArray
    media.mapPartitions(_.map { case (id, bytes) =>
      val st = WavCodec.decodeStats(id, bytes) // validates the container
      val pcm = WavCodec.channelSamples(id, bytes, channel = 0)
      val n = pcm.length
      val powers = cands.map { f =>
        val k = math.round(n * f / st.sample_rate).toInt
        val w = 2.0 * math.Pi * k / n
        val coeff = 2.0 * math.cos(w)
        var s1 = 0.0; var s2 = 0.0
        var i = 0
        while (i < n) {
          val s0 = pcm(i) + coeff * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        s1 * s1 + s2 * s2 - coeff * s1 * s2
      }
      val best = powers.indices.maxBy(powers)
      val second = powers.indices.filter(_ != best).maxBy(powers)
      val margin =
        if (powers(second) > 0.0) powers(best) / powers(second)
        else Double.MaxValue
      ToneStats(id, st.sample_rate, st.n_frames, best, margin)
    })
  }

  /** Partition-parallel decode of real WAV/PCM payloads through
    * [[WavCodec]] — identical bundle shape to [[decodeImageStatsIo]],
    * genuinely containerized audio payloads. */
  def decodeAudioStats(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[AudioStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) => WavCodec.decodeStats(id, bytes) })
  }

  /** REAL video codec: Motion-JPEG in an AVI/RIFF container, both ends
    * in-JDK. The RIFF container is a plain little-endian chunk format
    * (fourcc + u32 size + payload), written and parsed here
    * byte-by-byte; each frame is an independent real JPEG encoded and
    * decoded through `javax.imageio`. MJPEG has no inter-frame
    * compression, which is exactly why it is the one genuine video
    * format a pure-JVM pipeline can handle — and it is a real format
    * (webcams, capture cards, DV workflows), not a project invention.
    * A parser that mis-reads the header (geometry, frame count, frame
    * timing), chunk padding, or frame boundaries flips an exact column
    * in the oracle-checked video query.
    *
    * Layout written (and required back): `RIFF('AVI ' LIST('hdrl'
    * avih LIST('strl' strh strf)) LIST('movi' '00dc'×n) idx1)`. */
  object AviMjpegCodec {
    import java.io.ByteArrayOutputStream

    /** Container-level metadata parsed from the AVI headers. */
    final case class VideoInfo(width: Int, height: Int, nFrames: Int,
                               usPerFrame: Int)

    private def fourcc(s: String): Array[Byte] = {
      require(s.length == 4); s.getBytes("US-ASCII")
    }
    private final class W {
      val out = new ByteArrayOutputStream()
      def u32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def cc(s: String): Unit = out.write(fourcc(s))
      def bytes(b: Array[Byte]): Unit = out.write(b)
      def result(): Array[Byte] = out.toByteArray
    }
    /** A chunk: fourcc + u32 size + payload + even-byte pad. */
    private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val w = new W; w.cc(cc); w.u32(payload.length.toLong); w.bytes(payload)
      if (payload.length % 2 == 1) w.out.write(0)
      w.result()
    }
    private def list(kind: String, payload: Array[Byte]): Array[Byte] = {
      val w = new W; w.cc("LIST"); w.u32(payload.length + 4L); w.cc(kind)
      w.bytes(payload)
      if (payload.length % 2 == 1) w.out.write(0)
      w.result()
    }

    /** Synthesize an AVI/MJPEG video: `nFrames` real JPEG frames from a
      * per-frame pixel function, at `fps` frames/second. Deterministic:
      * the JDK JPEG encoder is a pure function of pixels + quality, and
      * the container layout is fixed. */
    def encode(width: Int, height: Int, fps: Int, nFrames: Int, quality: Float,
               pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(fps > 0 && nFrames > 0)
      val jpegs = (0 until nFrames).map { f =>
        ImageIoCodec.encodeJpeg(width, height, quality, (x, y) => pixel(f, x, y))
      }
      val avih = { // MainAVIHeader: 56 bytes
        val w = new W
        w.u32(1000000L / fps)              // dwMicroSecPerFrame
        w.u32(jpegs.map(_.length.toLong).sum * fps) // dwMaxBytesPerSec (advisory)
        w.u32(0); w.u32(0x10)              // padding, AVIF_HASINDEX
        w.u32(nFrames.toLong); w.u32(0)    // dwTotalFrames, dwInitialFrames
        w.u32(1); w.u32(jpegs.map(_.length).max.toLong) // streams, sugg. buffer
        w.u32(width.toLong); w.u32(height.toLong)
        (0 until 4).foreach(_ => w.u32(0)) // dwReserved
        w.result()
      }
      val strh = { // AVIStreamHeader: 56 bytes
        val w = new W
        w.cc("vids"); w.cc("MJPG")
        w.u32(0); w.u16(0); w.u16(0); w.u32(0) // flags, prio, lang, initFrames
        w.u32(1); w.u32(fps.toLong)        // dwScale, dwRate → rate/scale = fps
        w.u32(0); w.u32(nFrames.toLong)    // dwStart, dwLength (frames)
        w.u32(jpegs.map(_.length).max.toLong); w.u32(0xffffffffL) // buf, quality
        w.u32(0)                           // dwSampleSize (0 = varying)
        w.u16(0); w.u16(0); w.u16(width); w.u16(height) // rcFrame
        w.result()
      }
      val strf = { // BITMAPINFOHEADER: 40 bytes
        val w = new W
        w.u32(40); w.u32(width.toLong); w.u32(height.toLong)
        w.u16(1); w.u16(24)                // planes, bit count
        w.cc("MJPG")                       // biCompression
        w.u32(width.toLong * height * 3)   // biSizeImage
        w.u32(0); w.u32(0); w.u32(0); w.u32(0)
        w.result()
      }
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val frameChunks = jpegs.map(j => chunk("00dc", j))
      val movi = list("movi", frameChunks.reduce(_ ++ _))
      val idx1 = { // offsets relative to the 'movi' fourcc position
        val w = new W
        var off = 4L
        jpegs.zip(frameChunks).foreach { case (j, fc) =>
          w.cc("00dc"); w.u32(0x10)        // AVIIF_KEYFRAME (every MJPEG frame)
          w.u32(off); w.u32(j.length.toLong)
          off += fc.length
        }
        w.result()
      }
      val body = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx1)
      val w = new W
      w.cc("RIFF"); w.u32(body.length.toLong); w.bytes(body)
      w.result()
    }

    private def rdU32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) |
        ((b(p + 3) & 0xffL) << 24)
    private def ccAt(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")

    /** Parse an AVI payload → container info + the raw JPEG frame
      * payloads, validating the RIFF grammar, the MJPG fourcc, the
      * even-byte chunk padding, and frame-count agreement between the
      * main header, the stream header, the movi list, and idx1. */
    def decode(bytes: Array[Byte]): (VideoInfo, Vector[Array[Byte]]) = {
      require(bytes.length >= 12 && ccAt(bytes, 0) == "RIFF" &&
        ccAt(bytes, 8) == "AVI ", "not a RIFF/AVI payload")
      val riffEnd = math.min(8L + rdU32(bytes, 4), bytes.length.toLong).toInt
      var info: VideoInfo = null
      var strhFrames = -1L
      var idxFrames = -1L
      val frames = Vector.newBuilder[Array[Byte]]
      var nFrames = 0

      // walk one LIST body for subchunks (hdrl/strl are shallow: recurse)
      def walk(from: Int, to: Int): Unit = {
        var p = from
        while (p + 8 <= to) {
          val cc = ccAt(bytes, p)
          // Long math, then range-check BEFORE narrowing: a corrupt size
          // field >= 2^31 would wrap negative as an Int, defeat the
          // truncation check, and (at exactly -8) freeze the cursor in
          // an infinite loop — a hung executor task, worse than a crash
          val sizeL = rdU32(bytes, p + 4)
          require(sizeL >= 0 && p + 8 + sizeL <= to,
            s"truncated or corrupt chunk $cc at $p (size $sizeL)")
          val size = sizeL.toInt
          val dataStart = p + 8
          cc match {
            case "LIST" =>
              require(size >= 4, s"short LIST chunk at $p")
              walk(dataStart + 4, dataStart + size)
            case "avih" =>
              require(size >= 40, "short avih")
              info = VideoInfo(
                width = rdU32(bytes, dataStart + 32).toInt,
                height = rdU32(bytes, dataStart + 36).toInt,
                nFrames = rdU32(bytes, dataStart + 16).toInt,
                usPerFrame = rdU32(bytes, dataStart).toInt)
            case "strh" =>
              require(size >= 36, s"short strh chunk at $p")
              require(ccAt(bytes, dataStart) == "vids" &&
                ccAt(bytes, dataStart + 4) == "MJPG",
                s"not an MJPEG video stream (${ccAt(bytes, dataStart + 4)})")
              strhFrames = rdU32(bytes, dataStart + 32)
            case "00dc" | "00db" =>
              frames += java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + size)
              nFrames += 1
            case "idx1" =>
              idxFrames = size / 16L
            case _ => () // strf, JUNK, vendor chunks: skip
          }
          p = dataStart + size + (size % 2) // chunks pad to even offsets
        }
      }
      walk(12, riffEnd)
      require(info != null, "missing avih header")
      require(nFrames == info.nFrames,
        s"movi frame count $nFrames != header ${info.nFrames}")
      require(strhFrames == info.nFrames.toLong,
        s"strh dwLength $strhFrames != header ${info.nFrames}")
      require(idxFrames < 0 || idxFrames == info.nFrames.toLong,
        s"idx1 entry count $idxFrames != header ${info.nFrames}")
      (info, frames.result())
    }
  }

  /** One decoded video frame's statistics: container metadata (exact:
    * geometry, frame count, per-frame microseconds) + this frame's
    * decoded per-channel means (JPEG-lossy: bounded, not exact). */
  final case class VideoFrameStats(id: Long, frame_idx: Int, width: Int,
                                   height: Int, n_frames: Int, us_per_frame: Int,
                                   mean_r: Double, mean_g: Double, mean_b: Double)

  /** Partition-parallel REAL video decode: parse each AVI/MJPEG
    * container, decode every JPEG frame, emit one stats row per frame.
    * Each frame's decoded geometry must agree with the container header
    * (a parse cross-check, not an assumption). */
  def decodeVideoStats(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[VideoFrameStats] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      val (info, frames) = AviMjpegCodec.decode(bytes)
      frames.iterator.zipWithIndex.map { case (jpeg, idx) =>
        val s = ImageIoCodec.decodeStats(id, jpeg)
        require(s.width == info.width && s.height == info.height,
          s"frame $idx geometry ${s.width}x${s.height} != container ${info.width}x${info.height}")
        VideoFrameStats(id, idx, info.width, info.height, info.nFrames,
          info.usPerFrame, s.mean_r, s.mean_g, s.mean_b)
      }
    })
  }

  /** REAL frame sampling for video payloads: parse the AVI container and
    * emit every `stride`-th JPEG frame as its own row — actual frame
    * payloads from the container index, not byte slices. */
  def sampleVideoFrames(media: Dataset[(Long, Array[Byte])], stride: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    require(stride > 0)
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      val (_, frames) = AviMjpegCodec.decode(bytes)
      frames.iterator.zipWithIndex.collect {
        case (jpeg, idx) if idx % stride == 0 => Frame(id, idx, jpeg)
      }
    })
  }

  /** Partition-parallel decode of real compressed images (PNG/JPEG/…)
    * through [[ImageIoCodec]] — identical bundle shape to
    * [[decodeImageStats]], genuinely compressed payloads. */
  def decodeImageStatsIo(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) => ImageIoCodec.decodeStats(id, bytes) })
  }

  /** Decoded image channel statistics: exact integer channel sums divided
    * once — bit-reproducible across engines. */
  final case class ImageStats(id: Long, width: Int, height: Int,
                              mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL partition-parallel image decode: parse each P6 payload and
    * reduce pixels to per-channel means. Same mapPartitions bundle shape
    * as [[decodeFeatures]] — the difference is the codec is genuine. */
  def decodeImageStats(media: Dataset[(Long, Array[Byte])])(
      implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) =>
      val (w, h, px) = PpmCodec.decode(bytes)
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < px.length) {
        r += px(i) & 0xff; g += px(i + 1) & 0xff; b += px(i + 2) & 0xff
        i += 3
      }
      val n = (w * h).toDouble
      ImageStats(id, w, h, r / n, g / n, b / n)
    })
  }

  /** Attach a synthetic media struct to any table: opaque bytes derived
    * from a text column + typed metadata. Demonstrates the column
    * convention {bytes BINARY, mime STRING, width INT, height INT,
    * duration_ms BIGINT} on fixture data. */
  def attachSyntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("media", struct(
      col(textCol).cast("binary").as("bytes"),
      when(col(idCol) % 2 === 0, "image/png").otherwise("audio/wav").as("mime"),
      (pmod(xxhash64(col(textCol)), lit(1024)) + 32).cast("int").as("width"),
      (pmod(xxhash64(col(idCol)), lit(768)) + 32).cast("int").as("height"),
      (pmod(xxhash64(col(textCol), col(idCol)), lit(60000))).as("duration_ms")))

  /** Decode features partition-parallel: each partition is a decode batch
    * (bundle), mirroring how a vectorized UDF would batch. The decode is
    * the stub above; the mapPartitions shape is the real contract. */
  def decodeFeatures(media: Dataset[(Long, Array[Byte])], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { case (id, bytes) => MediaFeatures(id, FakeCodec.decode(bytes, dim)) }
    }
  }

  /** A resized media item. */
  final case class ResizedMedia(id: Long, width: Int, height: Int, bytes: Array[Byte])

  /** REAL partition-parallel image resize: decode each payload through
    * [[ImageIoCodec]], area-average by (fx, fy), re-encode lossless
    * PNG. Same bundle shape as [[resizeMedia]]; the kernel is genuine
    * (and exactly SQL-replayable — see [[ImageIoCodec.boxResizePng]]). */
  def resizeImages(media: Dataset[(Long, Array[Byte])], fx: Int, fy: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.mapPartitions(_.map { case (id, bytes) =>
      val (out, ow, oh) = ImageIoCodec.boxResizePngWithGeometry(bytes, fx, fy)
      ResizedMedia(id, ow, oh, out)
    })
  }

  /** Opaque-payload thumbnailer: deterministic stride-resample of raw
    * bytes to a byte budget derived from the target geometry (budget =
    * W·H/64). For payloads that are decodable images, [[resizeImages]]
    * is the REAL path (decode → box filter → PNG); this byte-level
    * variant remains for non-media binaries where "resize" can only
    * mean bounded-size fingerprinting. Output length = min(budget,
    * input length). */
  def resizeMedia(media: Dataset[(Long, Array[Byte])], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0, "target geometry must be positive")
    val budget = math.max(targetW * targetH / 64, 1)
    media.mapPartitions(_.map { case (id, bytes) =>
      val n = math.min(budget, bytes.length)
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        out(i) = bytes((bytes.length.toLong * i / n).toInt)
        i += 1
      }
      ResizedMedia(id, targetW, targetH, out)
    })
  }

  /** Frame sampling for video-ish payloads: n deterministic byte-slices
    * per media item, exploded to one row per frame. */
  def sampleFrames(media: Dataset[(Long, Array[Byte])], n: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { case (id, bytes) =>
      if (bytes.isEmpty) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (bytes.length.toLong * i / n).toInt
        val end = (bytes.length.toLong * (i + 1) / n).toInt
        Frame(id, i, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1)))
      }
    }
  }
}
