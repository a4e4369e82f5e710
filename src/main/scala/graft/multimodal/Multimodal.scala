package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads carried as
  * opaque `binary` columns with typed metadata, processed batch-wise.
  *
  * The decode step has one REAL codec — binary PPM (Netpbm P6), the
  * simplest raster format, parsed byte-for-byte by [[decodePpm]]
  * (header grammar incl. comments, dimensions, 8-bit RGB plane) with
  * per-channel pixel statistics; q81 value-checks it against an
  * oracle that recomputes the same pixels independently. Payloads
  * that are not PPM fall back to [[decodeStub]], the deterministic
  * fake standing in for libjpeg/ffmpeg (not present in this
  * container). Everything AROUND decode is real and is what actually
  * matters at 100 TB:
  *
  *   - the schema contract (media_id, kind, payload binary, meta struct),
  *   - range-partitioning by media_id so huge blobs spread evenly
  *     instead of skewing a hash bucket,
  *   - the batch processing shape: `mapPartitions` over a typed
  *     Dataset — one closure invocation per PARTITION, amortizing
  *     any decoder init cost across thousands of rows (the Scala
  *     analogue of Python's mapInPandas batch contract),
  *   - kind-dispatched per-blob ops (resize stride / audio window /
  *     frame sample) implemented as real byte-level computation.
  *
  * A production deployment replaces [[decodeStub]]'s body with the
  * real codec call; nothing else changes.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRateHz: Int,
      durationMs: Long)

  case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      checksum: Long, op_sum: Long, meta_width: Int,
      ppm_w: Int, ppm_h: Int, ppm_sum_rgb: Long)

  /** Decoded binary-PPM raster: dimensions + per-image channel sums
    * (the "pixel stats" a feature-extract pass emits). */
  case class PpmImage(width: Int, height: Int, sumR: Long, sumG: Long,
      sumB: Long) {
    def sumRgb: Long = sumR + sumG + sumB
  }

  /** Validated P6 header parse: returns (width, height, pixel-plane
    * offset) with ALL well-formedness guards applied — magic,
    * whitespace/`#`-comment-separated dimensions and maxval (8-bit
    * only), the single whitespace separator, and a full pixel plane
    * present. None for anything malformed. Shared by [[decodePpm]]
    * and [[resizePpm]] so the two cannot disagree on the grammar. */
  private def parsePpmHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < payload.length) {
        val c = payload(i).toChar
        if (c == '#') while (i < payload.length && payload(i) != '\n') i += 1
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def int(): Int = {
      skipWs()
      var v = -1L // Long accumulator: a digit string past Int.MaxValue
      // must read as malformed (-1), not wrap to a small positive int
      // that would pass the dimension guards against the wrong bytes.
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = math.min(math.max(v, 0L) * 10 + (payload(i) - '0'), Int.MaxValue.toLong + 1)
        i += 1
      }
      if (v > Int.MaxValue) -1 else v.toInt
    }
    val w = int(); val h = int(); val maxv = int()
    // exactly ONE whitespace byte separates maxval from the pixel
    // plane (Netpbm spec) — and it must BE whitespace: a CRLF-written
    // header would otherwise shift the whole plane by one byte and
    // "decode" garbage that still passes the length guard.
    if (i >= payload.length || !payload(i).toChar.isWhitespace) return None
    i += 1
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
        payload.length - i < w.toLong * h * 3) return None
    Some((w, h, i))
  }

  /** REAL image decode for binary PPM (Netpbm "P6"): header grammar
    * per [[parsePpmHeader]], then per-channel sums over the RGB plane.
    * Returns None for anything that is not a well-formed 8-bit P6 —
    * truncated planes, maxval > 255, or a non-PPM payload — so the
    * caller can fall back to [[decodeStub]]. Pure JDK, no codecs. */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    parsePpmHeader(payload).map { case (w, h, off) =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = off
      var p = 0
      val n = w * h
      while (p < n) {
        sr += payload(i) & 0xff
        sg += payload(i + 1) & 0xff
        sb += payload(i + 2) & 0xff
        i += 3; p += 1
      }
      PpmImage(w, h, sr, sg, sb)
    }
  }

  /** Perceptual difference-hash (dHash) of a binary PPM: the raster
    * is nearest-neighbor sampled onto a 9×8 integer-luminance grid
    * (lum = r+g+b — integer-exact, no float weights; sample (x, y)
    * reads source pixel (x·w div 9, y·h div 8)), and bit (x, y) of
    * the 64-bit hash is 1 iff lum(x, y) > lum(x+1, y) — the
    * horizontal-gradient signature that survives re-encoding,
    * brightness shifts, and mild noise, which exact content hashing
    * ([[ppmContentHash]]) cannot. All-integer end to end so an
    * oracle can regenerate it arithmetically. None for non-P6. */
  def ppmDHash(payload: Array[Byte]): Option[Long] =
    parsePpmHeader(payload).map { case (w, h, off) =>
      def lum(gx: Int, gy: Int): Int = {
        val sx = gx * w / 9
        val sy = gy * h / 8
        val i = off + (sy * w + sx) * 3
        (payload(i) & 0xff) + (payload(i + 1) & 0xff) +
          (payload(i + 2) & 0xff)
      }
      var bits = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (lum(gx, gy) > lum(gx + 1, gy))
            bits |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      bits
    }

  /** Pixel-content fingerprint of a binary PPM: a base-131 mod-1e9+7
    * polynomial over (width, height, pixel bytes) — an identity that
    * depends only on the decoded raster, so byte-identical content
    * hashes equal regardless of how the file arrived (the
    * metadata-independent key an image-dedup pass groups on). None
    * for anything that is not well-formed 8-bit P6. */
  def ppmContentHash(payload: Array[Byte]): Option[Long] =
    parsePpmHeader(payload).map { case (w, h, off) =>
      var acc = 0L
      acc = (acc * 131 + w) % 1000000007L
      acc = (acc * 131 + h) % 1000000007L
      var i = off
      val end = off + w * h * 3
      while (i < end) {
        acc = (acc * 131 + (payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      acc
    }

  /** REAL image resize: nearest-neighbor downsample of a binary PPM
    * by integer `factor` — output pixel (ox, oy) = source pixel
    * (ox*factor, oy*factor), output dims = ceil(dim/factor). Indexes
    * the source plane in place (no intermediate raster allocation —
    * the batch-processing shape a 100 TB thumbnailing pass needs) and
    * returns the resized dimensions + per-channel sums. None when the
    * payload is not a well-formed 8-bit P6. */
  def resizePpm(payload: Array[Byte], factor: Int): Option[PpmImage] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    parsePpmHeader(payload).map { case (w, h, off) =>
      val w2 = (w + factor - 1) / factor
      val h2 = (h + factor - 1) / factor
      var (sr, sg, sb) = (0L, 0L, 0L)
      var oy = 0
      while (oy < h2) {
        var ox = 0
        val rowBase = off + oy * factor * w * 3
        while (ox < w2) {
          val k = rowBase + ox * factor * 3
          sr += payload(k) & 0xff
          sg += payload(k + 1) & 0xff
          sb += payload(k + 2) & 0xff
          ox += 1
        }
        oy += 1
      }
      PpmImage(w2, h2, sr, sg, sb)
    }
  }

  /** One video's frame-sampling digest. */
  case class FrameSample(n_frames: Int, n_sampled: Int, sum_sampled: Long)

  /** REAL frame sampling: treat the payload as `n_frames` consecutive
    * fixed-size frames (a trailing partial frame is ignored, like a
    * truncated container tail), keep every `stride`-th frame, and
    * digest the kept frames' bytes. The byte-level form of the
    * every-Nth-frame sampling a video training pipeline runs before
    * feature extraction. */
  def sampleFrames(payload: Array[Byte], frameBytes: Int,
      stride: Int): FrameSample = {
    require(frameBytes >= 1 && stride >= 1,
      s"frameBytes/stride must be >= 1, got $frameBytes/$stride")
    val nf = payload.length / frameBytes
    var s = 0L
    var sampled = 0
    var f = 0
    while (f < nf) {
      if (f % stride == 0) {
        sampled += 1
        var k = f * frameBytes
        val end = k + frameBytes
        while (k < end) { s += payload(k) & 0xff; k += 1 }
      }
      f += 1
    }
    FrameSample(nf, sampled, s)
  }

  /** REAL image decode for the formats the JDK ships codecs for —
    * JPEG, PNG, GIF, BMP — via `javax.imageio.ImageIO` (zero external
    * dependencies; `ImageIO.read` sniffs the container magic itself).
    * Returns the same [[PpmImage]] digest shape as [[decodePpm]]:
    * dimensions + per-channel sums over the sRGB raster. None when
    * the payload is not a decodable image (ImageIO returns null on
    * unrecognized magic; a truncated/corrupt container throws — both
    * map to None so callers fall back like the PPM path). */
  def decodeImageIO(payload: Array[Byte]): Option[PpmImage] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth; val h = img.getHeight
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        PpmImage(w, h, sr, sg, sb)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Full image decode chain: the byte-exact PPM codec first (cheap
    * magic check), then the JDK's JPEG/PNG/GIF/BMP codecs. */
  def decodeImage(payload: Array[Byte]): Option[PpmImage] =
    decodePpm(payload).orElse(decodeImageIO(payload))

  /** Encode the synthetic raster `pixel(k) = (id*7 + k*13) % 256`
    * (the [[syntheticPpm]] formula, shared so the SQL oracles restate
    * ONE generation rule) as PNG or JPEG bytes via ImageIO. PNG is
    * lossless, so a decode of the PNG bytes must reproduce the
    * formula sums exactly; JPEG is lossy, so q161 checks dims exactly
    * and pixel sums within a stated band. */
  def encodeImage(id: Long, format: String): Array[Byte] = {
    val w = 4 + (id % 8).toInt
    val h = 3 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var k = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + k * 13) % 256).toInt
        val g = ((id * 7 + (k + 1) * 13) % 256).toInt
        val b = ((id * 7 + (k + 2) * 13) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        k += 3; x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** STUB decode — deterministic fake standing in for codecs the JDK
    * does NOT ship (video containers, compressed audio). Image
    * formats no longer route here: [[decodeImage]] handles PPM
    * byte-exactly and JPEG/PNG/GIF/BMP via ImageIO. Derives metadata
    * purely from payload bytes so tests and oracles are
    * reproducible. */
  def decodeStub(kind: String, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    kind match {
      case "image" => MediaMeta(1 + b0 % 64, 1 + payload.length % 64, 0, 0L)
      case "audio" => MediaMeta(0, 0, 8000 + (b0 % 4) * 8000,
        payload.length.toLong * 1000 / 16)
      case _       => MediaMeta(16, 9, 0, payload.length.toLong * 40)
    }
  }

  /** Kind-dispatched byte-level op (the real-computation placeholder
    * for resize / resample / frame-sample):
    *   image → stride-16 byte sample ("resize"),
    *   audio → first-256-byte window sum,
    *   video → every-100th-byte sum ("frame sample"). */
  def blobOp(kind: String, payload: Array[Byte]): Long = kind match {
    case "image" =>
      var s = 0L; var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 16 }
      s
    case "audio" =>
      var s = 0L; var i = 0
      val n = math.min(256, payload.length)
      while (i < n) { s += payload(i) & 0xff; i += 1 }
      s
    case _ =>
      var s = 0L; var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 100 }
      s
  }

  /** Batch feature extraction: one partition = one closure call =
    * one (stub) decoder lifetime. Returns a typed Dataset — schema
    * checked at compile time. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    // Range-partition count follows the session's shuffle parallelism
    // (a fixed literal would cap the stage regardless of cluster size).
    val parts = blobs.sparkSession.sessionState.conf.numShufflePartitions
    blobs
      .repartitionByRange(parts, col("media_id"))
      .mapPartitions { it =>
        // decoder init would happen HERE, once per partition
        it.map { b =>
          // Real codecs first (byte-exact PPM, then the JDK's
          // JPEG/PNG/GIF/BMP via ImageIO), stub for everything else —
          // PpmImage fields are -1 sentinels when the payload is not a
          // decodable raster, so downstream can filter on ppm_w >= 0.
          val ppm = if (b.kind == "image") decodeImage(b.payload) else None
          val meta = ppm match {
            case Some(img) => MediaMeta(img.width, img.height, 0, 0L)
            case None      => decodeStub(b.kind, b.payload)
          }
          var checksum = 0L
          var i = 0
          while (i < b.payload.length) { checksum += b.payload(i) & 0xff; i += 1 }
          MediaFeatures(b.media_id, b.kind, b.payload.length, checksum,
            blobOp(b.kind, b.payload), meta.width,
            ppm.map(_.width).getOrElse(-1), ppm.map(_.height).getOrElse(-1),
            ppm.map(_.sumRgb).getOrElse(-1L))
        }
      }
  }

  /** Deterministic synthetic P6 fixture: width `4 + id%8`, height
    * `3 + id%5`, pixel byte k = `(id*7 + k*13) % 256`. The q81 oracle
    * restates this generation formula independently in SQL, so what
    * the query checks is the DECODER ([[decodePpm]]), end to end. */
  def syntheticPpm(id: Long): Array[Byte] = {
    val w = 4 + (id % 8).toInt
    val h = 3 + (id % 5).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(k => ((id * 7 + k * 13) % 256).toByte)
    header ++ px
  }

  /** [[syntheticPpm]] with a uniform brightness shift — the
    * "re-encoded / brightness-tweaked copy" a perceptual dedup pass
    * must group with its base while exact content hashing keeps them
    * apart. Bytes wrap mod 256 like the base generator. */
  def syntheticPpmVariant(base: Long, shift: Long): Array[Byte] = {
    val w = 4 + (base % 8).toInt
    val h = 3 + (base % 5).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(w * h * 3)(k =>
      ((base * 7 + k * 13 + shift) % 256).toByte)
    header ++ px
  }

  /** One decoded audio container: declared rate/channels plus the raw
    * 16-bit little-endian signed PCM payload. */
  case class WavAudio(sampleRate: Int, channels: Int, pcm: Array[Byte])

  /** REAL audio-container decode for the formats the JDK ships codecs
    * for — RIFF/WAV (plus AIFF/AU) via `javax.sound.sampled`, zero
    * external dependencies; the audio sibling of [[decodeImageIO]].
    * The container's sample stream is normalized to 16-bit signed
    * little-endian PCM (WAV's native layout — a no-op copy there;
    * other widths convert through AudioSystem), so the bytes feed
    * [[pcmWindowEnergy]] directly. None when the payload carries no
    * recognizable audio container magic (the unsupported-format
    * exception), matching the image chain's fall-through contract. */
  def decodeWavAudio(payload: Array[Byte]): Option[WavAudio] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val base = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          2 * base.getChannels, base.getSampleRate, false)
        val conv = AudioSystem.getAudioInputStream(target, in)
        try {
          val pcm = conv.readAllBytes()
          Some(WavAudio(base.getSampleRate.toInt, base.getChannels, pcm))
        } finally conv.close()
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Wrap the [[syntheticPcm]] sample formula in a REAL RIFF/WAV
    * container via the JDK encoder (mono, 16-bit little-endian,
    * `8000 + (id%4)*8000` Hz — the stub's rate rule, now carried by an
    * actual container header). WAV is lossless PCM, so a decode of
    * these bytes must reproduce the formula's samples exactly — the
    * audio analogue of q161's PNG parity contract. */
  def encodeWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    val pcm = syntheticPcm(id)
    val rate = (8000 + (id % 4) * 8000).toFloat
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, 1, 2, rate, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One audio clip's windowed-energy digest. */
  case class AudioEnergy(n_samples: Int, n_windows: Int, sum_abs: Long,
      max_window_abs: Long)

  /** REAL audio decode + windowing: parse the payload as little-endian
    * signed 16-bit PCM (byte-level two's-complement reassembly) and
    * compute per-window absolute-amplitude sums over complete
    * `windowSamples`-sample windows (a partial tail window is ignored,
    * like a truncated stream). The byte-level form of the
    * energy/VAD-style windowing an audio training pipeline runs before
    * segment selection. */
  def pcmWindowEnergy(payload: Array[Byte], windowSamples: Int): AudioEnergy = {
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    val n = payload.length / 2
    val nw = n / windowSamples
    var sumAbs = 0L
    var maxW = 0L
    var w = 0
    while (w < nw) {
      var s = w * windowSamples
      val end = s + windowSamples
      var acc = 0L
      while (s < end) {
        val lo = payload(2 * s) & 0xff
        val hi = payload(2 * s + 1) // SIGNED high byte: sign-extends
        val v = (hi << 8) | lo
        acc += math.abs(v)
        s += 1
      }
      sumAbs += acc
      if (acc > maxW) maxW = acc
      w += 1
    }
    AudioEnergy(n, nw, sumAbs, maxW)
  }

  /** Deterministic synthetic PCM fixture: `256 + (id%4)*64` samples,
    * sample s = `(id*31 + s*77) % 4096 - 2048` (signed, ±2048),
    * little-endian int16. The q84 oracle restates the formula in SQL,
    * so what the query checks is the byte-level PCM DECODE + windowing
    * ([[pcmWindowEnergy]]) — including negative-sample sign handling. */
  def syntheticPcm(id: Long): Array[Byte] = {
    val n = 256 + (id % 4).toInt * 64
    val out = new Array[Byte](n * 2)
    var s = 0
    while (s < n) {
      val v = ((id * 31 + s * 77) % 4096 - 2048).toInt
      out(2 * s) = (v & 0xff).toByte
      out(2 * s + 1) = ((v >> 8) & 0xff).toByte
      s += 1
    }
    out
  }

  /** Deterministic synthetic "video" fixture: `6 + id%5` frames of 48
    * bytes each, frame f's byte k = `(id*11 + f*17 + k*19) % 256`.
    * The q83 oracle restates this formula independently in SQL, so
    * what the query checks is the SAMPLER ([[sampleFrames]]). */
  def syntheticVideo(id: Long): Array[Byte] = {
    val frames = 6 + (id % 5).toInt
    val frameBytes = 48
    Array.tabulate(frames * frameBytes)(k =>
      ((id * 11 + (k / frameBytes) * 17 + (k % frameBytes) * 19) % 256).toByte)
  }

  /** Deterministic fake media table derived from `documents`: payload
    * = UTF-8 bytes of the text, kind cycles image/audio/video. Only
    * pure-ASCII docs are kept so a SQL oracle can mirror the byte
    * arithmetic with chr()/ascii() — the plumbing doesn't care. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaBlob] = {
    import docs.sparkSession.implicits._
    docs
      .filter(length(col("text")) === octet_length(col("text")))
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaBlob]
  }
}
