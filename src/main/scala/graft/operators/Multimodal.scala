package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — SURVEY.md §2C.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside; decode/feature-extract runs per-partition over Arrow-sized
  * batches.
  *
  * Codec status (r15 extended): IMAGES and WAV AUDIO decode for REAL via
  * the pure-JDK codecs — [[decodeImage]] (javax.imageio: PNG/JPEG/BMP/GIF,
  * exact integer per-channel pixel sums), [[resizeImagePng]] (explicit
  * nearest-neighbor pixel mapping — deterministic on any JVM, unlike
  * Graphics2D filtering — re-encoded as PNG), and [[decodeWavPcm]]
  * (javax.sound.sampled: PCM frame/channel/rate + exact absolute-amplitude
  * sum). No third-party media library is needed or used. VIDEO remains
  * honestly stubbed ([[decodeStub]]/[[sampleFrames]] — the JDK ships no
  * video codec): deterministic per-blob byte features keep the plumbing —
  * schema, partitioning, batch iteration, typed output — real and
  * testable, and a real codec drop-in replaces only the inner function
  * (exactly what decodeImage does for images). The stub remains the
  * feature fn of the byte-level keys (c12/c14/c15/c21, DuckDB-replicable
  * as-is); the REAL codecs are oracle-gated by the c118/c119 ROUNDTRIP
  * keys — encode [[patternPng]]/[[patternWav]], decode with the real
  * codec, and match a closed-form SQL oracle that never runs a codec
  * (losslessness makes decode∘encode the identity) — plus exact-pixel
  * unit tests (TextAndVariantSpec).
  *
  * Scale: `mapPartitions`/narrow map keeps decode per-executor with zero
  * shuffle (the documented mapPartitions exception class); feature outputs
  * are columnar structs, so downstream pruning still works. Decoded pixels
  * never leave the executor — only fixed-width feature rows do.
  */
object Multimodal {

  // ~1 KB media payloads never need ImageIO's temp-FILE stream cache;
  // with the default useCache=true every ImageIO.read(InputStream) /
  // write(…, OutputStream) creates and deletes a temp file per row —
  // pure wasted I/O plus temp-dir contention across executor threads on
  // the c118 hot path. Scoped fix (NOT the JVM-global setUseCache, which
  // would mutate host-process behavior as a class-load side effect):
  // hand ImageIO explicit memory-backed image streams.
  private def readImg(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // ImageIO.read(ImageInputStream) CLOSES the stream itself when a
    // reader ran (unlike every other overload) — but not when it returns
    // null; the swallow covers the double-close
    try javax.imageio.ImageIO.read(iis)
    finally (try iis.close() catch { case _: java.io.IOException => () })
  }

  private def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, "png", ios); () } finally ios.close()
    bos.toByteArray
  }

  /** Feature schema produced by the (stubbed) decoder. */
  case class MediaFeatures(n_bytes: Long, byte_sum: Long,
                           h0: Long, h1: Long, h2: Long, h3: Long)

  /** Deterministic fake decode — replace with a real codec at deploy. */
  def decodeStub(payload: Array[Byte]): MediaFeatures = {
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      hist(b >> 6) += 1
      i += 1
    }
    MediaFeatures(payload.length.toLong, sum, hist(0), hist(1), hist(2), hist(3))
  }

  /** The shared feature-extraction plumbing: typed per-partition
    * iteration over (id, payload) with a null-guard, one decode fn per
    * media type (the Scala analogue of `mapInPandas` batch plumbing), no
    * shuffle. ONE definition so the null-guard and output naming cannot
    * drift across the stub/image/audio extractors. */
  private def extractWith[T](df: DataFrame, idCol: String, payloadCol: String,
                             decode: Array[Byte] => T)(
      implicit in: org.apache.spark.sql.Encoder[(Long, Array[Byte])],
      out: org.apache.spark.sql.Encoder[(Long, T)]): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          (id, decode(if (payload == null) Array.emptyByteArray else payload))
        }
      }
      .toDF("media_id", "features")

  /** Attach decoded (stub) features to a DataFrame with an id column and
    * a binary payload column. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    extractWith(df, idCol, payloadCol, decodeStub)
  }

  /** Deterministic fake resize — nearest-neighbor downsample of the byte
    * stream to at most `target` bytes (stride = ceil(len/target)). A real
    * image/audio resampler drops in here; the distributed shape (narrow
    * per-row transform, no shuffle, binary in/binary out so ops chain) is
    * the real thing. */
  def resizeStub(payload: Array[Byte], target: Int): Array[Byte] = {
    require(target > 0, "resize target must be positive")
    if (payload.length <= target) payload
    else {
      val s = (payload.length + target - 1) / target
      val out = new Array[Byte]((payload.length + s - 1) / s)
      var i = 0
      while (i < out.length) { out(i) = payload(i * s); i += 1 }
      out
    }
  }

  /** Resize payloads and report before/after stats — the typed
    * per-partition plumbing of a media resize stage. */
  def resize(df: DataFrame, idCol: String, payloadCol: String, target: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          val r = resizeStub(p, target)
          (id, p.length.toLong, r, r.length.toLong, r.foldLeft(0L)((a, b) => a + (b & 0xff)))
        }
      }
      .toDF("media_id", "n_bytes", "resized", "r_bytes", "r_sum")
  }

  /** REAL image features via the JDK codec (javax.imageio —
    * PNG/JPEG/BMP/GIF/WBMP). Exact integers over the decoded ARGB pixels:
    * dimensions, per-channel sums, and a 4-bucket integer-luma histogram
    * (luma = (r+g+b) div 3 ∈ [0,255], buckets of 64 — the byte-histogram
    * convention of [[decodeStub]] lifted to pixels). Deterministic: the
    * decoded pixel array is a pure function of the payload for a given
    * codec, and every feature is an integer sum over it (no float
    * accumulation). `ok = false` (all-zero features) for payloads ImageIO
    * cannot parse — undecodable blobs are data, not exceptions, in a
    * 100 TB ingest. */
  case class ImageFeatures(ok: Boolean, width: Long, height: Long,
                           r_sum: Long, g_sum: Long, b_sum: Long,
                           l0: Long, l1: Long, l2: Long, l3: Long)

  def decodeImage(payload: Array[Byte]): ImageFeatures =
    // catch NonFatal, not just IOException: JDK ImageReaders are known to
    // throw unchecked exceptions (ArrayIndexOutOfBounds, NegativeArraySize,
    // IllegalArgument) on crafted/corrupt headers — an undecodable blob
    // must surface as ok=false data, never as an executor task failure
    try {
      val img = readImg(payload)
      if (img == null) ImageFeatures(ok = false, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      else {
        val w = img.getWidth; val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        val lh = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            rs += r; gs += g; bs += b
            lh(((r + g + b) / 3) >> 6) += 1
            x += 1
          }
          y += 1
        }
        ImageFeatures(ok = true, w.toLong, h.toLong, rs, gs, bs,
          lh(0), lh(1), lh(2), lh(3))
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        ImageFeatures(ok = false, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    }

  /** Attach REAL decoded image features — the [[extractWith]] plumbing
    * with [[decodeImage]] as the inner function. Narrow map, no shuffle;
    * pixels never leave the executor. */
  def extractImageFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    extractWith(df, idCol, payloadCol, decodeImage)
  }

  /** REAL image resize: decode (JDK codec), explicit nearest-neighbor
    * sample onto the target grid — src pixel (x·sw div tw, y·sh div th),
    * integer math only, so the OUTPUT PIXELS are bit-identical on any JVM
    * (Graphics2D filtering would be implementation-defined) — and
    * re-encode as PNG (lossless; byte stream may differ across encoder
    * versions, pixels cannot — tests assert via re-decode). Returns None
    * for undecodable payloads. */
  def resizeImagePng(payload: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, "resize target must be positive")
    val img =
      try readImg(payload)
      catch { case scala.util.control.NonFatal(_) => null } // see decodeImage
    if (img == null) None
    else {
      val sw = img.getWidth; val sh = img.getHeight
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB(x * sw / tw, y * sh / th))
          x += 1
        }
        y += 1
      }
      Some(writePng(out))
    }
  }

  /** REAL WAV/AIFF audio features via the JDK codec (javax.sound.sampled).
    * Exact integers over the PCM stream: frame count, channels, sample
    * rate (Hz, floored), and the sum of absolute sample amplitudes across
    * all channels (16-bit signed samples read per the stream's declared
    * endianness; 8-bit streams are unsigned-centered per the WAV spec).
    * PCM is raw — decode is exact on any engine. `ok = false` zeros for
    * payloads the codec cannot parse or non-PCM encodings. */
  case class AudioFeatures(ok: Boolean, n_frames: Long, channels: Long,
                           rate_hz: Long, amp_abs_sum: Long)

  def decodeWavPcm(payload: Array[Byte]): AudioFeatures =
    // NonFatal over the WHOLE body (incl. the stream read): undecodable
    // or truncated blobs are ok=false data, never executor task failures
    // — the decodeImage contract
    try {
      import javax.sound.sampled.{AudioSystem, AudioFormat}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val pcmSigned = f.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val pcmUnsigned = f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = f.getSampleSizeInBits
        if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16))
          AudioFeatures(ok = false, 0, 0, 0, 0)
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val nFrames = bytes.length.toLong / f.getFrameSize
          // bound the sample walk at whole frames so amp_abs_sum and
          // n_frames describe the SAME population (a truncated
          // multi-channel tail otherwise leaks partial-frame samples
          // into the sum)
          val limit = (nFrames * f.getFrameSize).toInt
          var sum = 0L
          var i = 0
          while (i + bytesPerSample <= limit) {
            val v =
              if (bits == 8) {
                val raw = bytes(i) & 0xff
                if (pcmUnsigned) raw - 128 else bytes(i).toInt
              } else {
                val b0 = bytes(i) & 0xff; val b1 = bytes(i + 1) & 0xff
                val raw = if (f.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                // unsigned 16-bit centers on 32768 (silence = 32768 raw);
                // signed sign-extends via Short
                if (pcmUnsigned) raw - 32768 else raw.toShort.toInt
              }
            sum += math.abs(v.toLong)
            i += bytesPerSample
          }
          AudioFeatures(ok = true, nFrames, f.getChannels.toLong,
            f.getSampleRate.toLong, sum)
        }
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => AudioFeatures(ok = false, 0, 0, 0, 0)
    }

  /** Attach REAL decoded audio features — same [[extractWith]] plumbing. */
  def extractAudioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    extractWith(df, idCol, payloadCol, decodeWavPcm)
  }

  /** Deterministic RGB test-pattern PNG keyed by id — the fixture
    * generator of the codec-roundtrip oracle key (c118): w = 4 + id%5,
    * h = 3 + id%4, and with ro = id%256,
    *   r(x,y) = (x·31 + ro) % 256
    *   g(x,y) = (y·57 + 2·ro) % 256
    *   b(x,y) = ((x+y)·13 + 3·ro) % 256.
    * PNG is lossless, so decode(patternPng(id)) returns EXACTLY these
    * pixels — which is what lets a SQL oracle recompute
    * [[decodeImage]]'s features in closed form without any codec. Keep
    * the formulas in lockstep with the c118 oracle SQL. */
  def patternPng(id: Long): Array[Byte] = {
    val w = (4 + java.lang.Math.floorMod(id, 5L)).toInt
    val h = (3 + java.lang.Math.floorMod(id, 4L)).toInt
    val ro = java.lang.Math.floorMod(id, 256L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 31 + ro) % 256
        val g = (y * 57 + 2 * ro) % 256
        val b = ((x + y) * 13 + 3 * ro) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** Deterministic 16-bit LE mono 8000 Hz WAV keyed by id — the c119
    * roundtrip fixture: n = 4 + id%5 samples,
    *   s_i = (sd·131 + i·257) % 20000 − 10000, sd = id%97
    * (∈ [−10000, 4375], exercises negative amplitudes). PCM is raw, so
    * [[decodeWavPcm]] recovers exactly these samples; keep in lockstep
    * with the c119 oracle SQL. */
  def patternWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (4 + java.lang.Math.floorMod(id, 5L)).toInt
    val sd = java.lang.Math.floorMod(id, 97L).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (sd * 131 + i * 257) % 20000 - 10000
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Typed metadata a real media table would carry next to the payload. */
  def withMediaMetadata(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      length(col(payloadCol)).cast("long").as("n_bytes"),
      lit("application/octet-stream").as("mime"),
      crc32(col(payloadCol)).as("checksum")))

  /** Frame sampling for video-like payloads: split each blob into `k`
    * fixed-stride chunks ("frames") and emit one row per frame with its
    * decoded features — the UDTF/explode shape of a real frame sampler,
    * with the codec stubbed like [[decodeStub]].
    *
    * Chunk math: stride q = ceil(len/k); frame j covers bytes
    * [j*q, min((j+1)*q, len)); frames past the end of a short payload are
    * not emitted. One narrow flatMap — no shuffle; output is
    * (media_id, frame_idx, features).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, k: Int): DataFrame = {
    require(k > 0, s"frame count k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        val q = (p.length + k - 1) / k
        if (q == 0) Iterator.empty
        else (0 until k).iterator
          .map(j => (j, math.min(j * q, p.length), math.min((j + 1) * q, p.length)))
          .filter { case (_, s, e) => e > s }
          .map { case (j, s, e) => (id, j, decodeStub(java.util.Arrays.copyOfRange(p, s, e))) }
      }
      .toDF("media_id", "frame_idx", "features")
  }
}
