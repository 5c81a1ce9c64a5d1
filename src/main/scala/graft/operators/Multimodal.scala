package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — SURVEY.md §2C.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * alongside; decode/feature-extract runs per-partition over Arrow-sized
  * batches. The actual codec is STUBBED (no image/audio libs in this
  * container): [[decodeStub]] computes deterministic per-blob features
  * (length, byte-sum, 4-bucket byte histogram) so the Spark-side plumbing —
  * schema, partitioning, batch iteration, typed output — is real and
  * testable, and a codec drop-in replaces only the inner function.
  *
  * Scale: `mapPartitions` keeps decode per-executor with zero shuffle;
  * feature outputs are columnar structs, so downstream pruning still works.
  */
object Multimodal {

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

  /** Attach decoded features to a DataFrame with an id column and a binary
    * payload column. Typed per-partition iteration (the Scala analogue of
    * `mapInPandas` batch plumbing), no shuffle. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          (id, decodeStub(if (payload == null) Array.emptyByteArray else payload))
        }
      }
      .toDF("media_id", "features")
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
