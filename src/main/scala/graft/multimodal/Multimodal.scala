package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads carried as
  * opaque `binary` columns with typed metadata, processed batch-wise.
  *
  * The decode step is a STUB — this container has no image/audio
  * codecs, so [[decodeStub]] derives deterministic fake metadata from
  * the payload bytes and says so loudly. Everything AROUND the stub
  * is real and is what actually matters at 100 TB:
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
      checksum: Long, op_sum: Long, meta_width: Int)

  /** STUB decode — deterministic fake standing in for libjpeg/ffmpeg
    * (not present in this environment). Derives metadata purely from
    * payload bytes so tests and oracles are reproducible. */
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
          val meta = decodeStub(b.kind, b.payload)
          var checksum = 0L
          var i = 0
          while (i < b.payload.length) { checksum += b.payload(i) & 0xff; i += 1 }
          MediaFeatures(b.media_id, b.kind, b.payload.length, checksum,
            blobOp(b.kind, b.payload), meta.width)
        }
      }
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
