package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: schema contract, batch shape, stub decode
  * determinism, byte-op correctness on known payloads. */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("decode stub is deterministic and kind-dispatched") {
    val payload = "abcdef".getBytes("UTF-8")
    val m1 = decodeStub("image", payload)
    val m2 = decodeStub("image", payload)
    assert(m1 === m2)
    assert(m1.width === 1 + 'a'.toInt % 64)
    assert(decodeStub("audio", payload).sampleRateHz >= 8000)
    assert(decodeStub("video", payload).durationMs === 6L * 40)
  }

  test("blob ops compute known values") {
    val bytes = Array.fill[Byte](32)(1)
    assert(blobOp("image", bytes) === 2L) // positions 0,16
    assert(blobOp("audio", bytes) === 32L) // all 32 < 256
    assert(blobOp("video", bytes) === 1L)  // position 0 only
  }

  test("extractFeatures: typed schema, checksum = sum of payload bytes") {
    import spark.implicits._
    val blobs = Seq(
      MediaBlob(1L, "image", Array[Byte](10, 20, 30)),
      MediaBlob(2L, "audio", Array[Byte](5, 5))).toDS()
    val out = extractFeatures(blobs).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).toSeq === Seq(60L, 10L))
    assert(out.map(_.n_bytes).toSeq === Seq(3, 2))
    assert(out(0).meta_width === 1 + 10 % 64)
  }

  test("mediaFromDocuments keeps only ASCII payloads, kinds cycle") {
    import spark.implicits._
    val docs = Seq(
      (0L, "plain ascii"), (1L, "café non-ascii"), (2L, "more ascii"))
      .toDF("doc_id", "text")
    val blobs = mediaFromDocuments(docs).collect().sortBy(_.media_id)
    assert(blobs.map(_.media_id).toSeq === Seq(0L, 2L)) // doc 1 dropped
    assert(blobs.map(_.kind).toSeq === Seq("image", "video"))
    assert(new String(blobs(0).payload, "UTF-8") === "plain ascii")
  }

  test("partitioning: range partition by media_id spreads blobs") {
    import spark.implicits._
    val blobs = (0L until 100L).map(i =>
      MediaBlob(i, "image", Array[Byte](i.toByte))).toDS()
    val parts = extractFeatures(blobs).rdd.getNumPartitions
    // follows the session's shuffle parallelism, not a fixed literal
    assert(parts === spark.sessionState.conf.numShufflePartitions)
  }
}
