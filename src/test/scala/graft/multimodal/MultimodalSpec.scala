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

  test("ImageIO decode: PNG round-trip is byte-exact vs the PPM formula, " +
      "JPEG dims exact and sums in band, garbage -> None") {
    (0L until 25L).foreach { id =>
      // the PPM codec and the PNG encode→ImageIO decode chain must
      // agree on the SAME raster — one generation rule, two codecs
      val ppm = decodePpm(syntheticPpm(id)).get
      val png = decodeImage(encodeImage(id, "png")).get
      assert(png === ppm, s"PNG round-trip diverged for id=$id")
      val jpg = decodeImage(encodeImage(id, "jpg")).get
      assert(jpg.width === ppm.width && jpg.height === ppm.height)
      val dev = (math.abs(jpg.sumR - ppm.sumR) + math.abs(jpg.sumG - ppm.sumG)
        + math.abs(jpg.sumB - ppm.sumB)).toDouble /
        (ppm.width.toLong * ppm.height * 3)
      // q161's stated band is 32; pin the measured headroom at half
      assert(dev <= 16.0, s"JPEG channel-sum deviation $dev for id=$id")
    }
    assert(decodeImageIO("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(decodeImageIO(Array.empty[Byte]).isEmpty)
    // a truncated PNG container must map to None, not throw
    val png = encodeImage(3L, "png")
    assert(decodeImageIO(png.take(png.length / 2)).isEmpty)
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

  test("decodePpm parses a real P6 raster: header grammar, comments, " +
      "channel sums") {
    // 2x2 RGB image, hand-built: pixels (1,2,3)(4,5,6)(7,8,9)(10,11,12)
    val px = Array.tabulate[Byte](12)(i => (i + 1).toByte)
    val img = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    val d = decodePpm(img).get
    assert((d.width, d.height) === (2, 2))
    assert(d.sumR === 1 + 4 + 7 + 10)
    assert(d.sumG === 2 + 5 + 8 + 11)
    assert(d.sumB === 3 + 6 + 9 + 12)
    // malformed inputs fall back to None, never throw
    assert(decodePpm("P6\n2 2\n255\n".getBytes ++ px.take(5)).isEmpty) // truncated
    assert(decodePpm("P6\n0 2\n255\n".getBytes).isEmpty)  // zero dim
    assert(decodePpm("P6\n2 2\n65535\n".getBytes ++ px).isEmpty) // 16-bit
    assert(decodePpm("P3\n2 2\n255\n".getBytes).isEmpty)  // ASCII ppm
    assert(decodePpm("not an image".getBytes).isEmpty)
    // non-whitespace byte where the single maxval separator belongs:
    // must reject, not decode a plane shifted into the garbage
    assert(decodePpm("P6\n2 2\n255X".getBytes ++ px).isEmpty)
    // dimension token past Int.MaxValue must read as malformed, not
    // wrap to a small positive value that passes the guards
    assert(decodePpm(s"P6\n${Int.MaxValue.toLong + 2} 1\n255\n".getBytes
      ++ px).isEmpty)
    // round-trip with the synthetic fixture generator
    val s = decodePpm(syntheticPpm(13L)).get
    assert((s.width, s.height) === (4 + 13 % 8, 3 + 13 % 5))
    assert(s.sumRgb === (0 until s.width * s.height * 3)
      .map(k => (13L * 7 + k * 13) % 256).sum)
  }

  test("resizePpm: nearest-neighbor stride, ceil dims, malformed -> None") {
    // 3x3 image, factor 2 -> 2x2 keeping pixels (0,0),(2,0),(0,2),(2,2)
    val px = Array.tabulate[Byte](27)(i => (i + 1).toByte)
    val img = "P6\n3 3\n255\n".getBytes("US-ASCII") ++ px
    val r = resizePpm(img, 2).get
    assert((r.width, r.height) === (2, 2))
    // kept pixel base offsets: 0, 6, 18, 24 (RGB triples, 1-based bytes)
    assert(r.sumR === 1 + 7 + 19 + 25)
    assert(r.sumG === 2 + 8 + 20 + 26)
    assert(r.sumB === 3 + 9 + 21 + 27)
    // factor 1 = identity (same sums as full decode)
    val full = decodePpm(img).get
    assert(resizePpm(img, 1).get === full.copy())
    assert(resizePpm("garbage".getBytes, 2).isEmpty)
  }

  test("pcmWindowEnergy: LE int16 sign handling, complete windows only") {
    // samples: 100, -100, 32767, -32768, 1 (partial window of 2 dropped)
    def le(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val payload = Seq(100, -100, 32767, -32768, 1).flatMap(le).toArray
    val e = pcmWindowEnergy(payload, 2)
    assert(e.n_samples === 5)
    assert(e.n_windows === 2)
    assert(e.sum_abs === (100 + 100) + (32767 + 32768))
    assert(e.max_window_abs === 32767 + 32768)
    // synthetic round trip: encode then decode recovers the formula
    val s = pcmWindowEnergy(syntheticPcm(3L), 64)
    assert(s.n_samples === 256 + 3 % 4 * 64)
    assert(s.sum_abs === (0 until s.n_windows * 64)
      .map(k => math.abs((3L * 31 + k * 77) % 4096 - 2048)).sum)
  }

  test("WAV container decode: JDK round-trip is PCM-lossless, an " +
      "independently-encoded checked-in fixture decodes to the exact " +
      "energy digest, junk bytes -> None") {
    // JDK encode -> JDK decode: header fields + exact PCM bytes back
    val wav = decodeWavAudio(encodeWav(3L)).get
    assert(wav.sampleRate === 32000) // 8000 + (3%4)*8000
    assert(wav.channels === 1)
    assert(wav.pcm.toSeq === syntheticPcm(3L).toSeq)
    // the checked-in fixture was written by an INDEPENDENT encoder
    // (CPython's wave module) from the same id=3 sample formula — a
    // header-parse or endianness defect cannot cancel out across two
    // encoders
    val bytes = {
      val in = getClass.getResourceAsStream("/fixtures/audio_id3.wav")
      try in.readAllBytes() finally in.close()
    }
    val fix = decodeWavAudio(bytes).get
    assert(fix.sampleRate === 32000)
    assert(fix.channels === 1)
    val e = pcmWindowEnergy(fix.pcm, 64)
    val expected = pcmWindowEnergy(syntheticPcm(3L), 64)
    assert(e === expected)
    // no container magic -> None (the image-chain fall-through contract)
    assert(decodeWavAudio(Array[Byte](0x00, 0x13, 0x37)).isEmpty)
    assert(decodeWavAudio(Array.emptyByteArray).isEmpty)
  }

  test("sampleFrames: every stride-th frame, partial tail ignored") {
    // 3.5 frames of 4 bytes: frames 0,1,2 complete, 2 trailing bytes
    val payload = Array.tabulate[Byte](14)(i => (i + 1).toByte)
    val s = sampleFrames(payload, 4, 2)
    assert(s.n_frames === 3)
    assert(s.n_sampled === 2) // frames 0 and 2
    assert(s.sum_sampled === (1 + 2 + 3 + 4) + (9 + 10 + 11 + 12))
    val all = sampleFrames(payload, 4, 1)
    assert(all.n_sampled === 3)
  }

  test("partitioning: range partition by media_id spreads blobs") {
    import spark.implicits._
    val blobs = (0L until 100L).map(i =>
      MediaBlob(i, "image", Array[Byte](i.toByte))).toDS()
    val parts = extractFeatures(blobs).rdd.getNumPartitions
    // follows the session's shuffle parallelism, not a fixed literal
    assert(parts === spark.sessionState.conf.numShufflePartitions)
  }

  test("ppmContentHash: content identity, pixel sensitivity, non-P6 -> None") {
    val a = syntheticPpm(3)
    val b = syntheticPpm(3)
    assert(ppmContentHash(a) === ppmContentHash(b)) // same content, same hash
    assert(ppmContentHash(a).isDefined)
    // flipping one pixel byte must change the fingerprint
    val c = a.clone()
    c(c.length - 1) = ((c(c.length - 1) + 1) & 0xff).toByte
    assert(ppmContentHash(c) !== ppmContentHash(a))
    // different generator seed -> different raster -> different hash
    assert(ppmContentHash(syntheticPpm(4)) !== ppmContentHash(a))
    assert(ppmContentHash("not a ppm".getBytes("US-ASCII")).isEmpty)
  }

  test("dHash: invariant under a wrap-free brightness shift (exactly " +
      "where content hashing splits), sensitive to a gradient flip") {
    import graft.multimodal.Multimodal._
    // hand-built 9x8 raster with pixel bytes in [40, 140]: a +20
    // shift cannot wrap, so every luminance GRADIENT is preserved
    val w = 9; val h = 8
    def ppm(shift: Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val px = Array.tabulate(w * h * 3)(k =>
        ((40 + (k * 37) % 100 + shift) & 0xff).toByte)
      header ++ px
    }
    val base = ppm(0); val bright = ppm(20)
    assert(ppmDHash(base).isDefined)
    assert(ppmDHash(base) === ppmDHash(bright),
      "perceptual hash must survive a wrap-free brightness shift")
    assert(ppmContentHash(base) !== ppmContentHash(bright),
      "content hash must split what the perceptual hash groups")
    // flip one sampled gradient: bump the (0,0) sample far above its
    // right neighbor
    val flipped = ppm(0)
    val off = s"P6\n$w $h\n255\n".getBytes("US-ASCII").length
    flipped(off) = 255.toByte
    flipped(off + 1) = 255.toByte
    flipped(off + 2) = 255.toByte
    assert(ppmDHash(flipped) !== ppmDHash(base))
    assert(ppmDHash("nope".getBytes("US-ASCII")).isEmpty)
  }

  test("q186 perceptual groups partition the 25 media ids and merge " +
      "exact-distinct contents") {
    val out = graft.queries.MultimodalQ.perceptualDedup(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum === 25L)
    // at least one perceptual group merged >1 exact-distinct raster
    val merged = out.filter(_.getLong(0) > 1)
    assert(merged.nonEmpty)
    assert(merged.exists(r => r.getLong(3) > r.getLong(1)),
      "no perceptual group merged distinct contents")
  }
}
