package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, StubDecoder}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("batched decode preserves rows, partitioning, and is deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val media = Multimodal.documentsAsMedia(docs).repartition(4)
    val out = Multimodal.decodeAll(media, new StubDecoder(embeddingDim = 8), batchSize = 16)

    assert(out.rdd.getNumPartitions == 4, "mapPartitions preserves partitioning")
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.length == 100)
    assert(rows.forall(_.embedding.length == 8), "fixed-size feature vectors")
    assert(rows.forall(r => r.n_frames == r.n_bytes / 64), "frame sampling stub")

    val again = Multimodal.decodeAll(media, new StubDecoder(8), batchSize = 7)
      .collect().sortBy(_.doc_id)
    assert(rows.map(_.checksum).toSeq == again.map(_.checksum).toSeq,
      "batch size does not affect results")
  }

  test("frame sampling slices strided fixed-size frames; resize keeps aspect") {
    val media = Seq(MediaRow(1L, "video/stub", Array.tabulate(300)(_.toByte))).toDS()
    val frames = Multimodal.frameSample(media, frameSize = 64, stride = 2).collect()
    // 300 bytes → 4 whole frames (0..3), stride 2 → frames 0 and 2
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.frame_bytes.length == 64))
    assert(frames(1).frame_bytes(0) == 128.toByte, "frame 2 starts at byte 128")

    val feats = Multimodal.decodeAll(media, new StubDecoder(4))
    val resized = Multimodal.resizeMeta(feats, targetWidth = 224).collect()
    assert(resized.forall(_.width == 224))
    assert(resized.forall(_.height >= 1))
  }

  test("ImageIoDecoder decodes real PNG bytes: dims and pixel digest match the closed form") {
    val ids = Seq(0L, 3L, 7L, 41L, 123L)
    val media = ids.map(id =>
      MediaRow(id, "image/png", Multimodal.syntheticPng(id))).toDS()
    val out = Multimodal.decodeAll(media, new Multimodal.ImageIoDecoder(8))
      .collect().sortBy(_.doc_id)
    // The closed form the c07 oracle recomputes in SQL: pixel (x, y) of
    // doc d is (d*31 + x*7 + y*13) % 256 row-major on (16+d%8)×(12+d%5).
    for ((f, id) <- out.zip(ids)) {
      val w = 16 + (id % 8).toInt
      val h = 12 + (id % 5).toInt
      assert(f.width == w && f.height == h, s"dims for $id")
      var cs = 7L
      for (y <- 0 until h; x <- 0 until w)
        cs = (cs * 31 + (id * 31 + x * 7 + y * 13) % 256) % 1000000007L
      assert(f.checksum == cs, s"pixel digest for $id — the decoder read real pixels")
      assert(f.n_frames == 1 && f.embedding.length == 8)
      assert(f.embedding.forall(e => e >= 0f && e < 1f))
    }
  }

  test("ImageIoDecoder handles BMP via the same JDK road and stub-falls-back on undecodable payloads") {
    // BMP: a second real container through the identical decode path.
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 5) img.getRaster.setSample(x, y, 0, x * 10 + y)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val garbage = Array.tabulate[Byte](100)(i => (i * 37).toByte)
    val media = Seq(
      MediaRow(1L, "image/bmp", bos.toByteArray),
      MediaRow(2L, "video/raw", garbage)).toDS()
    val out = Multimodal.decodeAll(media, new Multimodal.ImageIoDecoder(8))
      .collect().sortBy(_.doc_id)
    assert(out(0).width == 5 && out(0).height == 4, "BMP decoded for real")
    var cs = 7L
    for (y <- 0 until 4; x <- 0 until 5) cs = (cs * 31 + x * 10 + y) % 1000000007L
    assert(out(0).checksum == cs, "BMP pixels digest-exact")
    // No ImageIO reader for raw bytes: the documented stub boundary.
    val stubbed = new StubDecoder(8).decode(Seq(MediaRow(2L, "video/raw", garbage))).head
    assert(out(1).checksum == stubbed.checksum &&
      out(1).width == stubbed.width && out(1).height == stubbed.height &&
      out(1).n_frames == stubbed.n_frames &&
      out(1).embedding.toSeq == stubbed.embedding.toSeq,
      "undecodable payloads take the deterministic stub road")
  }

  test("WavDecoder decodes real WAV bytes: rate/frames and sample digest match the closed form") {
    val ids = Seq(0L, 3L, 41L, 63L, 200L)
    val media = ids.map(id =>
      MediaRow(id, "audio/wav", Multimodal.syntheticWav(id))).toDS()
    val out = Multimodal.decodeAll(media, new Multimodal.WavDecoder(8))
      .collect().sortBy(_.doc_id)
    // The closed form the c08 oracle recomputes in SQL: frame i of doc
    // d is the unsigned 16-bit value (d*31 + i*7) % 65536 over
    // 200 + d%64 frames at 8 kHz mono.
    for ((f, id) <- out.zip(ids)) {
      val n = 200 + (id % 64).toInt
      assert(f.width == 8000 && f.height == 1 && f.n_frames == n, s"format for $id")
      var cs = 7L
      for (i <- 0 until n) cs = (cs * 31 + (id * 31 + i * 7) % 65536) % 1000000007L
      assert(f.checksum == cs, s"sample digest for $id — the decoder read real PCM frames")
      assert(f.embedding.length == 8 && f.embedding.forall(e => e >= 0f && e < 1f))
    }
  }

  test("WavDecoder handles stereo and big-endian PCM; stub-falls-back on undecodable payloads") {
    // Stereo interleaved frames: channel 0 carries i*3, channel 1 noise
    // the digest must IGNORE; big-endian flag exercises the other byte
    // order through the identical decode path.
    def wav(nFrames: Int, channels: Int, bigEndian: Boolean): Array[Byte] = {
      val pcm = new Array[Byte](nFrames * 2 * channels)
      for (i <- 0 until nFrames; c <- 0 until channels) {
        val s = (if (c == 0) i * 3 - 32768 else i * 11 - 5) // ch0 = unsigned i*3
        val off = (i * channels + c) * 2
        if (bigEndian) { pcm(off) = ((s >> 8) & 0xff).toByte; pcm(off + 1) = (s & 0xff).toByte }
        else { pcm(off) = (s & 0xff).toByte; pcm(off + 1) = ((s >> 8) & 0xff).toByte }
      }
      val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, channels, true, bigEndian)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val garbage = Array.tabulate[Byte](80)(i => (i * 53).toByte)
    val media = Seq(
      MediaRow(1L, "audio/wav", wav(40, 2, bigEndian = false)),
      MediaRow(2L, "audio/wav", wav(40, 1, bigEndian = true)),
      MediaRow(3L, "audio/raw", garbage)).toDS()
    val out = Multimodal.decodeAll(media, new Multimodal.WavDecoder(8))
      .collect().sortBy(_.doc_id)
    var cs = 7L
    for (i <- 0 until 40) cs = (cs * 31 + i * 3) % 1000000007L
    assert(out(0).height == 2 && out(0).n_frames == 40 && out(0).checksum == cs,
      "stereo: digest over channel 0 only, frame count per-channel")
    // NOTE: the JDK WAV writer normalizes PCM to little-endian in the
    // container regardless of the stream's endianness flag — both clips
    // must decode to the identical channel-0 digest.
    assert(out(1).height == 1 && out(1).n_frames == 40 && out(1).checksum == cs,
      "big-endian input: same samples, same digest")
    val stubbed = new StubDecoder(8).decode(Seq(MediaRow(3L, "audio/raw", garbage))).head
    assert(out(2).checksum == stubbed.checksum && out(2).width == stubbed.width,
      "undecodable payloads take the deterministic stub road")
  }

  test("decoder batches never exceed the configured size") {
    val media = (1L to 50L).map(i => MediaRow(i, "image/stub", Array.fill(10)(i.toByte)))
      .toDS().repartition(2)
    val sizes = media.mapPartitions(_.grouped(16).map(_.size)).collect()
    assert(sizes.forall(_ <= 16) && sizes.sum == 50)
  }
}
