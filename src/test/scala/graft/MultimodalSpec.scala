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

  test("decoder batches never exceed the configured size") {
    val media = (1L to 50L).map(i => MediaRow(i, "image/stub", Array.fill(10)(i.toByte)))
      .toDS().repartition(2)
    val sizes = media.mapPartitions(_.grouped(16).map(_.size)).collect()
    assert(sizes.forall(_ <= 16) && sizes.sum == 50)
  }
}
