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

  test("decoder batches never exceed the configured size") {
    val media = (1L to 50L).map(i => MediaRow(i, "image/stub", Array.fill(10)(i.toByte)))
      .toDS().repartition(2)
    val sizes = media.mapPartitions(_.grouped(16).map(_.size)).collect()
    assert(sizes.forall(_ <= 16) && sizes.sum == 50)
  }
}
