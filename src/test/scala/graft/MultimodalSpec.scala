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

  test("decoder batches never exceed the configured size") {
    val media = (1L to 50L).map(i => MediaRow(i, "image/stub", Array.fill(10)(i.toByte)))
      .toDS().repartition(2)
    val sizes = media.mapPartitions(_.grouped(16).map(_.size)).collect()
    assert(sizes.forall(_ <= 16) && sizes.sum == 50)
  }
}
