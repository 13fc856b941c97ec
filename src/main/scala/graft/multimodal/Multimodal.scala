package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed in BATCHES inside
  * `mapPartitions` — the Scala analog of arrow-batched Python UDFs: one
  * decoder instance per partition, rows processed in fixed-size batches,
  * schema and partitioning carried by the Dataset encoder.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[StubDecoder]] produces deterministic pseudo-features
  * from the bytes. The Spark-side contract — batch shape, per-partition
  * decoder lifecycle, typed output schema — is real and tested; swapping
  * in a real codec touches only [[MediaDecoder.decode]].
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long,
      embedding: Array[Float])

  /** A batched decoder: one instance per partition (amortizes model/codec
    * init, exactly like a Pandas-UDF worker). */
  trait MediaDecoder extends Serializable {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for a real image/audio codec. A production
    * decoder would parse the container format here (???); the stub
    * derives stable pseudo-metadata from the payload bytes so tests can
    * assert exact values. */
  final class StubDecoder(embeddingDim: Int = 8) extends MediaDecoder {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
      val bytes = r.payload
      var h = 7L
      var i = 0
      while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      val emb = Array.tabulate(embeddingDim)(d => (((h + d * 131) % 1000) / 1000.0).toFloat)
      MediaFeatures(
        doc_id = r.doc_id, media_type = r.media_type, n_bytes = bytes.length.toLong,
        width = (h % 640).toInt, height = (h % 480).toInt,
        n_frames = bytes.length / 64, checksum = h, embedding = emb)
    }
  }

  /** Decode a media Dataset in fixed-size batches per partition. The
    * partitioning of the input is preserved (no shuffle); at 100 TB the
    * input should be range/bucket partitioned by doc_id upstream so
    * decode parallelism equals partition count. */
  def decodeAll(media: Dataset[MediaRow], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(batch => decoder.decode(batch.toSeq))
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: slice every `stride`-th fixed-size frame out of each
    * payload (the video-keyframe access pattern). Pure per-row compute —
    * no shuffle; output partitioning follows the input. */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 64, stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.payload.length / frameSize
      (0 until n by stride).map { i =>
        Frame(r.doc_id, i, r.payload.slice(i * frameSize, (i + 1) * frameSize))
      }
    }
  }

  /** Resize stub: recompute target dims preserving aspect ratio — the
    * arithmetic shell of the real kernel (a codec call would replace the
    * body; the signature and per-batch shape are the contract). */
  def resizeMeta(features: Dataset[MediaFeatures], targetWidth: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val w = math.max(f.width, 1)
      val scaled = math.max((f.height.toLong * targetWidth / w).toInt, 1)
      f.copy(width = targetWidth, height = scaled)
    }
  }

  /** Wrap a text table as fake media payloads (testing shim: documents
    * stand in for a binary corpus). */
  def documentsAsMedia(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents
      .select(col("doc_id"), lit("image/stub").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
