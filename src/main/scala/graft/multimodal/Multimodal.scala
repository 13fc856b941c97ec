package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, processed in BATCHES inside
  * `mapPartitions` — the Scala analog of arrow-batched Python UDFs: one
  * decoder instance per partition, rows processed in fixed-size batches,
  * schema and partitioning carried by the Dataset encoder.
  *
  * Real codecs ship where the JDK provides them with zero dependencies:
  * [[ImageIoDecoder]] (PNG/JPEG/BMP/GIF via `javax.imageio`) and
  * [[WavDecoder]] (WAV/PCM via `javax.sound.sampled`). [[StubDecoder]]
  * produces deterministic pseudo-features from the bytes and remains
  * the documented fallback boundary for containers the JDK cannot
  * parse (video, exotic formats). The Spark-side contract — batch
  * shape, per-partition decoder lifecycle, typed output schema — is
  * identical across all three; swapping in another codec touches only
  * [[MediaDecoder.decode]].
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

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF
    * — zero new dependencies, works in-sandbox; the r18 verdict's item
    * 4). Per decoded image:
    *
    *  - `width`/`height` from the actual raster;
    *  - `checksum` = the polynomial fold `h = (h*31 + sample) % P`
    *    over band-0 samples in row-major order (init 7 — the same fold
    *    family as `graft_poly_hash`), an ORDER-EXACT pixel digest: a
    *    decoder that reads any pixel wrongly, out of order, or with a
    *    color-model drift breaks it (c07's oracle recomputes it in
    *    closed form for synthetic rasters);
    *  - `embedding` = 8 coarse vertical-strip features (mean band-0
    *    sample per `x % 8` strip, scaled to [0,1)) — integer-exact
    *    before the final division;
    *  - `n_frames` = 1 (still image).
    *
    * A payload `ImageIO` has no reader for (video containers, audio,
    * corrupt bytes) falls back to the deterministic [[StubDecoder]]
    * features — the documented stub boundary, now only for formats the
    * JDK cannot parse. One decoder instance per partition, same batch
    * contract as every [[MediaDecoder]]. */
  final class ImageIoDecoder(embeddingDim: Int = 8) extends MediaDecoder {
    private val P = 1000000007L
    @transient private lazy val stub = new StubDecoder(embeddingDim)
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: java.io.IOException => null }
      if (img == null) stub.decode(Seq(r)).head
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var cs = 7L
        val strips = new Array[Long](embeddingDim)
        val counts = new Array[Long](embeddingDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val s = raster.getSample(x, y, 0).toLong
            cs = (cs * 31 + s) % P
            strips(x % embeddingDim) += s
            counts(x % embeddingDim) += 1
            x += 1
          }
          y += 1
        }
        val emb = Array.tabulate(embeddingDim)(d =>
          if (counts(d) == 0) 0f
          else (strips(d).toDouble / counts(d) / 256.0).toFloat)
        MediaFeatures(
          doc_id = r.doc_id, media_type = r.media_type,
          n_bytes = r.payload.length.toLong,
          width = w, height = h, n_frames = 1, checksum = cs, embedding = emb)
      }
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/RIFF
    * PCM + the other `AudioSystem` container readers — zero new
    * dependencies; the audio member of the codec family next to
    * [[ImageIoDecoder]]). Per decoded clip:
    *
    *  - `width` = sample rate in Hz, `height` = channel count,
    *    `n_frames` = PCM frame count — the audio analog of raster dims;
    *  - `checksum` = the polynomial fold `h = (h*31 + u) % P` over
    *    channel-0 samples in frame order, where `u` is the UNSIGNED
    *    16-bit representation (`signed + 32768`) — an ORDER-EXACT
    *    sample digest in the same fold family as the pixel digest and
    *    `graft_poly_hash`; PCM is lossless, so the decoded samples are
    *    container-encoder-independent and c08's oracle recomputes this
    *    in closed form without seeing the bytes;
    *  - `embedding` = 8 coarse features (mean unsigned channel-0 sample
    *    per `frame_idx % 8` comb, scaled to [0,1)) — integer-exact
    *    before the final division.
    *
    * Only 16-bit signed PCM is digested (both endiannesses, any channel
    * count); payloads `AudioSystem` has no reader for — or non-PCM16
    * encodings — fall back to the deterministic [[StubDecoder]], the
    * same documented stub boundary as the image side. One decoder
    * instance per partition, same batch contract as every
    * [[MediaDecoder]]. */
  final class WavDecoder(embeddingDim: Int = 8) extends MediaDecoder {
    private val P = 1000000007L
    @transient private lazy val stub = new StubDecoder(embeddingDim)
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { r =>
      val parsed: Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val fmt = in.getFormat
            if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                || fmt.getSampleSizeInBits != 16 || fmt.getFrameSize <= 0) None
            else Some((fmt, in.readAllBytes()))
          } finally in.close()
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException => None
        }
      parsed match {
        case None => stub.decode(Seq(r)).head
        case Some((fmt, bytes)) =>
          val frameSize = fmt.getFrameSize
          val nFrames = bytes.length / frameSize
          val (lo, hi) = if (fmt.isBigEndian) (1, 0) else (0, 1)
          var cs = 7L
          val combs = new Array[Long](embeddingDim)
          val counts = new Array[Long](embeddingDim)
          var i = 0
          while (i < nFrames) {
            val off = i * frameSize
            val s = ((bytes(off + hi) << 8) | (bytes(off + lo) & 0xff)).toShort.toLong
            val u = s + 32768L
            cs = (cs * 31 + u) % P
            combs(i % embeddingDim) += u
            counts(i % embeddingDim) += 1
            i += 1
          }
          val emb = Array.tabulate(embeddingDim)(d =>
            if (counts(d) == 0) 0f
            else (combs(d).toDouble / counts(d) / 65536.0).toFloat)
          MediaFeatures(
            doc_id = r.doc_id, media_type = r.media_type,
            n_bytes = r.payload.length.toLong,
            width = fmt.getSampleRate.toInt, height = fmt.getChannels,
            n_frames = nFrames, checksum = cs, embedding = emb)
      }
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

  /** Deterministic synthetic grayscale PNG: pixel (x, y) of doc `d` is
    * `(d*31 + x*7 + y*13) % 256` on a `(16 + d%8) × (12 + d%5)` raster,
    * PNG-encoded. PNG is LOSSLESS, so the decoded samples are
    * encoder-independent even where the encoded bytes are not — c07's
    * oracle recomputes [[ImageIoDecoder]]'s pixel digest for these
    * rasters in closed form without ever seeing the bytes. Runs on
    * executors (pure function of the id). */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 8).toInt
    val h = 12 + (docId % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic mono PCM16 WAV: frame `i` of doc `d` is the
    * unsigned 16-bit value `(d*31 + i*7) % 65536` (stored signed-LE,
    * i.e. `u - 32768`) over `200 + d%64` frames at 8 kHz, containerized
    * by the JDK's own WAV writer. PCM is LOSSLESS, so the decoded
    * samples are encoder-independent — c08's oracle recomputes
    * [[WavDecoder]]'s sample digest for these clips in closed form
    * without ever seeing the bytes. Runs on executors (pure function of
    * the id). */
  def syntheticWav(docId: Long): Array[Byte] = {
    val n = 200 + (docId % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((docId * 31 + i * 7) % 65536) - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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
