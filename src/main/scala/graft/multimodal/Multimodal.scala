package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed in partition-local batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but everything Spark-side is real
  * and tested: the schema (binary payload + metadata struct), the
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas`: decode
  * amortized over a batch, not per-row), partitioning, and the typed
  * feature output that downstream queries aggregate.
  */
object Multimodal {

  /** One media row: payload + the metadata a real ingest would carry. */
  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (what a real decoder/extractor would emit). */
  final case class MediaFeatures(
      media_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, feature: Array[Float])

  /** STUB decode kernel — deterministic fake standing in for an image/audio
    * decoder (e.g. libjpeg/ffmpeg bindings, absent in this container).
    * Derives stable pseudo-dimensions and an 8-float pseudo-embedding from
    * the payload bytes so tests are reproducible. Swap this function for a
    * real codec; nothing else changes.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val h = java.util.Arrays.hashCode(row.payload)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val feature = Array.tabulate(8)(i =>
      (((h * (i + 1)) % 1000) / 1000.0f))
    MediaFeatures(row.media_id, row.mime, row.payload.length.toLong, width, height, feature)
  }

  /** Batched feature extraction: partition-local, decode amortized over
    * `batchSize` rows (the mapInPandas batch shape). No shuffle — features
    * for 100 TB of media cost one scan.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // a real decoder would init codec state once per batch here
        batch.map(decodeStub)
      }
    }
  }

  /** STUB resize kernel: a real implementation scales pixel buffers; the
    * stub rescales the pseudo-dimensions deterministically so the batch
    * plumbing (same mapPartitions shape as extractFeatures) is testable.
    */
  def resizeStub(f: MediaFeatures, maxSide: Int): MediaFeatures = {
    val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
    f.copy(width = math.max(1, (f.width * scale).toInt),
      height = math.max(1, (f.height * scale).toInt))
  }

  def resize(features: Dataset[MediaFeatures], maxSide: Int = 256,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions(_.grouped(batchSize).flatMap(_.map(resizeStub(_, maxSide))))
  }

  /** STUB frame sampling: a real implementation decodes every k-th video
    * frame; the stub derives `n` deterministic frame payloads from the
    * source bytes. One media row → n frame rows (the flatMap/explode shape
    * of frame extraction).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      (0 until n).map { i =>
        val frame = m.payload.map(b => (b ^ i).toByte)
        MediaRow(m.media_id * 1000 + i, frame, "image/frame")
      }
    }
  }

  /** Build a media table from any text corpus (payload = utf-8 bytes) —
    * a deterministic fixture generator for the plumbing tests and the
    * rows-only harness query.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }
}
