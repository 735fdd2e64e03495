package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media as opaque `binary` columns with typed
 * metadata, processed in partition-local batches.
 *
 * The Spark-side mechanics are real and tested — schema (binary + metadata),
 * partitioning, batched per-partition processing shape (fixed-size batches
 * the way an accelerator-backed decoder would want them), typed Datasets in
 * and out. The DECODER ITSELF IS A STUB: this container has no image/audio
 * libraries, so `decodeStub` computes deterministic pseudo-features
 * (bytewise moments) where a real deployment would plug an actual decode /
 * resize / frame-sample kernel into the same batch loop.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, media: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      features: Array[Float])

  /** Batch size a real decoder kernel would be fed (GPU-friendly shape). */
  val DecodeBatchSize = 64

  /**
   * STUB decode / feature-extract. Deterministic function of the bytes:
   * [length-scale, mean byte, variance, first-byte, last-byte] — stands in
   * for (image resize -> CNN features) or (audio resample -> fbank).
   */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes.isEmpty) return Array(0f, 0f, 0f, 0f, 0f)
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      sum += v; sumSq += v.toLong * v
      i += 1
    }
    val n = bytes.length.toDouble
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    Array(math.log1p(n).toFloat, mean.toFloat, variance.toFloat,
      (bytes(0) & 0xFF).toFloat, (bytes(bytes.length - 1) & 0xFF).toFloat)
  }

  /** Partition-local batched decode: the mapPartitions plumbing is real. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a real kernel would decode `batch` in one device call
        batch.map(r => MediaFeatures(r.doc_id, r.media_type, r.media.length,
          decodeStub(r.media)))
      }
    }
  }

  /**
   * Driver-checkable query: documents' text bytes treated as opaque media
   * payloads -> batched feature extraction -> scalar projection.
   */
  def featureQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        encode(col("text"), "utf-8").as("media"))
      .as[MediaRow]
    extractFeatures(media)
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("features"), 2).cast("double"), 3).as("mean_byte"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s, dir) => featureQuery(s, dir)))

  val oracles: Map[String, String] = Map.empty
}
