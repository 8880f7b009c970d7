package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — everything around it (schema,
  * batch iteration, partitioning, output shape) is the real pipeline a
  * codec-backed decoder would plug into.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, nFrames: Int)
  final case class MediaRow(docId: Long, payload: Array[Byte], meta: MediaMeta)
  final case class Feature(docId: Long, nBytes: Int, width: Int, height: Int,
      brightness: Double)

  /** STUB decoder: a real implementation would call an image/audio codec
    * on `payload`. The fake derives deterministic "pixels" from byte
    * statistics so the pipeline shape (bytes → per-item features) is
    * exercised end-to-end. */
  def decodeStub(payload: Array[Byte], meta: MediaMeta): Feature = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val brightness = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length / 255.0
    Feature(-1L, payload.length, meta.width, meta.height, brightness)
  }

  /** Batched feature extraction — the Scala analog of `mapInPandas`:
    * one iterator per partition, items processed in a tight loop, no
    * per-row task overhead. This is where a vectorized decoder (or an
    * Arrow-backed Python worker) would run. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r => decodeStub(r.payload, r.meta).copy(docId = r.docId) }
    }
  }

  /** Attach a synthetic binary payload + metadata struct to the documents
    * table (the test corpus has no real media; payload = UTF-8 bytes). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("n_chars") % 30 + 1).cast("int").as("nFrames")).as("meta"))
}
