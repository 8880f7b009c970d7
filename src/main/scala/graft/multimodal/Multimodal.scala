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

  /** Aspect-preserving resize stage: target dims fit within maxW×maxH
    * (scale = min(1, maxW/w, maxH/h), never upscaled, floor to ≥1 px).
    * The dimension arithmetic is the real pipeline; the payload
    * re-encode is the STUB part — a codec would resample pixels, the
    * fake keeps a deterministic byte prefix proportional to the area
    * ratio so downstream byte statistics stay hash-checkable. */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val scale = math.min(1.0, math.min(
          maxW.toDouble / r.meta.width, maxH.toDouble / r.meta.height))
        val w = math.max(1, math.floor(r.meta.width * scale).toInt)
        val h = math.max(1, math.floor(r.meta.height * scale).toInt)
        val n = math.max(1, math.min(r.payload.length,
          (r.payload.length * scale * scale).toInt))
        r.copy(payload = r.payload.take(n),
          meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame-sampling stage: k evenly spaced frame indices per item
    * (idx_i = i·nFrames/k, deduplicated — short clips yield fewer
    * frames), one output row per sampled frame. Frame extraction is the
    * STUB part (per-frame byte count = payload/nFrames); the fan-out
    * shape, index math, and schema are the real video pipeline. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(k >= 1, s"k must be >= 1: $k")
    media.flatMap { r =>
      val nf = math.max(1, r.meta.nFrames)
      (0 until k).map(i => i * nf / k).distinct.map { fi =>
        (r.docId, fi, math.max(1, r.payload.length / nf))
      }
    }.toDF("doc_id", "frame_idx", "n_frame_bytes")
  }

  /** 16-bit blockwise perceptual hash (aHash family): the payload is
    * split into 16 equal byte ranges (floor boundaries) and bit c is
    * set iff range c's mean byte value exceeds the whole-payload mean.
    * A real image pipeline would hash downsampled pixel luminance; the
    * byte-statistics form exercises the identical sketch+compare
    * machinery on the stub decode. The bit decision is the EXACT
    * integer cross-compare s_c·n > total·len_c — no float means, so
    * any engine reproduces the hash bit-for-bit. Returns 0 for
    * payloads under 16 bytes (no meaningful blocks). */
  def phash16(payload: Array[Byte]): Int = {
    val n = payload.length
    if (n < 16) return 0
    val bounds = (0 to 16).map(i => (i.toLong * n / 16).toInt)
    var total = 0L
    var i = 0
    while (i < n) { total += payload(i) & 0xff; i += 1 }
    var h = 0
    var c = 0
    while (c < 16) {
      var s = 0L
      var j = bounds(c)
      while (j < bounds(c + 1)) { s += payload(j) & 0xff; j += 1 }
      val len = bounds(c + 1) - bounds(c)
      if (s * n > total * len) h |= (1 << c)
      c += 1
    }
    h
  }

  /** Per-item perceptual hashes: (doc_id, width, ph) — batched
    * mapPartitions like the other media stages; width rides along as
    * the natural blocking key for hash comparison (same-resolution
    * media compare, the standard practice). */
  def phashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.docId, r.meta.width, phash16(r.payload).toLong))
    }.toDF("doc_id", "width", "ph")
  }

  /** Overlapped fixed-window segmentation — the audio-chunking stage
    * (frame/window + hop, the STFT/feature-extraction convention; the
    * byte-range arithmetic is the real pipeline, per-window "energy"
    * over stub-decoded bytes stands in for a codec's samples). One
    * output row per (item, window): (doc_id, seg_idx, start_byte,
    * n_seg_bytes, s = exact byte sum). Windows start every `hop`
    * bytes while inside the payload; the last window truncates. */
  def segment(media: Dataset[MediaRow], window: Int, hop: Int): DataFrame = {
    import media.sparkSession.implicits._
    require(window >= 1 && hop >= 1, s"window/hop must be >= 1")
    media.flatMap { r =>
      val n = r.payload.length
      Iterator.from(0).takeWhile(i => i * hop < n).map { i =>
        val st = i * hop
        val len = math.min(window, n - st)
        var s = 0L
        var j = st
        while (j < st + len) { s += r.payload(j) & 0xff; j += 1 }
        (r.docId, i.toLong, st.toLong, len.toLong, s)
      }.toList
    }.toDF("doc_id", "seg_idx", "start_byte", "n_seg_bytes", "s")
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
