package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing (training-pipeline first-class operator):
  * binary payload columns + typed metadata, batched feature extraction
  * with a deterministic stub decoder. The byte-statistics "brightness"
  * is reproduced exactly by the oracle, so the full binary pipeline is
  * hash-checked, not just row-counted.
  */
object MultimodalQueries {

  // -- q56: binary payload pipeline — synthesize (bytes, meta) →
  //         mapPartitions batch "decode" → per-item features
  private def q56(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(media(s, dir)).toDF()
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), round(col("brightness"), 6).as("brightness"))
      .orderBy(col("doc_id"))

  // ASCII text ⇒ each byte = ascii code; brightness = avg(code)/255.
  private val q56Sql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  CAST(n_chars % 640 + 16 AS INT) AS width,
      |  CAST(doc_id % 480 + 16 AS INT) AS height,
      |  round(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
      |    i -> ascii(text[i:i]))) * 1.0 / octet_length(encode(text)) / 255.0, 6)
      |    AS brightness
      |FROM documents ORDER BY doc_id""".stripMargin

  private def media(s: SparkSession, dir: String) = {
    import s.implicits._
    Multimodal.synthesize(Tables.load(s, dir, "documents"))
      .select(col("doc_id").as("docId"), col("payload"), col("meta").as("meta"))
      .as[Multimodal.MediaRow]
  }

  // -- q88: resize stage — aspect-preserving dims (fit 320×240, floor,
  //         ≥1, never upscale) + area-proportional stub re-encode, then
  //         feature extraction over the resized payload
  private def q88(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.resize(media(s, dir), 320, 240)).toDF()
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), round(col("brightness"), 6).as("brightness"))
      .orderBy(col("doc_id"))

  private val q88Sql =
    """WITH m AS (
      |  SELECT doc_id, text,
      |    CAST(n_chars % 640 + 16 AS INT) AS w0,
      |    CAST(doc_id % 480 + 16 AS INT) AS h0,
      |    octet_length(encode(text)) AS len0
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, text, len0,
      |    least(1.0, least(320.0 / w0, 240.0 / h0)) AS scale, w0, h0
      |  FROM m),
      |sized AS (
      |  SELECT doc_id, text,
      |    CAST(greatest(1, floor(w0 * scale)) AS INT) AS width,
      |    CAST(greatest(1, floor(h0 * scale)) AS INT) AS height,
      |    -- floor, not CAST: DuckDB CAST(double AS INT) rounds, while the
      |    -- pipeline's .toInt truncates
      |    greatest(1, least(len0, CAST(floor(len0 * scale * scale) AS INT))) AS n_bytes
      |  FROM r)
      |SELECT doc_id, n_bytes, width, height,
      |  round(list_sum(list_transform(range(1, n_bytes + 1),
      |    i -> ascii(text[i:i]))) * 1.0 / n_bytes / 255.0, 6) AS brightness
      |FROM sized ORDER BY doc_id""".stripMargin

  // -- q89: frame sampling — k=4 evenly spaced frame indices per item
  //         (i·nFrames/4, deduplicated), per-frame stub byte count
  private def q89(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(s, dir), 4)
      .orderBy(col("doc_id"), col("frame_idx"))

  private val q89Sql =
    """WITH m AS (
      |  SELECT doc_id, CAST(n_chars % 30 + 1 AS INT) AS nf,
      |    octet_length(encode(text)) AS len0
      |  FROM documents)
      |SELECT DISTINCT doc_id, CAST((i * nf) // 4 AS INT) AS frame_idx,
      |  CAST(greatest(1, len0 // nf) AS INT) AS n_frame_bytes
      |FROM m, range(0, 4) t(i)
      |ORDER BY doc_id, frame_idx""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q56_multimodal_features", q56, Some(q56Sql)),
    Q("q88_media_resize", q88, Some(q88Sql)),
    Q("q89_frame_sample", q89, Some(q89Sql)))
}
