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
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.synthesize(Tables.load(s, dir, "documents"))
      .select(col("doc_id").as("docId"), col("payload"),
        col("meta").as("meta"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media).toDF()
      .select(col("docId").as("doc_id"), col("nBytes").as("n_bytes"),
        col("width"), col("height"), round(col("brightness"), 6).as("brightness"))
      .orderBy(col("doc_id"))
  }

  // ASCII text ⇒ each byte = ascii code; brightness = avg(code)/255.
  private val q56Sql =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  CAST(n_chars % 640 + 16 AS INT) AS width,
      |  CAST(doc_id % 480 + 16 AS INT) AS height,
      |  round(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
      |    i -> ascii(text[i:i]))) * 1.0 / octet_length(encode(text)) / 255.0, 6)
      |    AS brightness
      |FROM documents ORDER BY doc_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q56_multimodal_features", q56, Some(q56Sql)))
}
