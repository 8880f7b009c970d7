package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.semantic.SimilarityJoins
import graft.text.{TextFunctions => TF}

/** Relationship-discovery similarity joins (SURVEY.md §2.3): SAME_SOURCE /
  * SAME_DOMAIN grouping, SIMILAR_TAGS / SIMILAR_CONTENT token Jaccard,
  * and the TEMPORAL_PROXIMITY range join.
  */
object SimilarityQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // -- q23: SAME_SOURCE / SAME_DOMAIN pair discovery, aggregated per group
  private def q23(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.groupPairCounts(docs(s, dir), Seq("source", "lang"))
      .select(col("source"), col("lang"), col("n"), col("n_pairs"))
      .orderBy(col("source"), col("lang"))

  private val q23Sql =
    """SELECT source, lang, count(*) AS n,
      |  CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
      |FROM documents GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  // -- q24: SIMILAR_TAGS — token-set Jaccard join blocked by source, with
  //         the reference's confidence formula. Prefix-filtered candidates
  //         (exact — identical output to the block cross product, verified
  //         by the unchanged exact oracle below).
  private def q24(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.prefixJaccardJoin(docs(s, dir), "source", "text", 0.7)
      .select(col("blk"), col("a_id"), col("b_id"),
        round(col("sim"), 6).as("sim"), round(col("confidence"), 6).as("confidence"))
      .orderBy(col("blk"), col("a_id"), col("b_id"))

  private val q24Sql =
    """WITH t AS (
      |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents)
      |SELECT blk, a_id, b_id, round(sim, 6) AS sim,
      |  round(least(0.95, 0.6 + (sim - 0.7) * 0.4), 6) AS confidence
      |FROM (
      |  SELECT a.source AS blk, a.doc_id AS a_id, b.doc_id AS b_id,
      |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
      |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
      |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      ELSE 0.0 END AS sim
      |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id) x
      |WHERE sim > 0.7
      |ORDER BY blk, a_id, b_id""".stripMargin

  // -- q25: SIMILAR_CONTENT — stopworded token Jaccard, higher bar
  private def q25(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.prefixJaccardJoin(docs(s, dir), "lang", "text", 0.8,
        stopworded = true)
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("sim")), 6).as("avg_sim"))
      .orderBy(col("blk"))

  private val q25Sql = {
    val sw = TF.stopwords("en").map(w => s"'$w'").mkString(",")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_filter(list_distinct(string_split(text, ' ')),
       |      w -> w NOT IN ($sw)) AS toks
       |  FROM documents)
       |SELECT blk, count(*) AS n_pairs, round(avg(sim), 6) AS avg_sim
       |FROM (
       |  SELECT a.lang AS blk,
       |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
       |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
       |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
       |      ELSE 0.0 END AS sim
       |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id) x
       |WHERE sim > 0.8
       |GROUP BY blk ORDER BY blk""".stripMargin
  }

  // -- q26: TEMPORAL_PROXIMITY range join — bucketed band join on
  //         (user, 300 s window), exact |Δt| predicate after
  private def q26(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.temporalProximity(Tables.load(s, dir, "events"),
        "user_id", "event_id", "ts", windowSec = 300L)
      .select(col("k").as("user_id"), col("a_id"), col("b_id"),
        col("delta_sec"), round(col("confidence"), 6).as("confidence"))
      .orderBy(col("user_id"), col("a_id"), col("b_id"))

  private val q26Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      |  abs(a.sec - b.sec) AS delta_sec,
      |  round(greatest(0.5, 1.0 - abs(a.sec - b.sec) * 1.0 / 3600), 6) AS confidence
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(a.sec - b.sec) < 300
      |ORDER BY a.user_id, a_id, b_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q23_same_source_pairs", q23, Some(q23Sql)),
    Q("q24_tag_jaccard_join", q24, Some(q24Sql), headline = true),
    Q("q25_content_jaccard_sw", q25, Some(q25Sql)),
    Q("q26_temporal_proximity", q26, Some(q26Sql), headline = true))
}
