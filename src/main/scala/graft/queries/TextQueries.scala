package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{TextFunctions => TF}

/** Text-analysis family (training-pipeline first-class operators):
  * language ID, quality scoring, token counting, document fingerprinting.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // -- q32: language ID — stopword-ratio heuristic; output the confusion
  //         matrix against the labeled lang column
  private def q32(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", TF.langId(col("text")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("lang"), col("lang_pred"))

  private val q32Sql =
    s"""SELECT lang, ${TF.sql.langId("text")} AS lang_pred, count(*) AS cnt
       |FROM documents
       |GROUP BY lang, lang_pred
       |ORDER BY lang, lang_pred""".stripMargin

  // -- q33: quality scoring (length score, token diversity, stopword
  //         ratio, blended quality)
  private def q33(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        round(TF.lengthScore(col("n_chars")), 6).as("length_score"),
        round(TF.tokenDiversity(col("text")), 6).as("diversity"),
        round(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TF.qualityScore(col("text"), col("n_chars")), 6).as("quality"))
      .orderBy(col("doc_id"))

  private val q33Sql =
    s"""SELECT doc_id,
       |  round(${TF.sql.lengthScore("n_chars")}, 6) AS length_score,
       |  round(${TF.sql.tokenDiversity("text")}, 6) AS diversity,
       |  round(${TF.sql.stopwordRatio("text")}, 6) AS stopword_ratio,
       |  round(${TF.sql.qualityScore("text", "n_chars")}, 6) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  // -- q34: token counting — whitespace, BPE-ish regex, distinct; plus
  //         corpus totals per source
  private def q34(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"),
        TF.tokenCount(col("text")).as("n_tok"),
        TF.regexTokenCount(col("text")).as("n_bpeish"),
        size(TF.distinctTokens(col("text"))).as("n_distinct"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("tokens"),
        sum(col("n_bpeish")).as("bpeish_tokens"),
        round(avg(col("n_distinct")), 6).as("avg_distinct"))
      .orderBy(col("source"))

  private val q34Sql =
    s"""SELECT source,
       |  CAST(sum(${TF.sql.tokenCount("text")}) AS BIGINT) AS tokens,
       |  CAST(sum(${TF.sql.regexTokenCount("text")}) AS BIGINT) AS bpeish_tokens,
       |  round(avg(len(${TF.sql.distinctTokens("text")})), 6) AS avg_distinct
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // -- q35: rolling-hash document fingerprint (order-sensitive)
  private def q35(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val q35Sql =
    s"""SELECT doc_id, ${TF.sql.fingerprint("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q32_text_langid", q32, Some(q32Sql)),
    Q("q33_text_quality", q33, Some(q33Sql)),
    Q("q34_token_counts", q34, Some(q34Sql), headline = true),
    Q("q35_fingerprint", q35, Some(q35Sql)))
}
