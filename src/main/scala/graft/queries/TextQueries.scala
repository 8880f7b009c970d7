package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // -- q93: multi-dimension content quality (quality_assessment.py
  //         ContentQualityAnalyzer): five component scores → overall
  //         mean → level tier. metaFields=1 (documents carry `source`
  //         of the reference's five important metadata fields).
  private[queries] def q93(s: SparkSession, dir: String): DataFrame =
    graft.text.QualityAssessment.assess(docs(s, dir), "text", lit(1))
      .select(col("doc_id"),
        round(col("length_score"), 6).as("length_score"),
        round(col("structure_score"), 6).as("structure_score"),
        round(col("richness_score"), 6).as("richness_score"),
        round(col("clarity_score"), 6).as("clarity_score"),
        round(col("completeness_score"), 6).as("completeness_score"),
        round(col("overall_quality"), 6).as("overall_quality"),
        col("quality_level"))
      .orderBy(col("doc_id"))

  private[queries] val q93Sql = {
    // DuckDB plain string literals don't process backslash escapes, so
    // regex patterns paste through with their backslashes intact
    def rx(pat: String) = s"len(regexp_extract_all(text, '$pat'))"
    val sentencesGt10 =
      "len(list_filter(string_split_regex(text, '[.!?]+'), s -> length(trim(s)) > 10))"
    // Python str.split(): empty tokens dropped (leading/trailing ws)
    val wordCount =
      "len(list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0))"
    val posHits = graft.text.QualityAssessment.Positive
      .map(w => s"CASE WHEN contains(lower(text), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    val negHits = graft.text.QualityAssessment.Negative
      .map(w => s"CASE WHEN contains(lower(text), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    val addressed = graft.text.QualityAssessment.QuestionIndicators
      .map(_.map(w => s"contains(lower(text), '$w')").mkString(" OR "))
      .map(g => s"CASE WHEN $g THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) < 50 THEN 0.2
       |         WHEN length(text) < 100 THEN 0.5
       |         WHEN length(text) < 500 THEN 0.8
       |         WHEN length(text) < 2000 THEN 1.0
       |         WHEN length(text) < 5000 THEN 0.9 ELSE 0.7 END AS length_score,
       |    least(
       |      (CASE WHEN ${rx("(?m)^#+\\s|^[A-Z][^.!?]*:$$")} > 0 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN ${rx("(?m)^[\\s]*[-*•]\\s")} > 0 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN len(string_split(text, e'\\n\\n')) > 1 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN $sentencesGt10 >= 2 THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN $sentencesGt10 >= 5 THEN 0.2 ELSE 0.0 END), 1.0) AS structure_score,
       |    least(
       |      (CASE WHEN ${rx("\\[(\\d+)\\]|\\(([^)]+\\d{4}[^)]*)\\)")} > 0
       |        THEN least(${rx("\\[(\\d+)\\]|\\(([^)]+\\d{4}[^)]*)\\)")} * 0.1, 0.3) ELSE 0.0 END) +
       |      (CASE WHEN ${rx("https?://[^\\s]+")} > 0
       |        THEN least(${rx("https?://[^\\s]+")} * 0.05, 0.2) ELSE 0.0 END) +
       |      (CASE WHEN ${rx("\\b\\d+(?:\\.\\d+)?(?:%|kg|meters?|seconds?|minutes?|hours?|days?|years?)?\\b")} > 0
       |        THEN least(${rx("\\b\\d+(?:\\.\\d+)?(?:%|kg|meters?|seconds?|minutes?|hours?|days?|years?)?\\b")} * 0.02, 0.2) ELSE 0.0 END) +
       |      (CASE WHEN ${rx("\\b\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}\\b|\\b\\d{4}-\\d{2}-\\d{2}\\b")} > 0
       |        THEN least(${rx("\\b\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}\\b|\\b\\d{4}-\\d{2}-\\d{2}\\b")} * 0.05, 0.15) ELSE 0.0 END) +
       |      (CASE WHEN ${rx("\\b[A-Z][a-z]*(?:[A-Z][a-z]*)+\\b")} > 0
       |        THEN least(${rx("\\b[A-Z][a-z]*(?:[A-Z][a-z]*)+\\b")} * 0.01, 0.15) ELSE 0.0 END), 1.0) AS richness_score,
       |    greatest(0.0, least(0.5 +
       |      least(($posHits) * 0.05, 0.3) -
       |      least(($negHits) * 0.1, 0.4) +
       |      (CASE WHEN $wordCount * 1.0 /
       |                 len(string_split_regex(text, '[.!?]+')) BETWEEN 10 AND 20 THEN 0.2
       |            WHEN $wordCount * 1.0 /
       |                 len(string_split_regex(text, '[.!?]+')) > 30 THEN -0.2
       |            ELSE 0.0 END), 1.0)) AS clarity_score,
       |    least(0.5 + ($addressed) / 5.0 * 0.4 + 1.0 / 5.0 * 0.1, 1.0)
       |      AS completeness_score
       |  FROM documents)
       |SELECT doc_id,
       |  round(length_score, 6) AS length_score,
       |  round(structure_score, 6) AS structure_score,
       |  round(richness_score, 6) AS richness_score,
       |  round(clarity_score, 6) AS clarity_score,
       |  round(completeness_score, 6) AS completeness_score,
       |  round((length_score + structure_score + richness_score +
       |    clarity_score + completeness_score) / 5, 6) AS overall_quality,
       |  CASE WHEN (length_score + structure_score + richness_score +
       |      clarity_score + completeness_score) / 5 >= 0.9 THEN 'excellent'
       |    WHEN (length_score + structure_score + richness_score +
       |      clarity_score + completeness_score) / 5 >= 0.7 THEN 'good'
       |    WHEN (length_score + structure_score + richness_score +
       |      clarity_score + completeness_score) / 5 >= 0.5 THEN 'fair'
       |    WHEN (length_score + structure_score + richness_score +
       |      clarity_score + completeness_score) / 5 >= 0.3 THEN 'poor'
       |    ELSE 'critical' END AS quality_level
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // -- q95: temporal quality (quality_assessment.py
  //         TemporalQualityAnalyzer:651-940) — the trio's third leg.
  //         The documents table has no timestamps, so the catalog query
  //         derives deterministic metadata from doc_id (the established
  //         synthetic-metadata idiom): created_at spans all five
  //         freshness tiers against the pinned now=2025-06-01, with
  //         nulls exercising the no-timestamp paths.
  private[queries] def q95(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TemporalQuality
    val d = docs(s, dir)
      .withColumn("created_at",
        when(col("doc_id") % 11 === 0, lit(null).cast("date"))
          .otherwise(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (col("doc_id") * 13 % 500).cast("int"))))
      .withColumn("updated_at",
        when(col("doc_id") % 3 === 0 && col("created_at").isNotNull,
          date_add(col("created_at"), 10)).otherwise(lit(null).cast("date")))
      .withColumn("update_count",
        when(col("doc_id") % 13 === 0, lit(null).cast("long"))
          .otherwise(col("doc_id") % 15))
    val meta = TemporalQuality.Meta().copy(
      createdAt = col("created_at"), updatedAt = col("updated_at"),
      updateCount = col("update_count"))
    TemporalQuality.assess(d, "text",
        lit(java.sql.Date.valueOf("2025-06-01")), lit(2025), meta)
      .select(col("doc_id"),
        round(col("freshness_score"), 6).as("freshness_score"),
        round(col("temporal_consistency_score"), 6)
          .as("temporal_consistency_score"),
        round(col("update_frequency_score"), 6).as("update_frequency_score"),
        round(col("temporal_relevance_score"), 6).as("temporal_relevance_score"),
        round(col("temporal_score"), 6).as("temporal_score"),
        col("temporal_level"),
        round(col("assessment_confidence"), 6).as("assessment_confidence"),
        col("temporal_issues"))
      .orderBy(col("doc_id"))
  }

  private[queries] val q95Sql = {
    import graft.text.TemporalQuality._
    def hitsSql(words: Seq[String]): String = words
      .map(w => s"CASE WHEN contains(lower(text), '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    val validYears = "list_filter(list_transform(regexp_extract_all(text, " +
      """'\b\d{4}\b'), y -> CAST(y AS INT)), y -> y >= 1900 AND y <= 2025)"""
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |    CASE WHEN doc_id % 11 = 0 THEN NULL
       |      ELSE DATE '2024-01-01' + CAST((doc_id * 13) % 500 AS INT)
       |      END AS created_at,
       |    CASE WHEN doc_id % 3 = 0 AND doc_id % 11 <> 0
       |      THEN DATE '2024-01-01' + CAST((doc_id * 13) % 500 + 10 AS INT)
       |      ELSE NULL END AS updated_at,
       |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id % 15
       |      END AS update_count
       |  FROM documents),
       |comps AS (
       |  SELECT doc_id,
       |    CASE WHEN coalesce(created_at, updated_at) IS NULL THEN 0.3
       |      WHEN date_diff('day', coalesce(created_at, updated_at),
       |        DATE '2025-06-01') <= 30 THEN 1.0
       |      WHEN date_diff('day', coalesce(created_at, updated_at),
       |        DATE '2025-06-01') <= 90 THEN 0.8
       |      WHEN date_diff('day', coalesce(created_at, updated_at),
       |        DATE '2025-06-01') <= 180 THEN 0.6
       |      WHEN date_diff('day', coalesce(created_at, updated_at),
       |        DATE '2025-06-01') <= 365 THEN 0.4
       |      ELSE 0.2 END AS f,
       |    CASE WHEN NOT (len(regexp_extract_all(text, '\\b\\d{4}\\b')) > 0
       |        OR regexp_matches(text, '\\b\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}\\b')
       |        OR regexp_matches(text, '\\b\\d{4}-\\d{2}-\\d{2}\\b')) THEN 0.7
       |      WHEN coalesce(created_at, updated_at) IS NULL THEN 0.6
       |      WHEN len($validYears) = 0 THEN 0.7
       |      ELSE 1.0 - len(list_filter($validYears,
       |        y -> abs(y - year(coalesce(created_at, updated_at))) > 5))
       |        * 1.0 / len($validYears) END AS c,
       |    CASE WHEN update_count IS NOT NULL THEN
       |        CASE WHEN update_count = 0 THEN 0.5
       |          WHEN update_count <= 3 THEN 0.7
       |          WHEN update_count <= 10 THEN 0.9 ELSE 1.0 END
       |      ELSE CASE WHEN
       |          (CASE WHEN created_at IS NOT NULL THEN 1 ELSE 0 END) +
       |          (CASE WHEN updated_at IS NOT NULL THEN 1 ELSE 0 END) >= 2
       |        THEN 0.8 ELSE 0.6 END END AS u,
       |    CASE WHEN (${hitsSql(Current)}) + (${hitsSql(Historical)}) +
       |        (${hitsSql(Future)}) = 0 THEN 0.7
       |      ELSE least(((${hitsSql(Current)}) * 1.0 +
       |        (${hitsSql(Future)}) * 0.8 + (${hitsSql(Historical)}) * 0.6) /
       |        ((${hitsSql(Current)}) + (${hitsSql(Historical)}) +
       |         (${hitsSql(Future)})), 1.0) END AS r,
       |    ((CASE WHEN created_at IS NOT NULL THEN 1 ELSE 0 END) +
       |     (CASE WHEN updated_at IS NOT NULL THEN 1 ELSE 0 END)) / 4.0
       |      AS meta_factor
       |  FROM meta),
       |withmean AS (
       |  SELECT *, (f + c + u + r) / 4 AS m FROM comps)
       |SELECT doc_id,
       |  round(f, 6) AS freshness_score,
       |  round(c, 6) AS temporal_consistency_score,
       |  round(u, 6) AS update_frequency_score,
       |  round(r, 6) AS temporal_relevance_score,
       |  round(m, 6) AS temporal_score,
       |  CASE WHEN m >= 0.9 THEN 'excellent' WHEN m >= 0.7 THEN 'good'
       |    WHEN m >= 0.5 THEN 'fair' WHEN m >= 0.3 THEN 'poor'
       |    ELSE 'critical' END AS temporal_level,
       |  round(meta_factor * 0.6 + greatest(0.0, 1.0 -
       |    ((f-m)*(f-m) + (c-m)*(c-m) + (u-m)*(u-m) + (r-m)*(r-m)) / 4) * 0.4,
       |    6) AS assessment_confidence,
       |  concat_ws('; ',
       |    CASE WHEN f < 0.4 THEN '$OutdatedIssue' END,
       |    CASE WHEN c < 0.5 THEN '$InconsistentIssue' END,
       |    CASE WHEN u < 0.5 THEN '$NoHistoryIssue' END,
       |    CASE WHEN r < 0.5 THEN '$NotRelevantIssue' END) AS temporal_issues
       |FROM withmean ORDER BY doc_id""".stripMargin
  }

  // -- q128: repetition quality filters (Gopher-rules style) — word and
  //          bigram occurrence stats from one sorted linear pass per row
  //          (scan-local; the oracle takes the explode+group-by road, so
  //          the run-length aggregate is verified against an independent
  //          counting method). Thresholds picked on the corpus
  //          distribution: top_word_share flags ~18%, dup_bigram_frac
  //          ~25% at sf0.01. Docs under 2 tokens have no bigram and are
  //          out of scope on both sides.
  private def q128(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Repetition
    val toks = Repetition.tokens(col("text"))
    val base = docs(s, dir)
      .select(col("doc_id"), toks.as("l"))
      .filter(size(col("l")) >= 2)
      .withColumn("ws", Repetition.runStats(col("l")))
      .withColumn("bs", Repetition.runStats(Repetition.bigrams(col("l"))))
      .withColumn("n_words", size(col("l")).cast("long"))
      .withColumn("n_bi", (size(col("l")) - 1).cast("long"))
    base.select(col("doc_id"), col("n_words"),
        round(Repetition.topShare(col("ws"), col("n_words")), 6)
          .as("top_word_share"),
        round(Repetition.dupFraction(col("ws"), col("n_words")), 6)
          .as("dup_word_frac"),
        round(Repetition.topShare(col("bs"), col("n_bi")), 6)
          .as("top_bigram_share"),
        round(Repetition.dupFraction(col("bs"), col("n_bi")), 6)
          .as("dup_bigram_frac"))
      .withColumn("pass",
        col("top_word_share") <= 0.12 && col("dup_bigram_frac") <= 0.10)
      .orderBy(col("doc_id"))
  }

  private val q128Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS l
      |  FROM documents),
      |scoped AS (SELECT * FROM toks WHERE len(l) >= 2),
      |words AS (SELECT doc_id, unnest(l) AS w FROM scoped),
      |wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
      |wagg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS topw,
      |    coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dupw
      |  FROM wc GROUP BY 1),
      |bi AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] AS b
      |  FROM scoped, unnest(range(1, len(l))) r(i)),
      |bc AS (SELECT doc_id, b, count(*) AS c FROM bi GROUP BY 1, 2),
      |bagg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi, max(c) AS topb,
      |    coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dupb
      |  FROM bc GROUP BY 1),
      |m AS (
      |  SELECT doc_id, n_words,
      |    round(topw * 1.0 / n_words, 6) AS top_word_share,
      |    round(dupw * 1.0 / n_words, 6) AS dup_word_frac,
      |    round(topb * 1.0 / n_bi, 6) AS top_bigram_share,
      |    round(dupb * 1.0 / n_bi, 6) AS dup_bigram_frac
      |  FROM wagg JOIN bagg USING (doc_id))
      |SELECT *, top_word_share <= 0.12 AND dup_bigram_frac <= 0.10 AS pass
      |FROM m ORDER BY doc_id""".stripMargin

  // -- q129: corpus bigram-LM perplexity scoring (CCNet-style filter).
  //          The per-doc log-prob sum folds a position-sorted array on
  //          BOTH sides (Spark aggregate() vs DuckDB sum(... ORDER BY
  //          pos)), so the doubles agree bit-for-bit before round().
  //          Threshold: the corpus ppl distribution at sf0.01 spans
  //          ~13.3-19.6 with planted near-dup boilerplate at the low
  //          end; pass cuts the high-surprise tail at 18.
  private def q129(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{NgramLm, Repetition}
    val toks = docs(s, dir)
      .select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
    NgramLm.score(toks)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("ce"), 6).as("cross_entropy"),
        round(col("ppl"), 6).as("perplexity"))
      .withColumn("pass", col("perplexity") <= 18.0d)
      .orderBy(col("doc_id"))
  }

  private val q129Sql =
    s"""WITH ${graft.text.NgramLm.sql.scoreCtes}
       |SELECT doc_id, n_bigrams,
       |  round(ce, 6) AS cross_entropy,
       |  round(exp(ce), 6) AS perplexity,
       |  round(exp(ce), 6) <= 18.0 AS pass
       |FROM lmagg ORDER BY doc_id""".stripMargin

  // -- q136: vocabulary construction + OOV coverage — tokenizer-training
  //          prep: global token frequencies → top-V vocabulary (count
  //          desc, token asc tiebreak) → per-source instance/type
  //          coverage of that vocabulary. Scale shape: the instance
  //          stream is one explode (linear, scan-local); the type frame
  //          is a vocab-bounded aggregate; the top-V cut is
  //          TakeOrdered over the TYPE frame (vocab-bounded, not
  //          corpus-bounded); and the V-row vocab broadcasts back onto
  //          the instance stream — nothing quadratic, nothing
  //          sequential over the corpus. The per-source distinct-type
  //          counts plan as Expand+partial aggregates (linear).
  private val VocabSize = 1000

  private def q136(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("source"),
      explode(TF.tokens(col("text"))).as("token"))
    val types = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val vocab = types.orderBy(col("tf").desc, col("token")).limit(VocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_instances"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_instances"),
        countDistinct(col("token")).as("n_types"),
        countDistinct(when(col("in_vocab").isNull, col("token")))
          .as("oov_types"))
      .withColumn("oov_rate",
        round(col("oov_instances") * lit(1.0) / col("n_instances"), 6))
      .orderBy(col("source"))
  }

  private val q136Sql =
    s"""WITH toks AS (
       |  SELECT source, unnest(${TF.sql.tokens("text")}) AS token
       |  FROM documents),
       |types AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
       |vocab AS (
       |  SELECT token, 1 AS in_vocab FROM types
       |  ORDER BY tf DESC, token LIMIT $VocabSize)
       |SELECT source,
       |  count(*) AS n_instances,
       |  CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS oov_instances,
       |  count(DISTINCT token) AS n_types,
       |  count(DISTINCT CASE WHEN in_vocab IS NULL THEN token END)
       |    AS oov_types,
       |  round(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) * 1.0
       |    / count(*), 6) AS oov_rate
       |FROM toks LEFT JOIN vocab USING (token)
       |GROUP BY source ORDER BY source""".stripMargin

  // -- q144: source vocabulary-overlap matrix — the LEXICAL counterpart
  //          of q137's embedding-centroid map: per unordered source
  //          pair, Jaccard overlap of token-TYPE vocabularies, computed
  //          from a type-level inverted index (distinct (source, token)
  //          → equi-join on token), never a doc-level pair join. Scale
  //          shape: the (source, token) frame is a linear distinct
  //          (partial-agg'd); the pair expansion is bounded by
  //          #sources² PER TOKEN TYPE (Σ_t |S_t|² ≤ V·S², linear in
  //          vocab with a #sources² constant); the matrix itself is
  //          #sources²-bounded at any corpus size. Counts are integer;
  //          the only float op is one division per matrix cell.
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val st = docs(s, dir).select(col("source"),
        explode(TF.distinctTokens(col("text"))).as("token"))
      .distinct()
    val ts = st.groupBy(col("source")).agg(count(lit(1)).as("n_types"))
    st.select(col("token"), col("source").as("src_a"))
      .join(st.select(col("token"), col("source").as("src_b")), Seq("token"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(ts.select(col("source").as("src_a"), col("n_types").as("types_a")),
        Seq("src_a"))
      .join(ts.select(col("source").as("src_b"), col("n_types").as("types_b")),
        Seq("src_b"))
      .withColumn("jaccard", round(col("n_shared") * lit(1.0) /
        (col("types_a") + col("types_b") - col("n_shared")), 6))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("types_a"), col("types_b"), col("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q144Sql =
    s"""WITH st AS (
       |  SELECT DISTINCT source, token FROM (
       |    SELECT source, unnest(${TF.sql.distinctTokens("text")}) AS token
       |    FROM documents)),
       |ts AS (SELECT source, count(*) AS n_types FROM st GROUP BY 1),
       |pair AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
       |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT p.src_a, p.src_b, p.n_shared,
       |  ta.n_types AS types_a, tb.n_types AS types_b,
       |  round(p.n_shared * 1.0 / (ta.n_types + tb.n_types - p.n_shared), 6)
       |    AS jaccard
       |FROM pair p
       |JOIN ts ta ON ta.source = p.src_a
       |JOIN ts tb ON tb.source = p.src_b
       |ORDER BY src_a, src_b""".stripMargin

  // -- q195: readability scoring — Flesch reading ease + Flesch–Kincaid
  //          grade (Kincaid et al. 1975) with the deterministic
  //          vowel-group syllable estimate (a syllable ≈ one maximal
  //          [aeiouy]+ run — the standard heuristic when no dictionary
  //          is allowed on the scoring path). The quality-filter
  //          companion to q33/q128: pipelines band corpora by grade
  //          level before mixing. Scale shape: three regexp counters
  //          per row, scan-local, no shuffle before the final sort.
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val words =
      size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0)))
    val syl =
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
    val sent =
      greatest(lit(1), size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
    docs(s, dir)
      .select(col("doc_id"), words.as("n_words"), sent.as("n_sentences"),
        syl.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("wps", col("n_words").cast("double") / col("n_sentences"))
      .withColumn("spw", col("n_syllables").cast("double") / col("n_words"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"), 6)
          .as("flesch"),
        round(lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59), 6)
          .as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  private val q195Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
      |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_words, n_sentences, n_syllables,
      |    CAST(n_words AS DOUBLE) / n_sentences AS wps,
      |    CAST(n_syllables AS DOUBLE) / n_words AS spw
      |  FROM f WHERE n_words > 0)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  round(206.835 - 1.015 * wps - 84.6 * spw, 6) AS flesch,
      |  round(0.39 * wps + 11.8 * spw - 15.59, 6) AS fk_grade
      |FROM r ORDER BY doc_id""".stripMargin

  // -- q200: per-source TF-IDF keyword extraction — the "what is this
  //          source about" table a curation dashboard shows next to
  //          q137's centroid map and q158's divergence map. tf = token
  //          instances within the source, df = number of sources
  //          containing the token, idf = ln(S/df); top-10 per source by
  //          (tfidf desc, token asc). Scale shape: one exploded
  //          instance scan → (source, token) keyed aggregate (vocab ×
  //          sources bounded), df is a token-keyed aggregate over THAT
  //          frame (not the corpus), the 1-row source count broadcasts,
  //          and the top-10 is a per-source window over the bounded
  //          frame — the corpus is touched exactly once.
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val inst = docs(s, dir).select(col("source"),
      explode(TF.tokens(col("text"))).as("token"))
    val st = inst.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = st.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nSrc = docs(s, dir).agg(countDistinct(col("source")).as("n_src"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("tfidf").desc, col("token"))
    st.join(df, "token").crossJoin(broadcast(nSrc))
      .withColumn("tfidf",
        col("tf") * log(col("n_src").cast("double") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("source"), col("rank"), col("token"), col("tf"),
        col("df"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("source"), col("rank"))
  }

  private val q200Sql =
    s"""WITH inst AS (
       |  SELECT source, unnest(${TF.sql.tokens("text")}) AS token
       |  FROM documents),
       |st AS (SELECT source, token, count(*) AS tf
       |       FROM inst GROUP BY source, token),
       |dft AS (SELECT token, count(*) AS df FROM st GROUP BY token),
       |ns AS (SELECT count(DISTINCT source) AS n_src FROM documents),
       |scored AS (
       |  SELECT st.source, st.token, st.tf, dft.df,
       |    st.tf * ln(CAST(n_src AS DOUBLE) / dft.df) AS tfidf
       |  FROM st JOIN dft USING (token) CROSS JOIN ns),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY tfidf DESC, token) AS rank
       |  FROM scored)
       |SELECT source, rank, token, tf, df, round(tfidf, 6) AS tfidf
       |FROM ranked WHERE rank <= 10
       |ORDER BY source, rank""".stripMargin

  // -- q205: PMI collocation extraction (Church & Hanks 1990) — the
  //          top bigram collocations of the corpus by pointwise mutual
  //          information over the bigram stream's own marginals:
  //          pmi = ln(c12·N / (c1·c2)), c12 >= MinPairCount so rare
  //          accidents don't dominate. The phrase-mining companion to
  //          q200's unigram keywords (multiword expressions feed
  //          tokenizer vocab decisions and boilerplate lists). Scale
  //          shape: one bigram instance scan → three keyed aggregates
  //          (pair, prefix, suffix marginals — all vocab-bounded), a
  //          1-row N broadcast, TakeOrdered top-50; all PMI inputs are
  //          exact integers.
  private val MinPairCount = 5
  private val PmiTopK = 50

  private def q205(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{NgramLm, Repetition}
    val inst = NgramLm.bigramInstances(
      docs(s, dir).select(col("doc_id"),
          Repetition.tokens(col("text")).as("l"))
        .filter(size(col("l")) >= 2))
    val pair = inst.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= MinPairCount)
    val pre = inst.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val suf = inst.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val n = inst.agg(count(lit(1)).as("n_bigrams"))
    pair.join(pre, "w1").join(suf, "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi",
        log(col("c12").cast("double") * col("n_bigrams") /
          (col("c1") * col("c2"))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(PmiTopK)
      .select(col("w1"), col("w2"), col("c12"),
        round(col("pmi"), 6).as("pmi"))
  }

  private val q205Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS l
       |  FROM documents),
       |scoped AS (SELECT * FROM toks WHERE len(l) >= 2),
       |inst AS (
       |  SELECT doc_id, i AS pos, l[i] AS w1, l[i+1] AS w2
       |  FROM scoped, unnest(range(1, len(l))) r(i)),
       |pair AS (
       |  SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairCount),
       |pre AS (SELECT w1, count(*) AS c1 FROM inst GROUP BY 1),
       |suf AS (SELECT w2, count(*) AS c2 FROM inst GROUP BY 1),
       |n AS (SELECT count(*) AS n_bigrams FROM inst),
       |scored AS (
       |  SELECT w1, w2, c12,
       |    ln(CAST(c12 AS DOUBLE) * n_bigrams / (c1 * c2)) AS pmi
       |  FROM pair JOIN pre USING (w1) JOIN suf USING (w2) CROSS JOIN n)
       |SELECT w1, w2, c12, round(pmi, 6) AS pmi
       |FROM scored
       |ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK""".stripMargin

  // -- q219: Kneser–Ney perplexity scoring — the q129 CCNet-style
  //          filter upgraded to the standard fixed-discount
  //          interpolated KN smoothing (Kneser & Ney 1995; Chen &
  //          Goodman 1999): discounted bigram mass backs off to the
  //          CONTINUATION unigram (distinct-context count), which
  //          ranks formulaic boilerplate differently from add-one —
  //          the smoothing actually used by production n-gram filter
  //          LMs. Same per-doc output shape as q129 so the two filters
  //          compare row-for-row; same sorted-fold determinism; scale
  //          shape adds only one vocab-bounded aggregate over the
  //          bigram TYPE frame.
  private val KnDiscount = 0.75

  private def q219(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{NgramLm, Repetition}
    val toks = docs(s, dir)
      .select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
    NgramLm.scoreKneserNey(toks, KnDiscount)
      .select(col("doc_id"), col("n_bigrams"),
        round(col("ce"), 6).as("cross_entropy_kn"),
        round(col("ppl"), 6).as("perplexity_kn"))
      .orderBy(col("doc_id"))
  }

  private val q219Sql =
    s"""WITH ${graft.text.NgramLm.sql.knCtes(KnDiscount)}
       |SELECT doc_id, n_bigrams,
       |  round(ce, 6) AS cross_entropy_kn,
       |  round(exp(ce), 6) AS perplexity_kn
       |FROM knagg ORDER BY doc_id""".stripMargin

  // -- q221: word burstiness — Church & Gale's observation that content
  //          words CLUMP: a word's mean occurrences per containing
  //          document (tf/df) far above 1 marks template/spam
  //          concentration that corpus-WIDE frequency alone hides.
  //          The corpus-level companion to q128's within-doc repetition
  //          filters: q128 sees one doc at a time, this sees a term
  //          stuffed across a handful of docs. Exact integer tf/df
  //          ratio; top-k plans as TakeOrderedAndProject over the
  //          vocab-bounded type frame (never the instance stream).
  private val BurstMinTf = 50L

  private def q221(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val inst = docs(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    inst.groupBy(col("word"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("tf") >= BurstMinTf)
      .select(col("word"), col("tf"), col("df"),
        ExactRound.ratio6(col("tf"), col("df")).as("burstiness"))
      .orderBy(col("burstiness").desc, col("word"))
      .limit(25)
  }

  private val q221Sql =
    s"""WITH inst AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |ty AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS tf,
       |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       |  FROM inst WHERE length(word) > 0 GROUP BY word)
       |SELECT word, tf, df,
       |  ${graft.functions.ExactRound.sql.ratio6("tf", "df")} AS burstiness
       |FROM ty WHERE tf >= $BurstMinTf
       |ORDER BY burstiness DESC, word LIMIT 25""".stripMargin

  // -- q290: encoding-health audit per source — the scan a corpus runs
  //          before training to find broken ingestion: U+FFFD
  //          replacement chars (decode failures), C0 control chars
  //          (binary bleed; tab/newline/CR excepted), zero-width
  //          characters (invisible-text spam / watermarks), and the
  //          classic UTF-8-as-Latin-1 double-encode markers ("â€…",
  //          "Ã" + high byte). Patterns are LITERAL-CHARACTER classes
  //          shared verbatim between engines (Java regex and RE2 spell
  //          \u-escapes differently, so the pattern strings carry the
  //          raw characters instead). One scan, four rlike flags,
  //          exact counts + an affected ratio.
  // regex-level \x{...} escapes — the one escape syntax Java regex
  // (Spark rlike) and RE2 (DuckDB regexp_matches) BOTH interpret, so
  // the identical ASCII-only pattern string ships to both engines
  // (raw control chars would break the SQL literal; engine-side
  // \uXXXX string escapes differ between the two)
  private[graft] val ReplPat = "\\x{fffd}"
  private[graft] val CtrlPat = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
  private[graft] val ZeroWidthPat = "[\\x{200b}-\\x{200d}\\x{feff}]"
  private[graft] val MojibakePat = "\\x{e2}\\x{20ac}|\\x{c3}[\\x{80}-\\x{ff}]"

  private def q290(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    docs(s, dir).groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").rlike(ReplPat), 1L).otherwise(0L))
          .as("repl_docs"),
        sum(when(col("text").rlike(CtrlPat), 1L).otherwise(0L))
          .as("ctrl_docs"),
        sum(when(col("text").rlike(ZeroWidthPat), 1L).otherwise(0L))
          .as("zw_docs"),
        sum(when(col("text").rlike(MojibakePat), 1L).otherwise(0L))
          .as("moji_docs"),
        sum(when(col("text").rlike(ReplPat) || col("text").rlike(CtrlPat) ||
          col("text").rlike(ZeroWidthPat) || col("text").rlike(MojibakePat),
          1L).otherwise(0L)).as("affected"))
      .withColumn("affected_ratio",
        ExactRound.ratio6(col("affected"), col("n_docs")))
      .orderBy(col("source"))
  }

  private val q290Sql = {
    import graft.functions.{ExactRound => ER}
    // plain string literal: DuckDB passes backslashes through, RE2
    // decodes the \x{...} escapes itself (identical to the Spark side)
    def m(p: String) = s"regexp_matches(text, '$p')"
    val any = s"(${m(ReplPat)} OR ${m(CtrlPat)} OR ${m(ZeroWidthPat)} " +
      s"OR ${m(MojibakePat)})"
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN ${m(ReplPat)} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS repl_docs,
       |  CAST(sum(CASE WHEN ${m(CtrlPat)} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS ctrl_docs,
       |  CAST(sum(CASE WHEN ${m(ZeroWidthPat)} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS zw_docs,
       |  CAST(sum(CASE WHEN ${m(MojibakePat)} THEN 1 ELSE 0 END) AS BIGINT)
       |    AS moji_docs,
       |  CAST(sum(CASE WHEN $any THEN 1 ELSE 0 END) AS BIGINT) AS affected,
       |  ${ER.sql.ratio6(
          s"CAST(sum(CASE WHEN $any THEN 1 ELSE 0 END) AS BIGINT)",
          "count(*)")} AS affected_ratio
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }

  // -- q300: hapax legomena ratio + type-token ratio per source — the
  //          two classical lexical-diversity readouts (Baayen 2001,
  //          "Word Frequency Distributions"): hapax share of the
  //          vocabulary predicts how fast the vocab still grows
  //          (Heaps-curve slope, q163's pointwise sibling) and TTR
  //          flags template/boilerplate sources (low) vs natural text.
  //          One token census per source, three exact counts, ratio6.
  private def q300(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    docs(s, dir)
      .select(col("source"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(col("tf")).as("tokens"))
      .select(col("source"), col("vocab"), col("hapax"), col("tokens"),
        ExactRound.ratio6(col("hapax"), col("vocab")).as("hapax_ratio"),
        ExactRound.ratio6(col("vocab"), col("tokens")).as("ttr"))
      .orderBy(col("source"))
  }

  private val q300Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH census AS (
       |  SELECT source, t.tok, CAST(count(*) AS BIGINT) AS tf
       |  FROM documents, unnest(${TF.sql.tokens("text")}) AS t(tok)
       |  GROUP BY 1, 2),
       |agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hapax,
       |    CAST(sum(tf) AS BIGINT) AS tokens
       |  FROM census GROUP BY 1)
       |SELECT source, vocab, hapax, tokens,
       |  ${ER.sql.ratio6("hapax", "vocab")} AS hapax_ratio,
       |  ${ER.sql.ratio6("vocab", "tokens")} AS ttr
       |FROM agg ORDER BY source""".stripMargin
  }

  // -- q315: winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003,
  //          the MOSS algorithm) — per doc, the guaranteed-coverage
  //          fingerprint set: hash every 5-char shingle, slide a
  //          w = 4 window, select each window's minimum with the
  //          RIGHTMOST tie-break, dedup selections. Unlike 0-mod-p
  //          sampling (the CDC cut rule, q201), winnowing guarantees
  //          at least one fingerprint per w-gram span, so a match of
  //          length ≥ w+k−1 chars is always caught — expected density
  //          2/(w+1). The rightmost-min argmax is made ONE window
  //          aggregate by packing (hash, position) into a single long
  //          key h·2²⁰ + (2²⁰−1−pos): min(key) = (min h, rightmost
  //          pos) — valid to 2²⁰ = 1M grams/doc and h < 2³¹ (2⁵¹
  //          total, exact). Determinism: pure integer min; density is
  //          an ExactRound ratio. Scale shape: windows partition BY
  //          DOC (never global); fingerprint joins downstream are
  //          df-bounded equi-joins like the containment index.
  private val WinnowK = 5
  private val WinnowW = 4

  private def q315(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir).select(col("doc_id"),
        posexplode(TF.charShingles(col("text"), WinnowK))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        (TF.md5Long(col("gram")) % lit(2147483647L)).as("h"))
      .withColumn("key",
        col("h") * lit(1048576L) + (lit(1048575L) - col("pos")))
      .withColumn("n_grams",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val sel = g
      .withColumn("minkey", min(col("key")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.currentRow, WinnowW - 1)))
      // only FULL w-windows select (the paper's contract); short docs
      // (n_grams < w) keep their single global min so no doc is empty
      .filter(col("pos") <= col("n_grams") - WinnowW ||
        (col("n_grams") < WinnowW && col("pos") === 0))
      .select(col("doc_id"), col("n_grams"),
        expr("minkey div 1048576").as("sel_h"),
        (lit(1048575L) - (col("minkey") % lit(1048576L))).as("sel_pos"))
      .distinct()
    sel.groupBy(col("doc_id")).agg(max(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_fp"))
      .select(col("doc_id"), col("n_grams"), col("n_fp"),
        graft.functions.ExactRound.ratio6(col("n_fp"), col("n_grams"))
          .as("density"))
      .orderBy(col("doc_id"))
  }

  private val q315Sql = {
    val k1 = WinnowK - 1
    s"""WITH g AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |    ((('0x'||substr(md5(text[i:i+$k1]),1,8))::BIGINT)
       |      % 2147483647) AS h
       |  FROM (SELECT doc_id, text,
       |      unnest(range(1, greatest(len(text) - $k1, 1) + 1)) AS i
       |    FROM documents)),
       |keyed AS (
       |  SELECT doc_id, pos, h * 1048576 + (1048575 - pos) AS key,
       |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_grams
       |  FROM g),
       |win AS (
       |  SELECT doc_id, pos, n_grams,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING)
       |      AS minkey
       |  FROM keyed),
       |sel AS (
       |  SELECT DISTINCT doc_id, n_grams,
       |    minkey // 1048576 AS sel_h,
       |    1048575 - (minkey % 1048576) AS sel_pos
       |  FROM win
       |  WHERE pos <= n_grams - $WinnowW
       |    OR (n_grams < $WinnowW AND pos = 0))
       |SELECT doc_id, CAST(max(n_grams) AS BIGINT) AS n_grams,
       |  CAST(count(*) AS BIGINT) AS n_fp,
       |  ${graft.functions.ExactRound.sql.ratio6("count(*)",
            "max(n_grams)")} AS density
       |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // -- q316: vocabulary richness — Chao1 estimator + Good–Turing
  //          unseen mass per source: V + N₁(N₁−1)/(2(N₂+1)) (the
  //          bias-corrected Chao 1984 lower bound on TRUE vocabulary
  //          from singleton/doubleton counts) and P₀ = N₁/N (Good
  //          1953: probability the next token is a new type). The
  //          "how much vocabulary is left to collect" readout behind
  //          q163's Heaps fit — Heaps extrapolates the growth curve,
  //          Chao1 bounds its ceiling. Determinism: all inputs are
  //          exact integer census counts; the two estimates are
  //          single-row double formulas, round6. Scale shape: one
  //          token census (map-side combined), #sources rows out.
  private def q316(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir).select(col("source"),
      explode(TF.tokens(col("text"))).as("tok"))
    tok.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("n1"),
        col("n2"),
        graft.functions.ExactRound.ratio6(col("n1"), col("n_tokens"))
          .as("gt_unseen_mass"),
        expr("round(vocab + CAST(n1 AS DOUBLE) * (n1 - 1) / " +
          "(2.0 * (n2 + 1)), 6)").as("chao1"))
      .orderBy(col("source"))
  }

  private val q316Sql =
    s"""WITH tok AS (
       |  SELECT source, unnest(${TF.sql.tokens("text")}) AS tok
       |  FROM documents),
       |census AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY 1, 2),
       |per AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
       |  FROM census GROUP BY 1)
       |SELECT source, n_tokens, vocab, n1, n2,
       |  ${graft.functions.ExactRound.sql.ratio6("n1", "n_tokens")}
       |    AS gt_unseen_mass,
       |  round(vocab + CAST(n1 AS DOUBLE) * (n1 - 1) /
       |    (2.0 * (n2 + 1)), 6) AS chao1
       |FROM per ORDER BY source""".stripMargin

  // -- q328: RAKE keyword extraction (Rose/Engel/Cramer/Cowley 2010,
  //          "Automatic Keyword Extraction from Individual Documents")
  //          — candidate phrases are maximal stopword-free token runs;
  //          word score = deg/freq over within-phrase co-occurrence
  //          (deg(w) = Σ |phrase| across w's phrases, freq(w) = w's
  //          occurrence count); phrase score = Σ member word scores.
  //          The corpus-level complement to q200's TF-IDF (RAKE
  //          rewards multi-word collocations TF-IDF splits apart).
  //          Stopword list = the public 7-word 'en' list TextFunctions
  //          already carries. Determinism: word scores are micro6-
  //          quantized BEFORE the phrase sum (quantize-then-sum
  //          contract); top-50 cut breaks ties on the phrase text.
  //          Scale shape: position/phrase windows are per-doc; word
  //          stats are one token-keyed agg; the final top-50 is a
  //          TakeOrderedAndProject, never a global sort.
  private val RakeTop = 50

  private def q328(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val stops = TF.stopwords("en")
    val toks = docs(s, dir)
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
      .withColumnRenamed("pos", "pos").withColumnRenamed("col", "tok")
      .withColumn("is_stop", col("tok").isin(stops: _*).cast("long"))
    val phrased = toks.withColumn("phrase_id",
        sum(col("is_stop")).over(W.partitionBy(col("doc_id"))
          .orderBy(col("pos"))))
      .filter(col("is_stop") === 0L)
    val pSize = phrased.groupBy(col("doc_id"), col("phrase_id"))
      .agg(count(lit(1)).as("plen"))
    val words = phrased.join(pSize, Seq("doc_id", "phrase_id"))
    val wScore = words.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("tok"), graft.functions.ExactRound.micro6(
        col("deg"), col("freq")).as("w_micro"))
    val phrases = words.join(wScore, "tok")
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("w_micro")).as("score_micro"))
    phrases.groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score_micro")).as("score_micro"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        (col("score_micro") / lit(1e6)).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(RakeTop)
  }

  private val q328Sql = {
    import graft.functions.{ExactRound => ER}
    val stopList = TF.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, tk[i] AS tok,
       |    CASE WHEN tk[i] IN ($stopList) THEN 1 ELSE 0 END AS is_stop
       |  FROM (SELECT doc_id, ${TF.sql.tokens("text")} AS tk,
       |      unnest(range(1, len(${TF.sql.tokens("text")}) + 1)) AS i
       |    FROM documents)),
       |phrased AS (
       |  SELECT doc_id, pos, tok,
       |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS phrase_id
       |  FROM toks QUALIFY is_stop = 0),
       |psize AS (
       |  SELECT doc_id, phrase_id, CAST(count(*) AS BIGINT) AS plen
       |  FROM phrased GROUP BY 1, 2),
       |words AS (
       |  SELECT p.*, s.plen FROM phrased p
       |  JOIN psize s ON p.doc_id = s.doc_id
       |    AND p.phrase_id = s.phrase_id),
       |wscore AS (
       |  SELECT tok,
       |    CAST(${ER.sql.micro6("CAST(sum(plen) AS BIGINT)",
            "count(*)")} AS BIGINT) AS w_micro
       |  FROM words GROUP BY 1),
       |phrases AS (
       |  SELECT w.doc_id, w.phrase_id,
       |    string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
       |    CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(ws.w_micro) AS BIGINT) AS score_micro
       |  FROM words w JOIN wscore ws ON w.tok = ws.tok
       |  GROUP BY 1, 2)
       |SELECT phrase, max(n_words) AS n_words,
       |  CAST(count(*) AS BIGINT) AS n_occurrences,
       |  max(score_micro) / 1e6 AS score
       |FROM phrases GROUP BY phrase
       |ORDER BY score DESC, phrase LIMIT $RakeTop""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q32_text_langid", q32, Some(q32Sql)),
    Q("q33_text_quality", q33, Some(q33Sql)),
    Q("q34_token_counts", q34, Some(q34Sql), headline = true),
    Q("q35_fingerprint", q35, Some(q35Sql)),
    Q("q93_quality_dimensions", q93, Some(q93Sql)),
    Q("q95_temporal_quality", q95, Some(q95Sql)),
    Q("q128_repetition_filters", q128, Some(q128Sql)),
    Q("q129_lm_perplexity", q129, Some(q129Sql)),
    Q("q136_vocab_coverage", q136, Some(q136Sql)),
    Q("q144_vocab_overlap_matrix", q144, Some(q144Sql)),
    Q("q195_readability", q195, Some(q195Sql)),
    Q("q200_tfidf_keywords", q200, Some(q200Sql)),
    Q("q205_pmi_collocations", q205, Some(q205Sql)),
    Q("q219_kneser_ney", q219, Some(q219Sql)),
    Q("q221_burstiness", q221, Some(q221Sql)),
    Q("q290_encoding_audit", q290, Some(q290Sql)),
    Q("q300_hapax_ttr", q300, Some(q300Sql)),
    Q("q315_winnowing_fingerprints", q315, Some(q315Sql)),
    Q("q316_chao1_richness", q316, Some(q316Sql)),
    Q("q328_rake_keywords", q328, Some(q328Sql)))
}
