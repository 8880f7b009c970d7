package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Natural-language question parser
  * (synthesis/question_answering.py:88-308): question-type detection
  * over the eight-type pattern taxonomy (first matching type in dict
  * order wins, factual default), entity extraction (proper nouns +
  * quoted strings, >2 chars, deduped), keyword extraction (word tokens
  * minus stop/question words, >2 chars, order and duplicates kept),
  * intent rendering per type, time/limit constraint extraction, and
  * the parsing-confidence formula (:281-299).
  *
  * DIVERGENCE: the reference dedupes entities via `list(set(...))`
  * whose order is Python-hash nondeterministic; entities here are
  * sorted lexicographically (affects which two render into `intent`).
  *
  * Everything is per-row column arithmetic — the parser composes into
  * any scan without shuffles. */
object QuestionParser {

  /** (type, search regex) pairs in reference dict/list order
    * (:95-134); matched case-insensitively with search semantics. */
  val TypePatterns: Seq[(String, String)] = Seq(
    ("factual", "^what is|^who is|^where is|^when is|^which is"),
    ("factual", "tell me about|information about|details about"),
    ("comparative", "compare|difference between|similar to|versus|vs"),
    ("comparative", "how does .* differ|how is .* different"),
    ("causal", "why does|what causes|reason for|because of"),
    ("causal", "how does .* affect|impact of|effect of"),
    ("procedural", "how to|steps to|process of|procedure for"),
    ("procedural", "how do I|how can I|method to"),
    ("temporal", "when did|before|after|during|timeline"),
    ("temporal", "history of|chronology|sequence of events"),
    ("definitional", "define|definition of|meaning of|what does .* mean"),
    ("definitional", "explain|explanation of"),
    ("relational", "relationship between|how is .* related|connection between"),
    ("relational", "associated with|linked to|ties between"),
    ("analytical", "patterns in|trends in|analysis of|insights about"),
    ("analytical", "what can we learn|implications of"))

  /** Stop/question words dropped from keywords (:215-248). */
  val StopWords: Seq[String] = Seq("what", "who", "where", "when", "why",
    "how", "is", "are", "was", "were", "the", "a", "an", "and", "or",
    "but", "in", "on", "at", "to", "for", "of", "with", "by", "can",
    "could", "would", "should", "will", "do", "does")

  def questionType(questionLower: Column): Column =
    TypePatterns.foldLeft(when(lit(false), "never")) {
      case (w, (t, pat)) => w.when(questionLower.rlike("(?i)" + pat), t)
    }.otherwise("factual")

  /** Proper nouns + double/single-quoted contents, >2 chars, deduped
    * and sorted (:190-213 — order divergence documented above). */
  def entities(question: Column): Column = {
    val pn = regexp_extract_all(question,
      lit("""[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*"""), lit(0))
    val dq = regexp_extract_all(question, lit("\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(question, lit("'([^']*)'"), lit(1))
    array_sort(array_distinct(
      filter(concat(pn, dq, sq), e => length(e) > 2)))
  }

  def keywords(questionLower: Column): Column =
    filter(regexp_extract_all(questionLower, lit("""\b\w+\b"""), lit(0)),
      w => length(w) > 2 && !w.isin(StopWords: _*))

  def intent(qtype: Column, ents: Column, kws: Column): Column = {
    def joinN(arr: Column, n: Int): Column =
      array_join(slice(arr, 1, n), ", ")
    when(qtype === "factual" && size(ents) > 0,
      concat(lit("Get factual information about "), joinN(ents, 2)))
      .when(qtype === "factual", "Get factual information")
      .when(qtype === "comparative",
        concat(lit("Compare entities: "), joinN(ents, 3)))
      .when(qtype === "causal",
        concat(lit("Explain causation involving "), joinN(ents, 2)))
      .when(qtype === "procedural",
        concat(lit("Provide procedural information for "), joinN(kws, 2)))
      .otherwise(concat(lit("Process "), qtype,
        lit(" question about "), joinN(ents, 2)))
  }

  /** First matching time pattern in reference order (:253-259). */
  def timeFilter(questionLower: Column): Column = coalesce(
    nullif(regexp_extract(questionLower, """in (\d{4})""", 1), lit("")),
    nullif(regexp_extract(questionLower, "during ([^,]+)", 1), lit("")),
    nullif(regexp_extract(questionLower, "before ([^,]+)", 1), lit("")),
    nullif(regexp_extract(questionLower, "after ([^,]+)", 1), lit("")))

  def limitN(questionLower: Column): Column =
    nullif(regexp_extract(questionLower, """(\d+)\s+(most|top|best)""", 1),
      lit("")).cast("int")

  def confidence(qtype: Column, ents: Column, kws: Column): Column =
    least(lit(0.5) +
      when(size(ents) > 0,
        lit(0.2) * least(size(ents) / lit(3.0), lit(1.0))).otherwise(0.0) +
      when(size(kws) > 0,
        lit(0.1) * least(size(kws) / lit(5.0), lit(1.0))).otherwise(0.0) +
      when(qtype =!= "factual", 0.2).otherwise(0.0), lit(1.0))

  /** Parse `questionCol` into the full ParsedQuestion column set. */
  def parse(df: DataFrame, questionCol: String): DataFrame = {
    val q = col(questionCol)
    val ql = lower(trim(q))
    df.withColumn("question_type", questionType(ql))
      .withColumn("entities", entities(q))
      .withColumn("keywords", keywords(ql))
      .withColumn("intent",
        intent(col("question_type"), col("entities"), col("keywords")))
      .withColumn("time_filter", timeFilter(ql))
      .withColumn("limit_n", limitN(ql))
      .withColumn("parsing_confidence",
        confidence(col("question_type"), col("entities"), col("keywords")))
  }
}
