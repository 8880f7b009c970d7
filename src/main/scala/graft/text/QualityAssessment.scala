package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimension content-quality analyzer
  * (quality/quality_assessment.py ContentQualityAnalyzer:87-413): five
  * component scores — length tiers, structure, richness, clarity,
  * completeness — averaged into an overall score and mapped to a quality
  * level. Every component is a pure column expression (regex counts,
  * substring membership, tier CASEs), so assessment runs inside the scan
  * at corpus scale; the q93 oracle pins the arithmetic against DuckDB.
  *
  * Faithful quirks preserved: the negative-indicator list counts
  * "incomplete" twice (it appears twice in the reference's list, and the
  * per-indicator sum counts each occurrence); sentence counts include
  * the trailing empty split segment exactly like Python's re.split.
  */
object QualityAssessment {

  // content patterns (quality_assessment.py:129-137)
  val CitationsPat = """\[(\d+)\]|\(([^)]+\d{4}[^)]*)\)"""
  val UrlsPat = """https?://[^\s]+"""
  val NumbersPat = """\b\d+(?:\.\d+)?(?:%|kg|meters?|seconds?|minutes?|hours?|days?|years?)?\b"""
  val DatesPat = """\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b|\b\d{4}-\d{2}-\d{2}\b"""
  val TechTermsPat = """\b[A-Z][a-z]*(?:[A-Z][a-z]*)+\b"""
  val BulletsPat = """(?m)^[\s]*[-*•]\s"""
  val HeadingsPat = """(?m)^#+\s|^[A-Z][^.!?]*:$"""

  // quality indicator word lists (:94-127) — substring containment, and
  // the reference's duplicate "incomplete" entry is kept on purpose
  val Positive: Seq[String] = Seq("detailed", "comprehensive", "thorough",
    "complete", "accurate", "verified", "documented", "researched",
    "evidenced", "cited", "peer-reviewed", "validated", "confirmed",
    "established")
  val Negative: Seq[String] = Seq("unclear", "incomplete", "partial",
    "unverified", "speculative", "unconfirmed", "preliminary", "draft",
    "incomplete", "fragmentary", "vague", "ambiguous", "contradictory",
    "inconsistent")

  // completeness question indicators (:303-310) — substring containment
  val QuestionIndicators: Seq[Seq[String]] = Seq(
    Seq("is", "are", "definition", "meaning", "refers to"),
    Seq("process", "method", "approach", "technique", "procedure"),
    Seq("because", "reason", "cause", "purpose", "motivation"),
    Seq("date", "time", "year", "period", "during"),
    Seq("location", "place", "region", "area", "site"))

  /** Length tiers (:193-208). */
  def lengthScore(text: Column): Column = {
    val n = length(text)
    when(n < 50, 0.2).when(n < 100, 0.5).when(n < 500, 0.8)
      .when(n < 2000, 1.0).when(n < 5000, 0.9).otherwise(0.7)
  }

  // sentence segments of > 10 trimmed chars (:227-233); split keeps the
  // trailing empty segment like Python's re.split
  private def sentenceCount(text: Column): Column =
    size(filter(split(text, "[.!?]+"), s => length(trim(s)) > 10))

  /** Structure: headings + bullets + paragraphs + sentence tiers
    * (:210-235), capped at 1. */
  def structureScore(text: Column): Column = {
    val s = when(regexp_count(text, lit(HeadingsPat)) > 0, 0.2).otherwise(0.0) +
      when(regexp_count(text, lit(BulletsPat)) > 0, 0.2).otherwise(0.0) +
      when(size(split(text, "\n\n")) > 1, 0.2).otherwise(0.0) +
      when(sentenceCount(text) >= 2, 0.2).otherwise(0.0) +
      when(sentenceCount(text) >= 5, 0.2).otherwise(0.0)
    least(s, lit(1.0))
  }

  /** Richness: citations/urls/numbers/dates/technical terms with the
    * reference's per-kind caps (:238-267), capped at 1. */
  def richnessScore(text: Column): Column = {
    def capped(pat: String, per: Double, cap: Double): Column = {
      val n = regexp_count(text, lit(pat))
      when(n > 0, least(n * per, lit(cap))).otherwise(0.0)
    }
    least(capped(CitationsPat, 0.1, 0.3) + capped(UrlsPat, 0.05, 0.2) +
      capped(NumbersPat, 0.02, 0.2) + capped(DatesPat, 0.05, 0.15) +
      capped(TechTermsPat, 0.01, 0.15), lit(1.0))
  }

  /** Clarity: base 0.5 ± indicator counts, sentence-length adjustment
    * (:269-296), clamped to [0,1]. */
  def clarityScore(text: Column): Column = {
    val lower = org.apache.spark.sql.functions.lower(text)
    def hits(words: Seq[String]): Column =
      words.map(w => when(lower.contains(w), 1).otherwise(0))
        .reduce(_ + _)
    val posAdj = least(hits(Positive) * 0.05, lit(0.3))
    val negAdj = least(hits(Negative) * 0.1, lit(0.4))
    // sentences keep empties (Python len(re.split(...))); words drop them
    // (Python str.split() — leading/trailing whitespace yields no token)
    val nSentences = size(split(text, "[.!?]+"))
    val nWords = size(filter(split(text, "\\s+"), t => length(t) > 0))
    val avgLen = nWords.cast("double") / nSentences
    val lenAdj = when(avgLen >= 10 && avgLen <= 20, 0.2)
      .when(avgLen > 30, -0.2).otherwise(0.0)
    greatest(lit(0.0), least(lit(0.5) + posAdj - negAdj + lenAdj, lit(1.0)))
  }

  /** Completeness: base 0.5 + addressed question types ·0.4/5 + present
    * metadata fields ·0.1/5 (:298-325), capped at 1. `metaFields` counts
    * how many of source/timestamp/domain/type/confidence the caller's
    * metadata carries. */
  def completenessScore(text: Column, metaFields: Column): Column = {
    val lower = org.apache.spark.sql.functions.lower(text)
    val addressed = QuestionIndicators.map { words =>
      when(words.map(w => lower.contains(w)).reduce(_ || _), 1).otherwise(0)
    }.reduce(_ + _)
    least(lit(0.5) + addressed.cast("double") / 5 * 0.4 +
      metaFields.cast("double") / 5 * 0.1, lit(1.0))
  }

  /** Overall = mean of the five components (:165-175); level per the
    * tier mapping (:389-401). */
  def level(score: Column): Column =
    when(score >= 0.9, "excellent").when(score >= 0.7, "good")
      .when(score >= 0.5, "fair").when(score >= 0.3, "poor")
      .otherwise("critical")

  /** Assess a frame: adds the five component scores, `overall_quality`,
    * and `quality_level`. */
  def assess(df: DataFrame, textCol: String, metaFields: Column): DataFrame = {
    val t = col(textCol)
    df.withColumn("length_score", lengthScore(t))
      .withColumn("structure_score", structureScore(t))
      .withColumn("richness_score", richnessScore(t))
      .withColumn("clarity_score", clarityScore(t))
      .withColumn("completeness_score", completenessScore(t, metaFields))
      .withColumn("overall_quality",
        (col("length_score") + col("structure_score") + col("richness_score") +
          col("clarity_score") + col("completeness_score")) / 5)
      .withColumn("quality_level", level(col("overall_quality")))
  }
}
