package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal-quality analyzer (quality/quality_assessment.py
  * TemporalQualityAnalyzer:651-940) — the third analyzer of the
  * reference's quality trio (content q93, structural q94). Four
  * component scores:
  *
  *  - freshness (:706-746): age tiers of the first-present timestamp
  *    field, 0.3 when none;
  *  - temporal consistency (:748-805): 4-digit years found in the
  *    content vs the metadata year, 5-year variance allowed;
  *  - update frequency (:807-830): update-counter tiers with a
  *    timestamp-presence fallback;
  *  - temporal relevance (:832-866): current/future/historical
  *    indicator-word mix, current preferred.
  *
  * Overall = mean of the four, mapped to the shared level tiers; the
  * assessment confidence (:902-916) blends metadata completeness with
  * score consistency (population variance, np.var ddof=0).
  *
  * `now` is a PARAMETER: the reference calls datetime.now(), but a
  * distributed scoring run needs one pinned instant so every executor
  * (and a re-run) scores identically. Everything is per-row column
  * arithmetic — scoring runs inside the scan, no shuffle.
  */
object TemporalQuality {

  /** The reference's metadata fields, typed: timestamp-like fields as
    * date/timestamp columns, update counters as longs. Absent fields
    * stay null literals (`Meta()`); `metadata[field]` presence maps to
    * column non-nullness. */
  final case class Meta(
      timestamp: Column, createdAt: Column, updatedAt: Column,
      modifiedAt: Column, date: Column,
      updateCount: Column, version: Column, revisionCount: Column)
  object Meta {
    private def noTs: Column = lit(null).cast("date")
    private def noN: Column = lit(null).cast("long")
    def apply(): Meta = Meta(noTs, noTs, noTs, noTs, noTs, noN, noN, noN)
  }

  // temporal indicator word lists (:834-839) — substring containment,
  // one hit per listed word present (so "currently" hits twice: both
  // "current" and "currently" are substrings — faithful quirk)
  val Current: Seq[String] =
    Seq("current", "currently", "now", "today", "recent", "latest", "modern")
  val Historical: Seq[String] =
    Seq("historical", "past", "former", "previous", "legacy", "traditional")
  val Future: Seq[String] =
    Seq("future", "upcoming", "planned", "expected", "projected", "anticipated")

  // date patterns (:750-754); only the bare-year pattern feeds the
  // consistency count (the other two can never be 4 chars long), but
  // all three decide "has temporal references"
  val YearsPat = """\b\d{4}\b"""
  val SlashDatesPat = """\b\d{1,2}[/-]\d{1,2}[/-]\d{2,4}\b"""
  val IsoDatesPat = """\b\d{4}-\d{2}-\d{2}\b"""

  // issue strings (:866-881)
  val OutdatedIssue = "Content is outdated - may need refresh"
  val InconsistentIssue = "Temporal inconsistencies detected in content"
  val NoHistoryIssue = "Content lacks update history"
  val NotRelevantIssue = "Content may not be temporally relevant"

  /** First-present timestamp field in the reference's probe order
    * (:708). */
  def latestTimestamp(m: Meta): Column =
    coalesce(m.timestamp, m.createdAt, m.updatedAt, m.modifiedAt, m.date)

  /** Freshness age tiers (:727-746). */
  def freshness(now: Column, m: Meta): Column = {
    val ts = latestTimestamp(m)
    val age = datediff(now, ts)
    when(ts.isNull, 0.3)
      .when(age <= 30, 1.0)
      .when(age <= 90, 0.8)
      .when(age <= 180, 0.6)
      .when(age <= 365, 0.4)
      .otherwise(0.2)
  }

  /** Content years vs metadata year (:748-805). Note the metadata-year
    * probe order differs from freshness (no modified_at, :766). */
  def temporalConsistency(text: Column, nowYear: Column, m: Meta): Column = {
    val yearMatches = regexp_extract_all(text, lit(YearsPat), lit(0))
    val hasDates = size(yearMatches) > 0 ||
      text.rlike(SlashDatesPat) || text.rlike(IsoDatesPat)
    val metaYear = year(coalesce(m.timestamp, m.createdAt, m.updatedAt, m.date))
    val validYears = filter(
      transform(yearMatches, y => y.cast("int")),
      y => y >= 1900 && y <= nowYear)
    val total = size(validYears)
    val inconsistent = size(filter(validYears, y => abs(y - metaYear) > 5))
    when(!hasDates, 0.7)
      .when(metaYear.isNull, 0.6)
      .when(total === 0, 0.7)
      .otherwise(lit(1.0) - inconsistent.cast("double") / total)
  }

  /** Update-counter tiers, timestamp-presence fallback (:807-830). */
  def updateFrequency(m: Meta): Column = {
    val counter = coalesce(m.updateCount, m.version, m.revisionCount)
    val nTs = Seq(m.createdAt, m.updatedAt, m.modifiedAt)
      .map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
    when(counter.isNotNull,
      when(counter === 0, 0.5).when(counter <= 3, 0.7)
        .when(counter <= 10, 0.9).otherwise(1.0))
      .otherwise(when(nTs >= 2, 0.8).otherwise(0.6))
  }

  /** Indicator-word mix, current 1.0 / future 0.8 / historical 0.6
    * (:832-866). */
  def temporalRelevance(text: Column): Column = {
    val lowered = lower(text)
    def hits(words: Seq[String]): Column =
      words.map(w => when(lowered.contains(w), 1).otherwise(0)).reduce(_ + _)
    val cur = hits(Current)
    val hist = hits(Historical)
    val fut = hits(Future)
    val total = cur + hist + fut
    when(total === 0, 0.7)
      .otherwise(least(
        (cur * lit(1.0) + fut * lit(0.8) + hist * lit(0.6)) / total, lit(1.0)))
  }

  /** Metadata completeness ·0.6 + score consistency ·0.4 (:902-916);
    * consistency = max(0, 1 − population variance of the four scores),
    * squared deviations via multiplication (pow() is not bit-stable
    * across engines). */
  def assessmentConfidence(m: Meta,
      s1: Column, s2: Column, s3: Column, s4: Column): Column = {
    val nMeta = Seq(m.timestamp, m.createdAt, m.updatedAt, m.date)
      .map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
    val metaFactor = nMeta.cast("double") / 4
    val mean = (s1 + s2 + s3 + s4) / 4
    def sq(c: Column): Column = c * c
    val variance =
      (sq(s1 - mean) + sq(s2 - mean) + sq(s3 - mean) + sq(s4 - mean)) / 4
    metaFactor * 0.6 + greatest(lit(0.0), lit(1.0) - variance) * 0.4
  }

  /** Threshold'd issue list rendered "; "-joined (:866-881) — fixed
    * reference order, so no cross-engine sort is involved. */
  def issues(fresh: Column, cons: Column, freq: Column, rel: Column): Column =
    concat_ws("; ",
      when(fresh < 0.4, OutdatedIssue),
      when(cons < 0.5, InconsistentIssue),
      when(freq < 0.5, NoHistoryIssue),
      when(rel < 0.5, NotRelevantIssue))

  /** Assess a frame: adds the four component scores, `temporal_score`,
    * `temporal_level`, `assessment_confidence`, `temporal_issues`. */
  def assess(df: DataFrame, textCol: String, now: Column, nowYear: Column,
      m: Meta): DataFrame = {
    val t = col(textCol)
    df.withColumn("freshness_score", freshness(now, m))
      .withColumn("temporal_consistency_score",
        temporalConsistency(t, nowYear, m))
      .withColumn("update_frequency_score", updateFrequency(m))
      .withColumn("temporal_relevance_score", temporalRelevance(t))
      .withColumn("temporal_score",
        (col("freshness_score") + col("temporal_consistency_score") +
          col("update_frequency_score") + col("temporal_relevance_score")) / 4)
      .withColumn("temporal_level", QualityAssessment.level(col("temporal_score")))
      .withColumn("assessment_confidence",
        assessmentConfidence(m, col("freshness_score"),
          col("temporal_consistency_score"), col("update_frequency_score"),
          col("temporal_relevance_score")))
      .withColumn("temporal_issues",
        issues(col("freshness_score"), col("temporal_consistency_score"),
          col("update_frequency_score"), col("temporal_relevance_score")))
  }
}
