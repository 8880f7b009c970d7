package graft

import org.apache.spark.sql.functions._
import graft.text.QualityAssessment

/** ContentQualityAnalyzer dimensions on structured text the synthetic
  * corpus can't exercise (headings, bullets, citations, URLs, dates,
  * CamelCase terms, quality-indicator words) — the regex/tier arithmetic
  * of quality_assessment.py:193-296. */
class QualityAssessmentSpec extends SparkSpec {
  import spark.implicits._

  private def assess(text: String) =
    QualityAssessment.assess(Seq(text).toDF("text"), "text", lit(1))
      .select("length_score", "structure_score", "richness_score",
        "clarity_score", "completeness_score", "overall_quality",
        "quality_level")
      .collect().head

  test("structured, cited, dated document scores high on every dimension") {
    val doc =
      """Overview:
        |# Methods
        |- detailed process documented in [1] and (Smith 2023)
        |- verified approach, see https://example.org/paper
        |
        |The method is a documented process because it was verified on
        |2024-01-02 during the study period. It took 45 seconds per run.
        |The comprehensive results are established and validated. This is
        |a thorough analysis of the technique. The DataFrame and the
        |SparkSession are the main APIs. More sentences add structure here.
        |It helps completeness too.""".stripMargin
    val r = assess(doc)
    assert(r.getDouble(0) === 0.8)      // length 100..500
    assert(r.getDouble(1) === 1.0)      // headings+bullets+paragraph? ≥ all tiers
    assert(r.getDouble(2) > 0.2)        // citations+url+numbers+date+camel
    assert(r.getDouble(3) > 0.5)        // positive indicators outweigh
    assert(r.getDouble(4) > 0.8)        // what/how/why/when addressed
    assert(Seq("good", "excellent").contains(r.getString(6)))
  }

  test("tiny vague fragment lands in the low tiers") {
    val r = assess("unclear draft, vague and speculative")
    assert(r.getDouble(0) === 0.2)      // < 50 chars
    assert(r.getDouble(1) === 0.0)      // no structure signals
    assert(r.getDouble(3) < 0.5)        // negative indicators dominate
    assert(Seq("poor", "critical", "fair").contains(r.getString(6)))
  }

  test("level tiers map scores per the reference boundaries") {
    val levels = Seq(0.95, 0.8, 0.6, 0.4, 0.1).toDF("s")
      .select(QualityAssessment.level(col("s"))).as[String].collect().toSeq
    assert(levels === Seq("excellent", "good", "fair", "poor", "critical"))
  }
}
