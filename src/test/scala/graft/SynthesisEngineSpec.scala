package graft

import graft.operators.SynthesisEngine

/** Pins the comprehensive-synthesis integration arithmetic
  * (knowledge_synthesis_engine.py:303-780): cross-validation gating,
  * data-coverage tiers, the 0.7/0.3 confidence combination with its
  * 0.95 cap, and every executive-summary branch. */
class SynthesisEngineSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("query_text", "qa_confidence", "qa_sources",
    "n_patterns", "n_trends", "n_anomalies", "insight_confidence",
    "n_perspectives", "perspective_confidence", "overall_consensus",
    "n_agreements", "sources_analyzed")

  private def legs(rows: (String, Option[Double], Long, Long, Long, Long,
      Option[Double], Long, Double, Option[String], Long, Long)*) =
    rows.toDF(cols: _*)

  test("full legs: confidence combination, cap, summary branches") {
    val r = SynthesisEngine.comprehensive(legs(
      ("What is X?", Some(0.9), 5L, 3L, 1L, 0L, Some(0.8), 4L, 0.9,
        Some("moderate_consensus"), 4L, 12L))).collect().head
    // cross-val = min(4/4 + 0.3, 1) = 1.0; base = (.9+.8+.9)/3
    assert(r.getAs[Double]("cross_validation_score") == 1.0)
    assert(r.getAs[Double]("data_coverage") == 0.9) // >= 10 sources
    val expected = math.min((0.9 + 0.8 + 0.9) / 3 * 0.7 + 1.0 * 0.3, 0.95)
    assert(math.abs(r.getAs[Double]("synthesis_confidence") - expected) < 1e-12)
    val summary = r.getAs[String]("executive_summary")
    assert(summary.startsWith("Comprehensive synthesis for: What is X?. "))
    assert(summary.contains(
      "Direct answer provided with 90.0% confidence based on 5 sources"))
    assert(summary.contains("Discovered 4 insights"))
    assert(summary.contains(
      "Analyzed 4 different perspectives with moderate consensus among " +
        "viewpoints"))
    assert(summary.endsWith("High confidence in synthesis results."))
  }

  test("absent legs: neutral cross-val, empty-branch summaries") {
    val r = SynthesisEngine.comprehensive(legs(
      ("Quiet topic", None, 0L, 0L, 0L, 0L, None, 0L, 0.0, None, 0L, 0L)))
      .collect().head
    assert(r.getAs[Double]("cross_validation_score") == 0.5) // no QA/persp
    assert(r.getAs[Double]("data_coverage") == 0.1) // zero sources
    // base = 0.0/1 (perspective report always counts); synth = 0.15
    assert(math.abs(r.getAs[Double]("synthesis_confidence") - 0.15) < 1e-12)
    val summary = r.getAs[String]("executive_summary")
    assert(!summary.contains("Direct answer"))
    assert(summary.contains("No significant patterns or trends identified"))
    assert(summary.contains("Limited perspective diversity found"))
    assert(summary.endsWith(
      "Low confidence - additional research recommended."))
  }

  test("0.95 cap and coverage tiers") {
    val r = SynthesisEngine.comprehensive(legs(
      ("Max topic", Some(1.0), 3L, 1L, 0L, 0L, Some(1.0), 2L, 1.0,
        Some("strong_consensus"), 2L, 4L))).collect().head
    assert(r.getAs[Double]("synthesis_confidence") == 0.95) // capped
    assert(r.getAs[Double]("data_coverage") == 0.5) // 3-4 sources
  }
}
