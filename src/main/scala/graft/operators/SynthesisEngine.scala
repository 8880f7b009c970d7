package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Comprehensive-synthesis integration
  * (synthesis/knowledge_synthesis_engine.py:303-780): combines the
  * per-query QA / insight / perspective leg results into the engine's
  * ComprehensiveSynthesisResult meta fields — cross-validation
  * confidence from answer-vs-viewpoint agreement (:555-579), data
  * coverage tiers from unique-source counts (:581-594), the combined
  * synthesis confidence (equal-weight leg mean ×0.7 + cross-validation
  * ×0.3, capped 0.95, :361-390 via _calculate_synthesis_confidence)
  * and the executive summary (:410-459).
  *
  * Input: one row per synthesis request with the leg stats —
  * `qa_confidence` (null = QA leg absent), `qa_sources`,
  * `n_patterns`/`n_trends`/`n_anomalies`, `insight_confidence` (null =
  * no insights collected), `n_perspectives`,
  * `perspective_confidence`, `overall_consensus` (null = none),
  * `n_agreements` (viewpoints whose word overlap with the answer
  * exceeds the 0.2 alignment gate), `sources_analyzed`, `query_text`.
  * Pure per-row column arithmetic — composes into any plan. */
object SynthesisEngine {

  /** `{:.1%}`-style rendering: value×100 rounded to one decimal; the
    * double's shortest repr always carries the .0 for whole values. */
  private def pct(x: Column): Column =
    concat(round(x * 100, 1).cast("string"), lit("%"))

  def comprehensive(legs: DataFrame): DataFrame = {
    val insightCount = col("n_patterns") + col("n_trends") + col("n_anomalies")
    val crossVal = when(col("qa_confidence").isNull ||
        col("n_perspectives") === 0, 0.5)
      .otherwise(least(
        col("n_agreements").cast("double") / col("n_perspectives") + 0.3,
        lit(1.0)))
    val dataCoverage = when(col("sources_analyzed") >= 10, 0.9)
      .when(col("sources_analyzed") >= 5, 0.7)
      .when(col("sources_analyzed") >= 3, 0.5)
      .when(col("sources_analyzed") >= 1, 0.3).otherwise(0.1)
    // equal-weight mean over the legs that produced a confidence; the
    // perspective report always reports (0.0 when no viewpoints), like
    // the reference's always-present report object
    val baseSum = coalesce(col("qa_confidence"), lit(0.0)) +
      coalesce(col("insight_confidence"), lit(0.0)) +
      col("perspective_confidence")
    val baseN = when(col("qa_confidence").isNotNull, 1).otherwise(0) +
      when(col("insight_confidence").isNotNull, 1).otherwise(0) + lit(1)
    val base = baseSum / baseN
    val synthConf = least(base * 0.7 + col("cross_validation_score") * 0.3,
      lit(0.95))

    val withCross = legs
      .withColumn("cross_validation_score", crossVal)
      .withColumn("data_coverage", dataCoverage)
      .withColumn("synthesis_confidence", synthConf)

    val qaPart = when(col("qa_confidence").isNotNull,
      concat(lit("Direct answer provided with "), pct(col("qa_confidence")),
        lit(" confidence"),
        when(col("qa_sources") > 0,
          concat(lit(" based on "), col("qa_sources").cast("string"),
            lit(" sources"))).otherwise("")))
    val insightPart = when(insightCount > 0,
      concat(lit("Discovered "), insightCount.cast("string"),
        lit(" insights including patterns, trends, and anomalies")))
      .otherwise("No significant patterns or trends identified")
    val perspectivePart = when(col("n_perspectives") > 0,
      concat(lit("Analyzed "), col("n_perspectives").cast("string"),
        lit(" different perspectives"),
        when(col("overall_consensus").isNotNull,
          concat(lit(" with "),
            regexp_replace(col("overall_consensus"), "_", " "),
            lit(" among viewpoints"))).otherwise("")))
      .otherwise("Limited perspective diversity found")
    val overallPart = when(col("synthesis_confidence") > 0.7,
      "High confidence in synthesis results")
      .when(col("synthesis_confidence") > 0.4,
        "Moderate confidence in synthesis results")
      .otherwise("Low confidence - additional research recommended")
    val summary = concat_ws(". ",
      concat(lit("Comprehensive synthesis for: "), col("query_text")),
      qaPart, insightPart, perspectivePart, overallPart)

    withCross.withColumn("executive_summary", concat(summary, lit(".")))
  }
}
