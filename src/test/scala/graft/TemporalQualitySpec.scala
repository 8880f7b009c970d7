package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.text.TemporalQuality
import graft.text.TemporalQuality.Meta

/** Pins the TemporalQualityAnalyzer semantics
  * (quality_assessment.py:651-940) on hand-computed fixtures: freshness
  * age tiers, year-consistency paths, update-frequency fallbacks,
  * relevance mixing, the level mapping, confidence arithmetic, and the
  * issue list. */
class TemporalQualitySpec extends SparkSpec {
  import spark.implicits._

  private val now = lit(java.sql.Date.valueOf("2025-06-01"))

  private def assessed(rows: Seq[(Int, String, String, String, java.lang.Long)]) = {
    val df = rows.toDF("id", "text", "created_s", "updated_s", "update_count")
      .withColumn("created_at", col("created_s").cast("date"))
      .withColumn("updated_at", col("updated_s").cast("date"))
    val m = Meta().copy(createdAt = col("created_at"),
      updatedAt = col("updated_at"), updateCount = col("update_count"))
    TemporalQuality.assess(df, "text", now, lit(2025), m)
      .orderBy("id").collect()
  }

  private def d(r: Row, name: String): Double =
    r.getDouble(r.fieldIndex(name))
  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("fresh, consistent, regularly-updated content scores excellent") {
    // "currently" hits both "current" and "currently" (substring quirk)
    val r = assessed(Seq((1,
      "Currently shipping in 2024 and planned for 2025.",
      "2025-05-20", "2025-05-25", 5L))).head
    assert(d(r, "freshness_score") == 1.0)          // age 12 days
    assert(d(r, "temporal_consistency_score") == 1.0) // |2024-2025| <= 5
    assert(d(r, "update_frequency_score") == 0.9)   // count 5 in (3,10]
    val rel = (2 * 1.0 + 1 * 0.8) / 3               // cur=2, fut=1
    assert(close(d(r, "temporal_relevance_score"), rel))
    val mean = (1.0 + 1.0 + 0.9 + rel) / 4
    assert(close(d(r, "temporal_score"), mean))
    assert(r.getString(r.fieldIndex("temporal_level")) == "excellent")
    assert(r.getString(r.fieldIndex("temporal_issues")) == "")
  }

  test("missing metadata takes the neutral/fallback paths") {
    val r = assessed(Seq((1, "The year 1850 was historical.",
      null, null, null))).head
    assert(d(r, "freshness_score") == 0.3)            // no timestamp
    assert(d(r, "temporal_consistency_score") == 0.6) // dates, no meta year
    assert(d(r, "update_frequency_score") == 0.6)     // no counter, <2 ts
    assert(d(r, "temporal_relevance_score") == 0.6)   // historical only
    assert(r.getString(r.fieldIndex("temporal_level")) == "fair") // 0.525
    // confidence: meta factor 0; var of [.3,.6,.6,.6] = 0.016875
    assert(close(d(r, "assessment_confidence"), (1.0 - 0.016875) * 0.4))
  }

  test("stale inconsistent never-updated content collects issues") {
    // 2030 > nowYear is filtered from the valid-year set; 1995 vs
    // metadata year 2020 breaks the 5-year variance
    val r = assessed(Seq((1, "In 1995 and 2030 something happened.",
      "2020-01-01", null, 0L))).head
    assert(d(r, "freshness_score") == 0.2)            // ~5.4 years old
    assert(d(r, "temporal_consistency_score") == 0.0) // 1/1 inconsistent
    assert(d(r, "update_frequency_score") == 0.5)     // count 0
    assert(d(r, "temporal_relevance_score") == 0.7)   // no indicator words
    assert(r.getString(r.fieldIndex("temporal_level")) == "poor") // 0.35
    assert(r.getString(r.fieldIndex("temporal_issues")) ==
      TemporalQuality.OutdatedIssue + "; " + TemporalQuality.InconsistentIssue)
  }

  test("no temporal references is neutral; two timestamps imply updates") {
    val r = assessed(Seq((1, "Plain text without any temporal reference.",
      "2025-04-01", "2025-05-01", null))).head
    assert(d(r, "temporal_consistency_score") == 0.7) // no dates found
    assert(d(r, "update_frequency_score") == 0.8)     // 2 timestamps present
    assert(d(r, "freshness_score") == 0.8)            // 61 days
    // meta factor: created+updated of the 4 probe fields = 2/4
    val scores = Seq(0.8, 0.7, 0.8, 0.7)
    val m = scores.sum / 4
    val variance = scores.map(s => (s - m) * (s - m)).sum / 4
    assert(close(d(r, "assessment_confidence"),
      0.5 * 0.6 + (1.0 - variance) * 0.4))
  }

  test("slash dates count as temporal references but not as years") {
    // pattern 2 matches, no 4-digit year => consistency takes the
    // valid-year-empty 0.7 branch (metadata year present)
    val r = assessed(Seq((1, "Meeting on 12/31/24 as planned.",
      "2024-06-01", null, 2L))).head
    assert(d(r, "temporal_consistency_score") == 0.7)
    assert(d(r, "update_frequency_score") == 0.7)     // count 2 in [1,3]
  }
}
