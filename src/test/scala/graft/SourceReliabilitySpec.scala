package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.quality.SourceReliability
import graft.quality.SourceReliability.Meta

/** Pins SourceReliability semantics (source_reliability.py:86-1060):
  * identifier normalization forms, dict-order classification (incl. the
  * "post beats blog" quirk), the authority db-miss error path, the
  * consistency count branches, freshness probing, and the weighted
  * overall combination. */
class SourceReliabilitySpec extends SparkSpec {
  import spark.implicits._

  private val now = lit(java.sql.Date.valueOf("2025-06-01"))

  private def run(rows: Seq[(Int, String, String)]) = {
    val df = rows.toDF("id", "src", "text")
    SourceReliability.assess(df, "src", "text", now, Meta())
      .orderBy("id").collect()
  }
  private def d(r: Row, n: String): Double = r.getDouble(r.fieldIndex(n))
  private def s(r: Row, n: String): String = r.getString(r.fieldIndex(n))
  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("URL normalization strips scheme, query, fragment, trailing slash") {
    val rs = run(Seq(
      (1, "https://www.cdc.gov/flu/weekly?week=3#top", "x"),
      (2, "http://example.com/a/b///", "x"),
      (3, "citation doi: 10.1000/j.123, Journal", "x"),
      (4, "  spaced   out\tcitation  ", "x")))
    assert(s(rs(0), "source_identifier") == "www.cdc.gov/flu/weekly")
    assert(s(rs(1), "source_identifier") == "example.com/a/b")
    assert(s(rs(2), "source_identifier") == "doi:10.1000/j.123")
    assert(s(rs(3), "source_identifier") == "spaced out citation")
  }

  test("classification follows the reference dict order") {
    val rs = run(Seq(
      (1, "https://www.cdc.gov/flu/", "x"),           // governmental
      (2, "Personal blog post number 5", "x"),        // "post" = news first!
      (3, "University research paper", "x"),          // academic
      (4, "https://en.wikipedia.org/wiki/T", "x"),    // reference beats wiki
      (5, "https://shop.example.com/item", "x"),      // commercial
      (6, "mysterious leaflet", "x")))                // unknown
    assert(rs.map(s(_, "source_type")).toSeq == Seq("governmental",
      "news_media", "academic", "reference", "commercial", "unknown"))
  }

  test("unknown-domain sources hit the authority error path (the np.average quirk)") {
    val r = run(Seq((1, "University research paper", "plain text"))).head
    assert(d(r, "authority_score") == 0.3)
    assert(d(r, "authority_confidence") == 0.1)
    // overall then rides only consistency (0.6 * 0.3w) + freshness
    val fs = d(r, "freshness_score")
    val expected = (0.6 * 0.2 * 0.3 + fs * 0.15 * 0.5) / (0.2 * 0.3 + 0.15 * 0.5)
    assert(close(d(r, "reliability_score"), expected))
  }

  test("known high-authority domain scores the weighted-average path") {
    val r = run(Seq((1, "https://www.cdc.gov/flu/",
      "A study with method and analysis [1] et al."))).head
    // content: 0.5 + cites([1]=numbered 0.05, et al. 0.05) + method
    // words (method 0.02, study 0.02, analysis 0.02) = 0.66
    val content = 0.5 + 0.05 + 0.05 + 0.02 + 0.02 + 0.02
    val expected = 0.9 * 0.4 + 0.8 * 0.2 + content * 0.2 + 0.5 * 0.2
    assert(close(d(r, "authority_score"), expected))
    assert(d(r, "authority_confidence") == 1.0) // 0.5+0.3+0.2+0.2 capped
  }

  test("same-source counts drive the consistency branches") {
    val rs = run(Seq(
      (1, "https://a.test/x", "t"), (2, "https://a.test/x", "t"),
      (3, "https://a.test/x", "t"), (4, "https://b.test/y", "t")))
    assert(d(rs(0), "consistency_score") == 0.75)   // n=3 >= 2
    assert(close(d(rs(0), "consistency_confidence"), 0.3)) // 3/10
    assert(d(rs(3), "consistency_score") == 0.6)    // n=1
    assert(d(rs(3), "consistency_confidence") == 0.3)
  }

  test("content freshness mixes recent and outdated indicators") {
    val r = run(Seq((1, "plain source",
      "the latest current release replaces the deprecated legacy one"))).head
    // recent: latest+current = 2 -> +0.2; outdated: deprecated+legacy = 2 -> -0.2
    assert(close(d(r, "freshness_score"), 0.5)) // only content leg present
    assert(d(r, "freshness_confidence") == 0.5)
  }
}
