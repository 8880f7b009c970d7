package graft

import java.sql.Date
import graft.quality.ContradictionResolution

/** Pins the bounded-group contract of contradiction detection
  * (contradiction_resolution.py:110-700; candidate slice precedent
  * enhanced_mcp_endpoint.py:612): at most `maxPerDomain` nodes per
  * domain — the first N by `ord` — enter the pairwise stage. */
class ContradictionResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (String, Long, String, String, Double,
      Date, Double)*) =
    rows.toDF("node_id", "ord", "domain", "content", "authority", "ts",
      "confidence")

  test("maxPerDomain keeps the first N by ord; pairs beyond it vanish") {
    val d = Date.valueOf("2024-03-01")
    // all three pairwise contradict: "is"/"is not" is substring-matched,
    // and every content has "is", two have "is not"
    val n = nodes(
      ("a", 1, "d", "the system is stable now", 0.9, d, 0.9),
      ("b", 2, "d", "the system is not stable now", 0.2, d, 0.3),
      ("c", 3, "d", "this one is not holding steady", 0.5, d, 0.5))
    val full = ContradictionResolution.resolve(n)
      .select("case_id").as[String].collect().toSet
    assert(full ==
      Set("contradiction_a_b", "contradiction_a_c", "contradiction_b_c"))
    val capped = ContradictionResolution.resolve(n, maxPerDomain = 2)
      .select("case_id").as[String].collect().toSet
    assert(capped == Set("contradiction_a_b"))
  }

  test("cap is per-domain, not global") {
    val d = Date.valueOf("2024-03-01")
    val n = nodes(
      ("a1", 1, "d1", "alpha is true for sure", 0.9, d, 0.9),
      ("a2", 2, "d1", "alpha is false for sure", 0.2, d, 0.3),
      ("b1", 1, "d2", "beta is true for sure", 0.9, d, 0.9),
      ("b2", 2, "d2", "beta is false for sure", 0.2, d, 0.3))
    val capped = ContradictionResolution.resolve(n, maxPerDomain = 2)
      .select("case_id").as[String].collect().toSet
    assert(capped == Set("contradiction_a1_a2", "contradiction_b1_b2"))
  }
}
