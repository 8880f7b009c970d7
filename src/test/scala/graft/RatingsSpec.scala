package graft

import graft.operators.Ratings

/** Batch rating updates — the assertions of the reference's
  * tests/unit/test_rating_system.py (directions, untouched ratings,
  * no_changes status, [0,1] boundary clamps). */
class RatingsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double, Double,
      Option[Double], Option[Double], Option[Double], Option[Double])]) =
    Ratings.updateRatings(rows.toDF("node_id",
      "rating_truthfulness", "rating_richness", "rating_stability",
      "confirmation", "contradiction", "richness_factor", "stability_factor"))
      .select("node_id", "rating_truthfulness", "rating_richness",
        "rating_stability", "touched_truthfulness", "touched_richness",
        "touched_stability", "status")
      .as[(String, Double, Double, Double, Boolean, Boolean, Boolean, String)]
      .collect().map(r => r._1 -> r).toMap

  test("confirmation raises truthfulness only; other ratings untouched") {
    val r = run(Seq(("n", 0.5, 0.5, 0.5, Some(1.0), None, None, None)))("n")
    assert(r._2 > 0.5 && r._2 <= 1.0 && math.abs(r._2 - 0.7) < 1e-12)
    assert(r._3 === 0.5 && r._4 === 0.5)      // not updated
    assert(r._5 && !r._6 && !r._7)            // only truthfulness touched
    assert(r._8 === "success")
  }

  test("contradiction lowers truthfulness within [0,1]") {
    val r = run(Seq(("n", 0.5, 0.5, 0.5, None, Some(1.0), None, None)))("n")
    assert(r._2 < 0.5 && r._2 >= 0.0 && math.abs(r._2 - 0.3) < 1e-12)
  }

  test("all three ratings update simultaneously with correct directions") {
    val r = run(Seq(
      ("n", 0.5, 0.5, 0.5, Some(0.5), None, Some(1.0), Some(-0.5))))("n")
    assert(r._2 > 0.5)  // confirmation 0.5 → up
    assert(r._3 > 0.5)  // richness +1.0 → up
    assert(r._4 < 0.5)  // stability −0.5 → down
    assert(r._5 && r._6 && r._7 && r._8 === "success")
  }

  test("empty evidence reports no_changes and leaves every rating as-is") {
    val r = run(Seq(("n", 0.42, 0.6, 0.7, None, None, None, None)))("n")
    assert(r._2 === 0.42 && r._3 === 0.6 && r._4 === 0.7)
    assert(!r._5 && !r._6 && !r._7)
    assert(r._8 === "no_changes")
  }

  test("boundary values clamp to [0,1] from both ends") {
    val m = run(Seq(
      ("hi", 0.9, 0.9, 0.9, Some(1.0), None, Some(1.0), Some(1.0)),
      ("lo", 0.1, 0.1, 0.1, None, Some(1.0), Some(-1.0), Some(-1.0))))
    val hi = m("hi"); val lo = m("lo")
    assert(hi._2 === 1.0 && hi._3 === 1.0 && hi._4 === 1.0)
    assert(math.abs(lo._2 - 0.0) < 1e-12)
    assert(math.abs(lo._3 - 0.0) < 1e-12 && math.abs(lo._4 - 0.0) < 1e-12)
  }
}
