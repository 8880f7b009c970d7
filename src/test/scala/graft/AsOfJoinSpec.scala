package graft

import graft.operators.AsOfJoin

/** Fixture pins for the backward as-of join: equal-ordinate match,
  * tolerance exclusion, no-match nulls, and by-group isolation — the
  * q241 oracle (DuckDB's native ASOF JOIN) proves cross-engine
  * equality; these pin the operator semantics on hand-checked rows. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("u1", 5L, "l5"), ("u1", 10L, "l10"), ("u1", 15L, "l15"),
    ("u1", 25L, "l25"), ("u1", 100L, "l100"),
    ("u2", 50L, "l50")).toDF("k", "sec", "lid")

  private def right = Seq(
    ("u1", 10L, "A"), ("u1", 20L, "B"),
    ("u2", 1L, "Z")).toDF("k", "sec", "rid")

  test("backward: latest right at-or-before, per group") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "sec")
      .select("k", "sec", "lid", "rid", "asof_gap")
      .as[(String, Long, String, Option[String], Option[Long])]
      .collect().map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(got(("u1", 5L)) == ((None, None)))        // nothing before
    assert(got(("u1", 10L)) == ((Some("A"), Some(0L)))) // equal ts matches
    assert(got(("u1", 15L)) == ((Some("A"), Some(5L))))
    assert(got(("u1", 25L)) == ((Some("B"), Some(5L))))
    assert(got(("u1", 100L)) == ((Some("B"), Some(80L))))
    assert(got(("u2", 50L)) == ((Some("Z"), Some(49L)))) // group-isolated
  }

  test("backward with tolerance: distant matches null out") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "sec", Some(50L))
      .select("k", "sec", "rid", "asof_gap")
      .as[(String, Long, Option[String], Option[Long])]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("u1", 25L)) == ((Some("B"), Some(5L))))
    assert(got(("u1", 100L)) == ((None, None))) // gap 80 > tol 50
    assert(got(("u2", 50L)) == ((Some("Z"), Some(49L)))) // gap 49 <= 50
  }

  test("row count is exactly |left| and left payload survives") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "sec")
    assert(out.count() == left.count())
    assert(out.select("lid").as[String].collect().sorted.toSeq ==
      Seq("l10", "l100", "l15", "l25", "l5", "l50"))
  }
}
