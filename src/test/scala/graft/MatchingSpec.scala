package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphAnalytics

/** q338's local-dominance matching — the properties the oracle can't
  * see (both engines run the same round template): the result is a
  * VALID matching (no two matched edges share an endpoint, within or
  * across rounds), rounds only shrink the live graph, and every
  * matched edge was locally heaviest at its round (spot-checked via
  * round-1 against a driver-side reference on a small graph).
  */
class MatchingSpec extends SparkSpec {

  private def edgesOf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("a", "b", "w")
  }

  test("matching is valid: no endpoint appears twice") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.select(col("ok"), col("pk").as("a"))
      .join(li.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
    val m = GraphAnalytics.localMaxMatching(edges, 4).collect()
    assert(m.nonEmpty, "expected some matched edges on sf0.001")
    val ends = m.flatMap(r => Seq(r.getAs[Any]("a"), r.getAs[Any]("b")))
    assert(ends.distinct.length == ends.length,
      "an endpoint appears in two matched edges")
  }

  test("round 1 matches exactly the locally-dominant edges") {
    // path graph with weights 5-3-5: both weight-5 edges are locally
    // dominant (each is the heaviest at BOTH its endpoints); the
    // middle edge loses at both ends and its endpoints get matched
    // away, so 4 rounds still return exactly the two outer edges.
    val edges = edgesOf(Seq((1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 5L)))
    val m = GraphAnalytics.localMaxMatching(edges, 4)
      .select("a", "b", "round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(m == Set((1L, 2L, 1), (3L, 4L, 1)))
  }

  test("ties break on the (w, a, b) struct order deterministically") {
    // triangle with equal weights: the struct order picks (2,3) as
    // the max at every node it touches -> exactly one edge matches.
    val edges = edgesOf(Seq((1L, 2L, 7L), (1L, 3L, 7L), (2L, 3L, 7L)))
    val m = GraphAnalytics.localMaxMatching(edges, 4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((2L, 3L)))
  }
}
