package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphAnalytics

/** The packed-rank triangle census (round 14: single-long (degree, id)
  * ranks + SHUFFLE_HASH closing join for integral-key graphs) must be a
  * pure physical-plan change: identical (u, v, w) triangles, support
  * and per-node counts to the generic struct-orientation form, which
  * still serves string-keyed graphs. The packing applies only when the
  * measured (max id, max degree) bounds fit a long — graphs that don't
  * fit must silently take the generic path, never corrupt. */
class PackedCensusSpec extends SparkSpec {

  // a graph with triangles, a degree tie, and ids whose numeric order
  // differs from no ordering trap in particular — every edge appears
  // in canonical a<b form
  private def intEdges = {
    import spark.implicits._
    Seq(
      (100L, 99L), (7L, 100L), (7L, 99L),   // triangle {7, 99, 100}
      (3L, 7L), (3L, 99L),                  // triangle {3, 7, 99}
      (3L, 42L), (42L, 99L),                // triangle {3, 42, 99}
      (1L, 2L)                              // dangling edge
    ).toDF("x", "y")
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
  }

  private def asStrings(df: org.apache.spark.sql.DataFrame) =
    df.select(format_string("n%04d", col("a")).as("a"),
      format_string("n%04d", col("b")).as("b"))

  test("packed edgeSupport == generic edgeSupport (string twin)") {
    // zero-padded string ids preserve the numeric order, so the two
    // graphs are isomorphic WITH identical (degree, id) rank orders —
    // the censuses must agree edge for edge
    val packed = GraphAnalytics.edgeSupport(intEdges)
      .collect().map(r => (f"n${r.getLong(0)}%04d", f"n${r.getLong(1)}%04d")
        -> r.getLong(2)).toMap
    val generic = GraphAnalytics.edgeSupport(asStrings(intEdges))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(packed.nonEmpty && packed == generic)
  }

  test("packed triangleCounts == generic triangleCounts") {
    val packed = GraphAnalytics.triangleCounts(intEdges)
      .collect().map(r => f"n${r.getLong(0)}%04d" -> r.getLong(1)).toMap
    val generic = GraphAnalytics.triangleCounts(asStrings(intEdges))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed.nonEmpty && packed == generic)
  }

  test("packedBounds engages on integral keys and refuses non-packable") {
    // the dispatch itself (plan internals are behind the lineage cut,
    // so the physical shape can't be string-matched — the bounds logic
    // is the decision point and is tested directly)
    import spark.implicits._
    def bounds(df: org.apache.spark.sql.DataFrame) =
      GraphAnalytics.packedBounds(df, GraphAnalytics.degrees(df))
    assert(bounds(intEdges) == Some(7)) // max id 100 → 7 id bits
    assert(bounds(asStrings(intEdges)).isEmpty) // strings: generic
    // a negative id cannot pack (rank order would break)
    val neg = Seq((-5L, 1L), (-5L, 2L), (1L, 2L), (2L, 3L))
      .toDF("x", "y")
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    assert(bounds(neg).isEmpty)
    // and the census is still exact via the generic path
    val sup = GraphAnalytics.edgeSupport(neg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(sup == Map((-5L, 1L) -> 1L, (-5L, 2L) -> 1L, (1L, 2L) -> 1L))
  }

  test("degree overflow against the id width falls back, not corrupts") {
    import spark.implicits._
    // ids near 2^62 leave 0 bits for degree — packedBounds must refuse
    val big = (1L << 61)
    val edges = Seq((big, big + 1), (big, big + 2), (big + 1, big + 2))
      .toDF("a", "b")
    val sup = GraphAnalytics.edgeSupport(edges).collect()
    assert(sup.length == 3 && sup.forall(_.getLong(2) == 1L))
  }
}
