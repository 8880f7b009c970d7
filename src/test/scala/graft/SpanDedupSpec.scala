package graft

import org.apache.spark.sql.functions._
import graft.dedup.SpanDedup
import graft.text.Repetition

/** Pins duplicated-span detection: shingling, cross-document duplicate
  * identification, and the span-union coverage arithmetic. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Repetition.tokens(col("text")).as("l"))

  test("shingles are 1-based sliding windows; short docs drop out") {
    val sh = SpanDedup.shingles(toks(1L -> "a b c d", 2L -> "a b"), 3)
      .orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(sh == Seq((1L, 1L, "a b c"), (1L, 2L, "b c d")))
  }

  test("coverage is the union of duplicated spans, not their sum") {
    // shared run "p q r s" sits in both docs; doc 1's two duplicated
    // 3-shingles ("p q r" at 1, "q r s" at 2) overlap on q r — the
    // union covers positions 1-4, not 6 tokens.
    val out = SpanDedup.stats(
      toks(1L -> "p q r s x y", 2L -> "z p q r s w"), 3)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getLong(2) == 4L)            // n_shingles
    assert(d1.getLong(3) == 2L)            // dup_shingles
    assert(d1.getLong(5) == 4L)            // covered_tokens = |{1,2,3,4}|
    assert(math.abs(d1.getDouble(6) - 4.0 / 6) < 1e-12)
  }

  test("a document with no cross-document span reports zeros") {
    val out = SpanDedup.stats(
      toks(1L -> "a b c d e", 2L -> "v w x y z"), 3)
      .orderBy("doc_id").collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getLong(5) == 0L))
  }

  test("extents merge overlapping spans into maximal runs, split on gaps") {
    // doc 1 shares "p q r s" (positions 1-4) with doc 2 and "x y z"
    // (positions 7-9) with doc 3; position 5-6 ("a b") is unique, so
    // the coverage splits into two extents: [1,4] and [7,9]
    val out = SpanDedup.extents(
      toks(1L -> "p q r s a b x y z",
           2L -> "k p q r s m n o w",
           3L -> "h g f e d c x y z"), 3)
      .filter(col("doc_id") === 1L)
      .orderBy("ext_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 4L, 4L), (7L, 9L, 3L)), s"got $out")
  }

  test("extents: adjacent duplicated shingles from different partners fuse") {
    // positions 1-3 dup with doc 2, positions 3-5 dup with doc 3 —
    // coverage 1-5 is contiguous, ONE extent of length 5
    val out = SpanDedup.extents(
      toks(1L -> "a b c d e",
           2L -> "x a b c y",
           3L -> "w c d e z"), 3)
      .filter(col("doc_id") === 1L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 5L, 5L)), s"got $out")
  }

  test("extentsAgainst: only ref-side shingles cover; eval never " +
      "pairs with eval") {
    // eval doc 1 shares "p q r s" with the REF side; eval docs 1 and 2
    // share "u v w x" with EACH OTHER but not with ref — asymmetric
    // extents must report only the ref-covered run
    val evalT = toks(1L -> "p q r s a u v w x",
                     2L -> "m u v w x n o t k")
    val refT = toks(10L -> "z p q r s y h g f")
    val out = SpanDedup.extentsAgainst(evalT, refT, 3)
      .orderBy("doc_id", "ext_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq((1L, 1L, 4L, 4L)), s"got $out")
    // symmetric sanity: the full sweep WOULD flag the eval-eval span
    val sym = SpanDedup.extents(evalT.unionByName(refT), 3)
      .filter(col("doc_id") === 2L).collect()
    assert(sym.nonEmpty, "symmetric extents flag the eval-eval span")
  }

  test("within-document repeats alone are not duplicated spans") {
    // "m n o m n o" repeats internally but no other doc shares it
    val out = SpanDedup.stats(
      toks(1L -> "m n o m n o", 2L -> "q r s t u v"), 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0L)
  }
}
