package graft

import graft.dedup.Dedup

/** Pins the Broder-containment semantics on a hand-built fixture: a
  * short doc fully embedded in a long one scores containment 1.0 while
  * its symmetric Jaccard stays below the containment threshold — the
  * exact pair class the MinHash-LSH sweep misses by construction. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // A = 6 words -> 4 distinct 3-shingles; B = A + 9 unrelated words
  // (A's shingle set is a strict subset of B's); C shares nothing.
  private val a = "w1 w2 w3 w4 w5 w6"
  private val b = a + " x1 x2 x3 x4 x5 x6 x7 x8 x9"
  private val c = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0"
  private lazy val docs =
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")

  test("embedded doc scores containment 1.0 while Jaccard stays low") {
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 3, maxDf = 10, tau = 0.9, minShingles = 3)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (aId, bId, shared, nshA, nshB, cont, jac) = got.head
    assert((aId, bId) == ((1L, 2L)))
    assert(shared == 4L && nshA == 4L && nshB == 13L)
    assert(cont == 1.0)
    // the asymmetry: Jaccard 4/13 — far under any LSH threshold
    assert(math.abs(jac - 4.0 / 13.0) < 1e-9)
  }

  test("minShingles drops trivially-contained tiny docs") {
    val withTiny = docs.union(Seq((4L, "w1 w2 w3")).toDF("doc_id", "text"))
    val got = Dedup.containmentPairs(withTiny, "doc_id", "text",
        n = 3, maxDf = 10, tau = 0.9, minShingles = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // doc 4 has ONE 3-shingle (< minShingles) — never reported even
    // though it is fully contained in both 1 and 2
    assert(got == Set((1L, 2L)))
  }

  test("hot-shingle cut removes boilerplate-driven pairs") {
    // the same boilerplate shingle in every doc; maxDf=2 cuts it, so
    // docs sharing ONLY boilerplate never pair
    val boiler = Seq(
      (1L, "b1 b2 b3 u1 u2 u3"),
      (2L, "b1 b2 b3 v1 v2 v3"),
      (3L, "b1 b2 b3 t1 t2 t3")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(boiler, "doc_id", "text",
      n = 3, maxDf = 2, tau = 0.5, minShingles = 1)
    assert(got.isEmpty)
  }
}
