package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Pins the cluster-canonicalization contract: pair chains collapse into
  * one cluster (near-dup is not transitive; components are), the
  * cluster label is the smallest member id, the survivor is the longest
  * text with ties to the smallest id, and unpaired docs stay out. */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aa bb cc dd ee"),       // chain 1-2-3: one cluster
    (2L, "aa bb cc dd ee ff gg"), // longest → canonical
    (3L, "aa bb cc dd"),
    (4L, "zz yy"),                // pair 4-5, equal lengths → min id wins
    (5L, "xx ww"),
    (6L, "standalone never paired")).toDF("doc_id", "text")

  private val pairs = Seq(
    (1L, 2L), (2L, 3L), // chain — 1 and 3 never directly paired
    (4L, 5L)).toDF("a_id", "b_id")

  private lazy val out =
    Dedup.clusters(pairs, docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("pair chains close into one cluster labeled by the min id") {
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // 6 stays out
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct == Seq(3L))
    assert(Seq(4L, 5L).map(out(_)._1).distinct == Seq(4L))
  }

  test("survivor is the longest text, ties break to the smallest id") {
    assert(out(2L)._3 && !out(1L)._3 && !out(3L)._3) // doc 2 longest
    assert(out(4L)._3 && !out(5L)._3)                // tie → min id
  }

  test("anti-join on non-canonical ids yields the deduped corpus") {
    val drop = Dedup.clusters(pairs, docs, "doc_id", "text")
      .filter(!col("is_canonical")).select("doc_id")
    val kept = docs.join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 4L, 6L))
  }

  test("q277: Chapman estimate dominates both catches; overlap bounded") {
    val r = graft.queries.Catalog.byName("q277_dedup_recall_estimate")
      .run(spark, sf).collect().head
    val n1 = r.getAs[Long]("n_lsh")
    val n2 = r.getAs[Long]("n_simhash")
    val m = r.getAs[Long]("n_both")
    val est = r.getAs[Long]("est_total")
    assert(m <= math.min(n1, n2))
    // (n1+1)(n2+1)/(m+1) - 1 >= max(n1, n2) whenever m <= min (up to
    // the integral-division floor)
    assert(est >= math.max(n1, n2) - 1)
    Seq("recall_lsh", "recall_simhash").foreach(c =>
      Option(r.getAs[java.lang.Double](c)).foreach(v =>
        assert(v > 0.0 && v <= 1.0)))
  }
}
