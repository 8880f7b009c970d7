package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Decontaminate

/** Pins the decontamination join: shingle construction (including the
  * under-n guard), shared-count semantics on distinct n-grams, the
  * minShared gate, and the boilerplate document-frequency cut. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("wordShingles: sliding n-grams, distinct, empty under n tokens") {
    val out = df((1L, "a b c d"), (2L, "a b"), (3L, "x x x x"))
      .select(col("doc_id"),
        Decontaminate.wordShingles(split(col("text"), " "), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)       // 2 tokens < n=3 -> no shingles
    assert(out(3L) == Seq("x x x"))    // duplicates collapse
  }

  test("sharedNgrams counts distinct shared shingles and gates on minShared") {
    val bench = df((100L, "the quick brown fox jumps over the lazy dog"))
    val train = df(
      (1L, "xx the quick brown fox jumps over yy"), // shares 2 distinct 5-grams
      (2L, "totally unrelated text with nothing in common here"),
      (3L, "quick brown fox jumps over the lazy dog indeed")) // shares 4
    val out = Decontaminate
      .sharedNgrams(train, bench, "doc_id", "text", n = 5, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.map(_._1).toSeq == Seq(1L, 3L)) // doc 2 drops
    assert(out.head == ((1L, 100L, 2L)))
    // doc 3 holds 4 of the benchmark's 5 distinct 5-grams (all but
    // "the quick brown fox jumps")
    assert(out(1) == ((3L, 100L, 4L)))
  }

  test("maxBenchDf drops boilerplate shingles before the join") {
    // the same license line in every benchmark doc
    val bench = df(
      (100L, "standard license header text one two"),
      (101L, "standard license header text one two"),
      (102L, "standard license header text one two unique tail here okay"))
    val train = df((1L, "standard license header text one two"),
      (2L, "two unique tail here okay"))
    val capped = Decontaminate.sharedNgrams(train, bench, "doc_id", "text",
      n = 5, minShared = 1L, maxBenchDf = Some(2))
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // the boilerplate 5-grams (df=3 > 2) vanish; only the unique tail hits
    assert(got.toSeq == Seq((2L, 102L)))
  }
}
