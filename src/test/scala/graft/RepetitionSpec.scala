package graft

import org.apache.spark.sql.functions._
import graft.text.Repetition

/** Pins the run-length occurrence statistics (the scan-local substitute
  * for explode + group-by) and the repetition ratios on hand-counted
  * inputs. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Long, Long, Long, Long) = {
    val r = Seq(text).toDF("t")
      .select(size(Repetition.tokens(col("t"))).cast("long").as("n"),
        Repetition.runStats(Repetition.tokens(col("t"))).as("s"))
      .select(col("n"), col("s.best"), col("s.nruns"), col("s.dup"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("occurrence stats match hand counts") {
    // a a a b b c → best 3 (a), 3 distinct, 5 occurrences duplicated
    assert(stats("a a a b b c") == ((6L, 3L, 3L, 5L)))
    assert(stats("x y z") == ((3L, 1L, 3L, 0L)))      // all distinct
    assert(stats("w w w w") == ((4L, 4L, 1L, 4L)))    // one value only
    assert(stats("solo") == ((1L, 1L, 1L, 0L)))
  }

  test("word entropy matches closed-form hand values") {
    def h(text: String): Double = Seq(text).toDF("t")
      .select(Repetition.entropy(Repetition.tokens(col("t"))).as("h"))
      .as[Double].head()
    // single token: H = 0 up to the micro-quantization residue
    // (round(ln4·1e6)·4 − round(4·ln4·1e6) = −1 → −2.5e-7; the oracle
    // quantizes identically, so the residue is cross-engine-stable)
    assert(math.abs(h("w w w w")) < 1e-6)
    assert(h("") == 0.0)                    // empty doc guard (exact)
    // 4 evenly-spread tokens: H = ln(4) at micro precision
    assert(math.abs(h("a b c d") - math.log(4)) < 1e-6)
    // a a b b: H = ln(2) — terms 2·2ln2 cancel against 4·ln4 exactly
    assert(math.abs(h("a a b b") - math.log(2)) < 1e-6)
    // skewed: a a a b → ln(4) - (3 ln 3)/4
    assert(math.abs(h("a a a b") - (math.log(4) - 3 * math.log(3) / 4)) < 1e-6)
  }

  test("tokenizer drops empties from ragged whitespace") {
    assert(stats("  a  b\t c ")._1 == 3L)
  }

  test("bigrams are adjacent pairs in order") {
    val b = Seq("a b c b").toDF("t")
      .select(Repetition.bigrams(Repetition.tokens(col("t"))))
      .head().getSeq[String](0)
    assert(b == Seq("a b", "b c", "c b"))
  }

  test("a generation loop fails the filter, varied text passes") {
    val df = Seq(
      ("loop", ("the cat sat. " * 20).trim),
      ("varied", (1 to 60).map(i => s"tok$i").mkString(" ")))
      .toDF("name", "text")
    val toks = Repetition.tokens(col("text"))
    val out = df
      .withColumn("ws", Repetition.runStats(toks))
      .withColumn("n", size(toks).cast("long"))
      .withColumn("top", Repetition.topShare(col("ws"), col("n")))
      .select("name", "top").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("loop") > 0.3 && out("varied") < 0.02)
  }
}
