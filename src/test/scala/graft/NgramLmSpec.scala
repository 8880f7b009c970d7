package graft

import org.apache.spark.sql.functions._
import graft.text.{NgramLm, Repetition}

/** Pins the corpus bigram-LM scoring on a hand-computed micro corpus
  * and the determinism contract of the position-ordered log-prob fold. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def toks(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)

  test("cross-entropy matches hand-computed add-one bigram model") {
    // corpus: "a b a b" + "a b". V = {a, b} = 2.
    // bigram counts: (a,b)=3, (b,a)=1; prefix counts: a·=3, b·=1.
    // doc 1 lp: ln(4/5), ln(2/3), ln(4/5); doc 2 lp: ln(4/5)
    val out = NgramLm.score(toks(1L -> "a b a b", 2L -> "a b"))
      .orderBy("doc_id").collect()
    val ce1 = -(math.log(4.0 / 5) + math.log(2.0 / 3) + math.log(4.0 / 5)) / 3
    val ce2 = -math.log(4.0 / 5)
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(math.abs(out(0).getDouble(2) - ce1) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - ce2) < 1e-12)
    assert(math.abs(out(0).getDouble(3) - math.exp(ce1)) < 1e-12)
  }

  test("docs under 2 tokens are out of scope") {
    assert(NgramLm.score(toks(1L -> "solo", 2L -> "a b")).count() == 1)
  }

  test("repeated formulaic docs score lower perplexity than shuffled text") {
    val formulaic = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val varied = (21 to 40).map(i =>
      (i.toLong, s"tok${i}a tok${i * 7 % 13}b the tok${i}c quick"))
    val out = NgramLm.score(toks(formulaic ++ varied: _*))
      .withColumn("kind", when(col("doc_id") <= 20, "f").otherwise("v"))
      .groupBy("kind").agg(avg("ppl").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("f") < out("v"))
  }

  test("bigram instances carry 1-based positions in document order") {
    val r = NgramLm.bigramInstances(toks(1L -> "x y z"))
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq
    assert(r == Seq((1L, "x", "y"), (2L, "y", "z")))
  }
}
