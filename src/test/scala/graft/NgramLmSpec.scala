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

  test("Kneser-Ney matches hand-computed interpolated model") {
    // corpus: "a b a b" + "a b". bigram types: (a,b), (b,a) -> nbig=2.
    // counts: c(a,b)=3, c(b,a)=1; prefixes: a: c1=3 n1p=1; b: c1=1 n1p=1.
    // continuations: ncont(b)=1, ncont(a)=1 -> Pcont = 1/2 each.
    // P(b|a) = (3-.75)/3 + .75/3*1*(1/2) = 0.75 + 0.125 = 0.875
    // P(a|b) = (1-.75)/1 + .75/1*1*(1/2) = 0.25 + 0.375 = 0.625
    val out = NgramLm.scoreKneserNey(toks(1L -> "a b a b", 2L -> "a b"))
      .orderBy("doc_id").collect()
    val ce1 = -(math.log(0.875) + math.log(0.625) + math.log(0.875)) / 3
    val ce2 = -math.log(0.875)
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 1L))
    assert(math.abs(out(0).getDouble(2) - ce1) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - ce2) < 1e-12)
  }

  test("Kneser-Ney with discount near 0 recovers the ML bigram model") {
    // D -> 0: P -> c12/c1 + 0 (pure maximum likelihood, no backoff).
    val t = toks(1L -> "a b a c a b", 2L -> "b a c")
    val kn = NgramLm.scoreKneserNey(t, discount = 1e-12)
      .select("doc_id", "ce").as[(Long, Double)].collect().toMap
    // ML: doc1 bigrams (a,b)(b,a)(a,c)(c,a)(a,b): c(a,b)=2 c(a,c)=2... compute
    // directly from the instance/count frames instead of by hand:
    val inst = NgramLm.bigramInstances(t)
    val c12 = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
    val ml = inst.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), log(col("c12") / col("c1")).as("lp"))
      .groupBy("doc_id")
      .agg((-sum("lp") / count(lit(1))).as("ce"))
      .as[(Long, Double)].collect().toMap
    kn.foreach { case (d, ce) => assert(math.abs(ce - ml(d)) < 1e-9) }
  }

  test("Kneser-Ney probabilities form a proper distribution per prefix") {
    // sum over the bigram-type vocabulary of P(w2|w1) = 1 for every
    // prefix: the discounted seen mass plus backoff * sum(Pcont) where
    // sum(Pcont) = 1 by construction.
    val t = toks(1L -> "a b a c a b c b", 2L -> "b a c a")
    val d = 0.75
    val inst = NgramLm.bigramInstances(t)
    val c12 = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val pc = inst.groupBy("w1").agg(count(lit(1)).as("c1"),
      countDistinct("w2").as("n1p"))
    val cc = c12.groupBy("w2").agg(count(lit(1)).as("ncont"))
    val nbig = c12.count().toDouble
    // full grid: every prefix x every continuation word
    val grid = pc.select("w1", "c1", "n1p")
      .crossJoin(cc.select(col("w2"), (col("ncont") / nbig).as("pcont")))
      .join(c12, Seq("w1", "w2"), "left")
      .select(col("w1"),
        (coalesce(
          (col("c12") - d) / col("c1"), lit(0.0)) +
          lit(d) / col("c1") * col("n1p") * col("pcont")).as("p"))
    val sums = grid.groupBy("w1").agg(sum("p").as("mass"))
      .select("mass").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(m => math.abs(m - 1.0) < 1e-12))
  }

  test("q220 s-curve: monotone in s, crossover tightens with more bands") {
    val res = graft.queries.Catalog.byName("q220_lsh_planner")
      .run(spark, sf).orderBy("bands").collect()
    assert(res.length == 6)
    // more bands (smaller r) -> the curve rises earlier: s_half strictly
    // decreasing as bands increase
    val sHalf = res.map(_.getAs[Double]("s_half")).toSeq
    assert(sHalf == sHalf.sorted.reverse && sHalf.distinct.size == 6)
    // each config's probabilities increase with s
    res.foreach { r =>
      val ps = Seq("p_at_30", "p_at_50", "p_at_70", "p_at_90")
        .map(r.getAs[Double])
      assert(ps == ps.sorted)
    }
    // spot value: b=2, r=6 at s=0.9 -> 1-(1-0.9^6)^2
    val b2 = res.find(_.getAs[Int]("bands") == 2).get
    val expected = { val p6 = math.pow(0.9, 6); 1.0 - (1 - p6) * (1 - p6) }
    assert(math.abs(b2.getAs[Double]("p_at_90") - expected) < 1e-9)
  }
}
