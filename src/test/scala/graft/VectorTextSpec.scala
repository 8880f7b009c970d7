package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.text.TextFunctions
import graft.semantic.VectorSearch
import graft.operators.Ranking

class VectorTextSpec extends SparkSpec {
  import spark.implicits._

  test("cosine / l2 / dot on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.cosine(col("a"), col("a")).as("caa"),
      VectorFunctions.cosine(col("a"), col("b")).as("cab"),
      VectorFunctions.dot(col("a"), col("c")).as("dac"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("dab"),
      VectorFunctions.l2Similarity(col("a"), col("a")).as("saa"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 3.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(2)) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("cosine of zero vector is 0 (epsilon guard)") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("z", "v")
    val r = df.select(VectorFunctions.cosine(col("z"), col("v"))).collect()(0)
    assert(r.getDouble(0) == 0.0)
  }

  test("topK returns k best by cosine, self first") {
    val data = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val q = data.filter(col("vec_id") === 0).select(col("embedding"))
    val got = VectorSearch.topK(data, q, 3).select("vec_id")
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 3L, 1L))
  }

  test("fingerprint is order-sensitive, tokens are not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint(col("x")).as("fx"),
      TextFunctions.fingerprint(col("y")).as("fy")).collect()(0)
    assert(r.getLong(0) != r.getLong(1))
  }

  test("minhash estimate approximates jaccard, exact for identical sets") {
    val df = Seq(("a b c d", "a b c d", "x y z w")).toDF("t1", "t2", "t3")
    val k = 12
    val r = df.select(
      TextFunctions.minhashEstimate(
        TextFunctions.minhashSignature(col("t1"), k),
        TextFunctions.minhashSignature(col("t2"), k), k).as("same"),
      TextFunctions.minhashEstimate(
        TextFunctions.minhashSignature(col("t1"), k),
        TextFunctions.minhashSignature(col("t3"), k), k).as("diff"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0) // disjoint sets share no minima
  }

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      ("the cat and the dog is in a house", "en"),
      ("der hund und die katze ist da", "de"),
      ("le chat et la maison est grande", "fr"),
      ("xyzzy plugh foobar", "und"))
      .toDF("text", "expected")
    val got = df.select(TextFunctions.langId(col("text")), col("expected"))
      .as[(String, String)].collect()
    got.foreach { case (pred, exp) => assert(pred == exp, s"$pred != $exp") }
  }

  test("quality score bounded in [0,1] and rewards mid-length docs") {
    val df = Seq(("word " * 40 + "end", 203L), ("hi", 2L)).toDF("text", "n_chars")
    val r = df.select(TextFunctions.qualityScore(col("text"), col("n_chars")))
      .as[Double].collect()
    assert(r.forall(q => q >= 0 && q <= 1))
    assert(r(0) > r(1))
  }

  test("greedy diversity keeps first of each near-duplicate cluster") {
    val sets = Seq(Set("a", "b", "c"), Set("a", "b", "c", "d"), Set("x", "y"))
    assert(Ranking.greedyDiversityKeep(sets, 0.7) == Seq(1, 3))
  }

  test("q255: JL distortion concentrates around 1 and buckets are sane") {
    val rows = graft.queries.Catalog.byName("q255_jl_distortion")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    var n = 0L; var weighted = 0.0
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 15L)
      val np = r.getAs[Long]("n_pairs")
      assert(np > 0L)
      val mean = r.getAs[Double]("mean_distortion")
      assert(r.getAs[Double]("min_distortion") <= mean)
      assert(mean <= r.getAs[Double]("max_distortion"))
      n += np; weighted += mean * np
    }
    // E[distortion] = 1 for +-1 projections; k=16 keeps the corpus mean
    // well inside [0.6, 1.4] even though single pairs stray
    val overall = weighted / n
    assert(overall > 0.6 && overall < 1.4, s"mean distortion $overall")
  }

  test("q290 encoding-audit patterns detect each dirt class, pass clean text") {
    // the synthetic corpus is clean (catalog run reads all-zero counts),
    // so the detection power needs its own pin: one dirty doc per class
    import graft.queries.TextQueries
    import spark.implicits._
    val rows = Seq(
      ("clean", "hello world, nothing wrong here"),
      ("repl", "decode � failure"),
      ("ctrl", "binarybleed"),
      ("zw", "sneaky​zero-width"),
      ("moji", "donâ€™t double-encode"))
      .toDF("kind", "text")
    val got = rows.select(col("kind"),
        col("text").rlike(TextQueries.ReplPat).as("r"),
        col("text").rlike(TextQueries.CtrlPat).as("c"),
        col("text").rlike(TextQueries.ZeroWidthPat).as("z"),
        col("text").rlike(TextQueries.MojibakePat).as("m"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(got("clean") == ((false, false, false, false)))
    assert(got("repl") == ((true, false, false, false)))
    assert(got("ctrl") == ((false, true, false, false)))
    assert(got("zw") == ((false, false, true, false)))
    assert(got("moji") == ((false, false, false, true)))
  }

  test("q255 sign matrix: Scala md5 twin matches the engine hash parity") {
    val got = spark.sql(
      "SELECT conv(substr(md5('3#17'), 1, 8), 16, 10) % 2 AS p").collect()
      .head.get(0).toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("3#17".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex, 16) % 2L
    assert(got == want.toString)
  }
}
