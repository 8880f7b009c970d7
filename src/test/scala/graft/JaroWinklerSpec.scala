package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.JaroWinklerImpl
import graft.text.{TextFunctions => TF}

/** Pins JaroWinklerExpr to the de-facto standard semantics (values
  * produced by DuckDB's independent jaro_winkler_similarity, which the
  * q245 oracle compares wholesale): match window, transposition
  * halving, the 0.7 boost threshold, the 4-char prefix cap, and the
  * empty/equal edge cases — on BOTH the interpreted (nullSafeEval) and
  * codegen paths.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, expected) — expected values are DuckDB outputs, not ours
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111), // transpositions + boost
    ("dixon", "dicksonx", 0.8133333333333332), // window matching + boost
    ("dwayne", "duane", 0.8400000000000001),
    ("crate", "trace", 0.7333333333333334),   // jaro > .7 but prefix 0
    ("aaaaab", "aaaaac", 0.9333333333333333), // prefix capped at 4
    ("ab", "abcdefghijklmnop", 0.7666666666666667), // just over threshold
    ("abcdef", "abzzzz", 0.5555555555555555), // under .7: NO boost
    ("ab", "ba", 0.0),                        // window 0 -> no matches
    ("a", "a", 1.0),
    ("", "x", 0.0),
    ("", "", 0.0),                            // DuckDB: empty-empty is 0
    // non-ASCII: DuckDB 1.0 runs the DP over UTF-8 BYTES, and so do we
    // (a codepoint DP would read 0.8833/0.6667 on the first two)
    ("café", "cafe", 0.8483333333333334),
    ("éa", "ea", 0.0),
    ("naïve", "naive", 0.8577777777777779),
    ("日本語", "日本", 0.9333333333333333))

  test("interpreted path matches the DuckDB-pinned values") {
    cases.foreach { case (a, b, want) =>
      val got = JaroWinklerImpl.jw(a, b)
      assert(math.abs(got - want) < 1e-12, s"jw('$a','$b') = $got, want $want")
      val sym = JaroWinklerImpl.jw(b, a)
      assert(math.abs(sym - want) < 1e-12, s"asymmetric on ('$a','$b')")
    }
  }

  test("codegen path agrees with the interpreted path") {
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(TF.jaroWinkler(col("a"), col("b"))).as[Double]
      .collect().toSeq
    got.zip(cases).foreach { case (g, (a, b, want)) =>
      assert(math.abs(g - want) < 1e-12, s"codegen jw('$a','$b') = $g")
    }
  }

  test("registered SQL function resolves") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
      .as[Double].head()
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
  }

  test("q254: entities are >=2-member closures labeled by their min key") {
    val rows = graft.queries.Catalog.byName("q254_entity_resolution")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairRows = graft.queries.Catalog.byName("q245_name_matching")
      .run(spark, sf).collect()
    val paired = pairRows.flatMap(r =>
      Seq(r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    var members = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(n >= 2L)
      members += n
      assert(r.getAs[Double]("price_max") >= r.getAs[Double]("price_min"))
      // the entity label is itself a matched part
      assert(paired.contains(r.getAs[Long]("entity_id")))
    }
    // closures partition exactly the matched-node set
    assert(members == paired.size.toLong)
    val ids = rows.map(_.getAs[Long]("entity_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("q257: matches carry more field agreement than unmatches") {
    val rows = graft.queries.Catalog.byName("q257_fellegi_sunter")
      .run(spark, sf).collect()
    assert(rows.map(_.getAs[String]("field")).sorted.toSeq ==
      Seq("last_tok", "len_band"))
    rows.foreach { r =>
      val m = r.getAs[Double]("m_prob"); val u = r.getAs[Double]("u_prob")
      assert(m >= 0.0 && m <= 1.0 && u >= 0.0 && u <= 1.0)
      // near-duplicate names should never agree LESS than random pairs
      // (equality allowed: sf0.001's sampled match set is tiny)
      assert(m >= u, s"${r.getAs[String]("field")}: m=$m u=$u")
      // non-negative evidence on agreement, non-positive on disagreement
      // (zero when the tiny-sf sample has m = u)
      Option(r.getAs[java.lang.Double]("w_agree"))
        .foreach(w => assert(w >= 0.0))
      Option(r.getAs[java.lang.Double]("w_disagree"))
        .foreach(w => assert(w <= 0.0))
    }
    // JW >= 0.9 names are near-identical strings: the length band must
    // separate matches from the block's random co-candidates
    val t = rows.find(_.getAs[String]("field") == "len_band").get
    assert(t.getAs[Double]("m_prob") > t.getAs[Double]("u_prob"))
  }
}
