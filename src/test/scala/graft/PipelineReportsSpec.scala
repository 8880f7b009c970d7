package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Invariant pins for the corpus-report operators added with the
  * vocabulary/centroid/padding trio (q136-q138). The DuckDB oracle
  * proves cross-engine equality; these tests pin the properties a
  * regression could silently break while still matching a co-broken
  * oracle (both sides are generated from the same SQL-twin helpers).
  */
class PipelineReportsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = Catalog.byName(name).run(spark, sf)

  test("q136: OOV rates bounded and consistent with their counts") {
    val rows = run("q136_vocab_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_instances")
      val oov = r.getAs[Long]("oov_instances")
      val types = r.getAs[Long]("n_types")
      val oovTypes = r.getAs[Long]("oov_types")
      assert(oov >= 0 && oov <= n)
      assert(oovTypes >= 0 && oovTypes <= types)
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      // the rounded rate matches its own counts
      assert(math.abs(rate - oov.toDouble / n) < 5e-7)
    }
  }

  test("q136: every source of the corpus reports") {
    val d = Tables.load(spark, sf, "documents")
    val nSources = d.select(col("source")).distinct().count()
    assert(run("q136_vocab_coverage").count() == nSources)
  }

  test("q137: one cell per unordered source pair, cosine in [-1,1]") {
    val d = Tables.load(spark, sf, "documents")
    val n = d.select(col("source")).distinct().count()
    val rows = run("q137_source_centroid_sim").collect()
    assert(rows.length == n * (n - 1) / 2)
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid_cos")
      assert(c >= -1.0 && c <= 1.0)
      // pairs are emitted lexicographically ordered, never self-paired
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("q139: funnel counts are monotone non-increasing per source") {
    val rows = run("q139_filter_funnel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val funnel = Seq("n_docs", "n_lang", "n_rep", "n_ppl", "n_final")
        .map(r.getAs[Long](_))
      assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b },
        s"funnel not monotone: $funnel")
      val rate = r.getAs[Double]("survival_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q140: skew report invariants hold for every analyzed key") {
    val rows = run("q140_key_skew_report").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nKeys = r.getAs[Long]("n_keys")
      val nRows = r.getAs[Long]("n_rows")
      val maxF = r.getAs[Long]("max_freq")
      val med = r.getAs[Double]("median_freq")
      assert(nKeys >= 1 && maxF >= 1 && nRows >= maxF)
      // median is between 1 and max; the ratio is >= 1 by definition
      assert(med >= 1.0 && med <= maxF.toDouble)
      assert(r.getAs[Double]("skew_ratio") >= 1.0)
      assert(r.getAs[String]("top_key").nonEmpty)
    }
  }

  test("q138: padding accounting is internally consistent") {
    val rows = run("q138_padding_waste").collect()
    assert(rows.nonEmpty)
    var docs = 0L
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val sumTok = r.getAs[Long]("sum_tok")
      val maxTok = r.getAs[Long]("max_tok")
      val padded = r.getAs[Long]("padded_tok")
      val waste = r.getAs[Long]("waste_tok")
      assert(padded == nDocs * maxTok)
      assert(waste == padded - sumTok && waste >= 0)
      // bucket = bit-length of max_tok in that bucket's range
      val bucket = r.getAs[Int]("bucket")
      assert(maxTok < (1L << bucket) && maxTok >= (1L << (bucket - 1)))
      docs += nDocs
    }
    // every document lands in exactly one bucket
    assert(docs == Tables.load(spark, sf, "documents").count())
  }

  test("q221: burstiness >= 1 and df <= tf for every reported word") {
    val rows = Catalog.byName("q221_burstiness").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val tf = r.getAs[Long]("tf"); val df = r.getAs[Long]("df")
      assert(df >= 1 && df <= tf)
      assert(r.getAs[Double]("burstiness") >= 1.0)
    }
  }

  test("q222: Neyman shifts budget toward high-variance sources") {
    val rows = Catalog.byName("q222_neyman_allocation").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // both allocations land within rounding of the budget
    val neyman = rows.map(_.getAs[Long]("alloc_neyman")).sum
    val prop = rows.map(_.getAs[Long]("alloc_prop")).sum
    assert(math.abs(neyman - 1000L) <= rows.length)
    assert(math.abs(prop - 1000L) <= rows.length)
    // vs proportional, Neyman over-allocates exactly the sources whose
    // sd exceeds the budget-weighted mean sd — verify the ordering
    // correlation: the max-sd source never gets less than proportional
    val bySd = rows.sortBy(-_.getAs[Double]("sd_len"))
    assert(bySd.head.getAs[Long]("alloc_neyman") >=
      bySd.head.getAs[Long]("alloc_prop") - 1)
  }

  test("q224: each attribution model's credits sum to the purchase count") {
    val ev = Tables.load(spark, sf, "events")
    val nPur = ev.filter(col("event_type") === "purchase").count()
    val rows = Catalog.byName("q224_attribution").run(spark, sf).collect()
    val byModel = rows.groupBy(_.getAs[String]("model"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    assert(byModel.keySet == Set("last_touch", "first_touch"))
    assert(byModel.values.forall(_ == nPur))
  }

  test("q225: KS is within [0,1] and the exact-rational max is attained") {
    val rows = Catalog.byName("q225_ks_length_drift").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks")
      assert(ks >= 0.0 && ks <= 1.0)
    }
    // all sources of the corpus report
    val nSources = Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources)
  }

  test("q226: cohesion invariants — connectivity bound, ordered links") {
    val rows = Catalog.byName("q226_cluster_cohesion").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      val edges = r.getAs[Long]("n_edges")
      assert(size >= 2)
      // a connected component of n nodes needs at least n-1 edges, and
      // at most n(n-1)/2 survive the (a_id < b_id) dedup
      assert(edges >= size - 1 && edges <= size * (size - 1) / 2)
      val d = r.getAs[Double]("density")
      assert(d > 0.0 && d <= 1.0)
      assert(r.getAs[Double]("weakest_link") <=
        r.getAs[Double]("mean_link") + 1e-6)
    }
  }

  test("q227: RFM segments partition the user base") {
    val nUsers = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    val rows = Catalog.byName("q227_rfm_segments").run(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("q228 normKey: case/punct/spacing mutants collide, reorders don't") {
    import graft.text.{TextFunctions => TF}
    val keys = Seq("Hello,  World!", "hello world", "HELLO WORLD.",
      "world hello", "helloworld")
      .toDF("t").select(TF.normKey(col("t")).as("k"))
      .as[String].collect()
    assert(keys(0) == keys(1) && keys(1) == keys(2)) // mutants collide
    assert(keys(3) != keys(0)) // word order preserved (unlike q27)
    assert(keys(4) != keys(0)) // spacing is significant post-collapse
  }

  test("q229: separability invariants over the label centroids") {
    val rows = Catalog.byName("q229_label_separability").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("within_d2") >= 0.0)
      assert(r.getAs[Double]("between_d2") >= 0.0)
      assert(r.getAs[Double]("separability") >= 0.0)
    }
    // every label of the table reports
    val nLabels = Tables.load(spark, sf, "embeddings")
      .select("label").distinct().count()
    assert(rows.length == nLabels)
  }

  test("q230: MAD median arithmetic matches a hand-computed fixture") {
    // source 'a': lengths 1,3,5,7,100 -> med 5, dev 4,2,0,2,95 -> MAD 2
    // outlier cutoff 4.4478*2 = 8.8956 -> only 95 exceeds -> 1 outlier
    // source 'b': lengths 10,20 -> med 15.0, dev 5,5 -> MAD 5, none out
    import org.apache.spark.sql.expressions.Window
    val fix = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 5L),
      ("a", 4L, 7L), ("a", 5L, 100L), ("b", 6L, 10L), ("b", 7L, 20L))
      .toDF("source", "doc_id", "n_chars")
    // replicate the q230 rank-median inline on the fixture
    def med(df: org.apache.spark.sql.DataFrame, v: String) = {
      val w = Window.partitionBy(col("source")).orderBy(col(v), col("doc_id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(
          Window.partitionBy(col("source"))))
        .filter(col("rn") === expr("(nn + 1) div 2") ||
          col("rn") === expr("(nn + 2) div 2"))
        .groupBy(col("source")).agg((sum(col(v)) / count(lit(1))).as("med"))
    }
    val m = med(fix.withColumn("len", col("n_chars").cast("double")), "len")
      .as[(String, Double)].collect().toMap
    assert(m("a") == 5.0 && m("b") == 15.0)
    val dev = fix.withColumn("len", col("n_chars").cast("double"))
      .join(med(fix.withColumn("len", col("n_chars").cast("double")), "len")
        .withColumnRenamed("med", "m0"), "source")
      .withColumn("dev", abs(col("len") - col("m0")))
    val mad = med(dev.select(col("source"), col("doc_id"),
      col("dev").as("len")), "len").as[(String, Double)].collect().toMap
    assert(mad("a") == 2.0 && mad("b") == 5.0)
  }

  test("q232: template groups meet the floor and stay within one kind") {
    val rows = Catalog.byName("q232_boilerplate_templates").run(spark, sf)
      .collect()
    rows.foreach { r =>
      assert(Set("prefix", "suffix")(r.getAs[String]("kind")))
      assert(r.getAs[Long]("n_docs") >= 5L)
      assert(r.getAs[Long]("n_sources") >= 1L &&
        r.getAs[Long]("n_sources") <= r.getAs[Long]("n_docs"))
    }
    // identical texts always share both affix templates: inject a
    // 5-doc clone set through the same key expressions
    import graft.text.{TextFunctions => TF}
    val clones = (1 to 5).map(i =>
        (i.toLong, "Exactly The Same Boilerplate Header! body " + i))
      .toDF("doc_id", "t")
      .select(md5(substring(TF.normText(col("t")), 1, 8)).as("k"))
      .distinct().count()
    assert(clones == 1L)
  }

  test("q234: profile rows cover the declared columns with sane bounds") {
    val rows = Catalog.byName("q234_schema_profile").run(spark, sf)
      .collect()
    assert(rows.length == 13)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("n_distinct") <= n)
      assert(r.getAs[Long]("n_null") <= n)
    }
    // key columns are unique on the synthetic tables
    val byCol = rows.map(r => (r.getAs[String]("tbl"),
      r.getAs[String]("col_name")) -> r).toMap
    Seq(("documents", "doc_id"), ("events", "event_id"),
      ("embeddings", "vec_id")).foreach { k =>
      val r = byCol(k)
      assert(r.getAs[Long]("n_distinct") == r.getAs[Long]("n_rows"), s"$k")
    }
  }

  test("q235: every expectation passes on the pristine synthetic drop") {
    val rows = Catalog.byName("q235_expectations").run(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"${r.getAs[String]("check")}: ${r.getAs[Long]("n_violations")}")
      assert(r.getAs[Long]("n_checked") > 0)
    }
  }

  test("q238: information-theoretic bounds hold (0 <= MI <= min marginal entropy; NMI in [0,1])") {
    val r = Catalog.byName("q238_field_mi").run(spark, sf).collect().head
    val mi = r.getAs[Double]("mi")
    val hx = r.getAs[Double]("h_source")
    val hy = r.getAs[Double]("h_lang")
    val nmi = r.getAs[Double]("nmi")
    assert(hx > 0.0 && hy > 0.0) // both fields have >1 level in testdata
    assert(mi >= -1e-9, s"mi=$mi")
    assert(mi <= math.min(hx, hy) + 1e-6, s"mi=$mi hx=$hx hy=$hy")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, s"nmi=$nmi")
    assert(r.getAs[Long]("n_rows") > 0 && r.getAs[Long]("n_cells") > 0)
  }

  test("q240: KM curve is a proper survival function") {
    val rows = Catalog.byName("q240_km_retention").run(spark, sf)
      .orderBy(col("duration_min")).collect()
    assert(rows.nonEmpty)
    var prevS = 1.0
    var prevRisk = Long.MaxValue
    rows.foreach { r =>
      val s = r.getAs[Double]("survival")
      val n = r.getAs[Long]("n_risk")
      val d = r.getAs[Long]("n_ended")
      assert(d >= 1 && d <= n)
      assert(s >= -1e-9 && s <= prevS + 1e-9, s"not monotone: $s after $prevS")
      assert(n <= prevRisk, s"n_risk grew: $n after $prevRisk")
      // each step multiplies by exactly (n-d)/n
      val expect = prevS * (n - d).toDouble / n
      assert(math.abs(s - expect) < 5e-6, s"step mismatch: $s vs $expect")
      prevS = s; prevRisk = n
    }
  }

  test("q248: bootstrap CI brackets the point estimate per source") {
    val rows = Catalog.byName("q248_poisson_bootstrap").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_len")
      val lo = r.getAs[Double]("ci_lo")
      val hi = r.getAs[Double]("ci_hi")
      assert(r.getAs[Long]("n_replicates") == 64L)
      assert(lo <= hi, s"${r.getAs[String]("source")}: lo=$lo hi=$hi")
      assert(lo <= m && m <= hi,
        s"${r.getAs[String]("source")}: CI [$lo,$hi] misses point $m")
      assert(hi - lo > 0.0, "degenerate interval")
    }
  }

  test("q223: chi2 nonnegative and peak cell in the hour-of-week range") {
    val rows = Catalog.byName("q223_seasonality_chi2").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      val pc = r.getAs[Long]("peak_cell")
      assert(pc >= 0 && pc < 168)
      assert(r.getAs[Long]("peak_count") >= 1)
    }
  }
}
