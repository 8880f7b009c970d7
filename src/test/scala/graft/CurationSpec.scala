package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dsir
import graft.text.Bm25
import graft.graph.PageRank

/** Pins the curation-family semantics on hand-computable fixtures:
  * DSIR importance orders target-like docs first, BM25 rewards tf and
  * rare terms, PageRank matches the closed-form damped values, and the
  * quantized iteration is deterministic across re-runs. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("dsir: candidates sharing the target's vocabulary outscore the rest") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", "t"),   // target slice
      (2L, "alpha beta beta alpha", "t"),
      (3L, "alpha beta alpha gamma", "c"),  // target-like candidate
      (4L, "delta epsilon zeta eta", "c"),  // off-target candidate
      (5L, "alpha alpha alpha alpha", "c")
    ).toDF("doc_id", "text", "source")
    val w = Dsir.importance(docs, col("source") === "t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(3) > w(4), s"target-like doc must outrank off-target: $w")
    assert(w(5) > w(4), s"pure target vocab must outrank off-target: $w")
    // every doc's weight is a finite double (smoothing covers unseen buckets)
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("bm25: higher tf wins within a term; rare terms outweigh common") {
    val docs = Seq(
      (1L, "spark spark spark noise noise"),
      (2L, "spark noise noise noise noise"),
      (3L, "noise noise noise noise noise"),
      (4L, "rare noise noise noise noise"),
      (5L, "spark noise rare filler filler")
    ).toDF("doc_id", "text")
    val s = Bm25.score(docs, Seq("spark", "rare"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = s.map(x => x._1 -> x._3).toMap
    assert(!byDoc.contains(3L), "doc matching no term must be absent")
    assert(byDoc(1L) > byDoc(2L), "tf=3 must beat tf=1 for the same term")
    // 'rare' (df=2) has higher idf than 'spark' (df=3): doc 4 (rare only)
    // must outscore doc 2 (spark only) at equal tf and dl
    assert(byDoc(4L) > byDoc(2L), s"rare-term doc must outscore: $byDoc")
    // doc 5 hits both terms
    assert(s.find(_._1 == 5L).get._2 == 2L)
  }

  test("pagerank: closed-form damped values on a 3-node star, " +
    "deterministic across re-runs") {
    val edges = Seq(("a", "b"), ("c", "b")).toDF("from_id", "to_id")
    def run() = PageRank.ranks(edges, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r = run()
    // sources never gain rank: the (1-d) floor every iteration
    val floor = 1.0 - PageRank.Damping
    assert(r("a") == floor && r("c") == floor)
    // b: iter1 = .15+.85*2 = 1.85; iter2 onward = .15+.85*(.15+.15) = .405
    assert(math.abs(r("b") - 0.405) < 1e-6, s"b=${r("b")}")
    assert(run() == r, "quantized iteration must be bit-stable")
  }

  test("pagerank: pre-materialized edge index + node set reproduce the " +
    "per-call frames bit-for-bit") {
    // the session-artifact path (KGraph.rankEdgesMaterialized /
    // nodeSetMaterialized, round-12 verdict item 5) must be a pure
    // caching change: same ranks, including parallel-edge multiplicity
    // (a->b twice = outdeg 3 on a, double contribution to b)
    import graft.engine.Lineage.LineageOps
    import org.apache.spark.sql.functions.col
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c"), ("c", "b"))
      .toDF("from_id", "to_id")
    val plain = PageRank.ranks(edges, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val idx = PageRank.edgeIndex(edges).truncateLineage()
    val ns = PageRank.nodes(edges).repartition(col("node_id"))
      .truncateLineage()
    val viaIndex = PageRank.ranks(edges, 3, index = Some(idx),
        nodeSet = Some(ns)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaIndex == plain)
    val seeds = Seq("a").toDF("node_id")
    val pPlain = PageRank.personalizedRanks(edges, seeds, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pIdx = PageRank.personalizedRanks(edges, seeds, 3,
        index = Some(idx), nodeSet = Some(ns)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pIdx == pPlain)
  }

  test("kmeans: separable clusters resolve, assignment is bit-stable") {
    // two tight groups on opposite corners of the plane; seeds (ids 0,1)
    // land one per group, so 2 iterations must separate them exactly
    val vs = Seq(
      (0L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(0.05f, 0.05f)),
      (1L, Array(5.0f, 5.1f)), (4L, Array(5.1f, 5.0f)),
      (5L, Array(4.9f, 5.2f))
    ).toDF("vec_id", "embedding")
    def run() = graft.semantic.KMeans.fit(vs, "vec_id", "embedding", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a(0) == a(2) && a(2) == a(3), s"low corner must cohere: $a")
    assert(a(1) == a(4) && a(4) == a(5), s"high corner must cohere: $a")
    assert(a(0) != a(1), "the two corners must be distinct clusters")
    assert(run() == a, "quantized Lloyd must be bit-stable across runs")
  }

  test("bpe: canonical fixture learns the paper's merges, bit-stable") {
    // Sennrich et al. 2016 §3.2 example: low x5, lower x2, newest x6,
    // widest x3. (e,s)=(s,t)=(t,</w>)=9 tie → lexicographic picks
    // (e,s), then (es,t), (est,</w>), then (l,o)=(lo,w)=7 → (l,o), (lo,w)
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    ).toDF("text")
    def run() = graft.text.BpeTrainer.train(docs, "text", 5)
    val m = run()
    assert(m.map(x => (x._2, x._3)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")),
      s"unexpected merges: $m")
    assert(m.map(_._4) == Seq(9L, 9L, 9L, 7L, 7L))
    assert(run() == m, "training must be bit-stable across runs")
  }

  test("bpe: batched training equals one-merge-at-a-time training") {
    // long-tail census (distinct counts, disjoint symbols) where the
    // batch rule fires, vs batchTop=1 which forces the sequential path;
    // the learned lists must be identical, counts included
    val docs = Seq((
      Seq.fill(9)("ab") ++ Seq.fill(7)("cd") ++ Seq.fill(5)("ef") ++
        Seq.fill(3)("gh") ++ Seq.fill(2)("abcd")).mkString(" ")
    ).toDF("text")
    val batched = graft.text.BpeTrainer.train(docs, "text", 6)
    val sequential = graft.text.BpeTrainer.train(docs, "text", 6, batchTop = 1)
    assert(batched == sequential,
      s"batched $batched != sequential $sequential")
  }

  test("bpe: encode applies fixture merges leftmost-first per rank") {
    import graft.text.{BpeTrainer => B}
    val enc = Seq("the", "then", "and", "thethe")
      .toDF("word")
      .select(col("word"),
        B.symbolCount(B.encodeSymbols(col("word"),
          Seq("t" -> "h", "th" -> "e", "the" -> B.EndOfWord))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "the" -> [the</w>] (1); "then" -> [the, n, </w>] (3);
    // "and" -> [a, n, d, </w>] (4); "thethe" -> [the, the</w>] (2)
    assert(enc == Map("the" -> 1L, "then" -> 3L, "and" -> 4L,
      "thethe" -> 2L), s"got $enc")
  }

  test("bpe: encoding under a trained merge list reproduces train's folds") {
    // encode with the merges train() itself learned on the Sennrich
    // fixture ((e,s),(es,t),(est,</w>),(l,o),(lo,w)): each word must
    // collapse exactly as training's merge folds collapsed it
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    ).toDF("text")
    val merges = graft.text.BpeTrainer.train(docs, "text", 5)
      .map(m => (m._2, m._3))
    import graft.text.{BpeTrainer => B}
    val counts = Seq("low", "lower", "newest", "widest").toDF("word")
      .select(col("word"),
        B.symbolCount(B.encodeSymbols(col("word"), merges)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low -> [low, </w>]? (l,o)+(lo,w) give [low], then </w> unmerged;
    // lower -> [low, e, r, </w>]; newest -> [n, e, w, est</w>];
    // widest -> [w, i, d, est</w>]
    assert(counts == Map("low" -> 2L, "lower" -> 4L, "newest" -> 4L,
      "widest" -> 4L), s"got $counts")
  }

  test("bpe: leftmost-first application on overlapping runs") {
    val merged = spark.range(1)
      .select(graft.text.BpeTrainer.applyMerge(
        split(lit("a a a"), " "), "a", "a").as("s"))
      .collect()(0).getSeq[String](0)
    assert(merged == Seq("aa", "a"), s"got $merged")
  }

  test("pca: power iteration finds the elongated axis, bit-stable") {
    import graft.semantic.Pca
    // cloud stretched along (1,1)/√2 with small orthogonal noise: the
    // dominant direction must align with the diagonal and explain most
    // of the variance
    val vs = Seq(
      (0L, Array(3.0f, 3.1f)), (1L, Array(-3.0f, -2.9f)),
      (2L, Array(2.0f, 1.9f)), (3L, Array(-2.0f, -2.1f)),
      (4L, Array(1.0f, 1.1f)), (5L, Array(-1.0f, -0.9f))
    ).toDF("vec_id", "embedding")
    val mu = Pca.meanVector(vs, "embedding")
    def direction() = Pca.topDirection(vs, "embedding", mu, 2, 2)
      .collect()(0).getSeq[Double](0)
    val v = direction()
    val diag = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(v(0)) - diag) < 0.05 &&
      math.abs(math.abs(v(1)) - diag) < 0.05, s"direction $v not diagonal")
    assert(v(0) * v(1) > 0, "components must share a sign on this cloud")
    val vFrame = Pca.topDirection(vs, "embedding", mu, 2, 2)
    val share = Pca.varianceShare(vs, "embedding", mu, vFrame)
      .collect()(0).getDouble(1)
    assert(share > 0.95, s"diagonal must dominate the variance: $share")
    assert(direction() == v, "power iteration must be bit-stable")
  }

  test("unimax: capped prefix takes capacity, rest shares leftover evenly") {
    // caps (E=4): a=40, b=400, c=4000; budget = floor(0.6*1110) = 666.
    // sorted by cap: a capped (40*3=120 <= 666), b not (400*2=800 >
    // 666-40=626), c not -> leftover (666-40)/2 = 313 each.
    val st = Seq(("a", 10L), ("b", 100L), ("c", 1000L))
      .toDF("source", "n_tok")
    val got = graft.pipeline.Unimax.alloc(st, 4L, 3L, 5L)
      .select("source", "cap", "alloc")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((40L, 40.0)))
    assert(got("b") == ((400L, 313.0)))
    assert(got("c") == ((4000L, 313.0)))
  }

  test("unimax: budget above total capacity caps every source") {
    val st = Seq(("a", 10L), ("b", 20L)).toDF("source", "n_tok")
    // budget = floor(30 * 9 / 1) = 270 >= caps 40+80
    val got = graft.pipeline.Unimax.alloc(st, 4L, 9L, 1L)
      .select("source", "alloc").as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 40.0, "b" -> 80.0))
  }

  test("semdedup: flags higher-id twin in-cluster, misses cross-cluster twin") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), // twins, same cluster
      (3L, Seq(0.0f, 1.0f)),                        // distinct, same cluster
      (4L, Seq(1.0f, 0.0f))                         // twin of 1, OTHER cluster
    ).toDF("vec_id", "embedding")
    val asg = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L))
      .toDF("vec_id", "cid")
    val got = graft.dedup.Dedup
      .semanticDuplicates(asg, vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
    // only the in-cluster twin's higher id flags; the cross-cluster twin
    // is the method's documented recall trade
    assert(got == Set((0L, 2L)))
  }

  test("incremental semdedup equals the full sweep's batch slice") {
    import graft.dedup.Dedup
    import graft.semantic.KMeans
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cid", "cent")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.95, 0.05)), (3L, Seq(0.6, 0.8))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (7L, Seq(1.0, 0.0)),   // twin of corpus 1 -> vs_corpus
      (8L, Seq(0.1, 0.9)),   // no mate within tau
      (9L, Seq(0.05, 0.95))  // twin of batch 8 only -> batch-internal
    ).toDF("vec_id", "embedding")
    val asym = Dedup.semanticDuplicatesAgainst(batch, corpus, cents,
        "vec_id", "embedding", 0.9)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(asym.map(_._2) == Set(7L, 9L))
    assert(asym.find(_._2 == 7L).get._3, "7 duplicates a CORPUS vector")
    assert(!asym.find(_._2 == 9L).get._3, "9 duplicates only a batch mate")
    // append-only parity: the asymmetric result IS the full sweep
    // restricted to batch ids (batch ids all above corpus ids)
    val all = corpus.unionByName(batch)
    val full = Dedup.semanticDuplicates(
        KMeans.assign(all, cents, "vec_id", "embedding")
          .select(col("cid"), col("vec_id")),
        all, "vec_id", "embedding", 0.9)
      .as[(Long, Long)].collect().toSet
      .filter(_._2 >= 7L)
    assert(full == asym.map(t => (t._1, t._2)))
  }

  test("quality classifier learns to separate the reference slice") {
    import graft.pipeline.QualityClassifier
    // synthetic feature frame, bypassing hashing: ref docs (y=1) use
    // bucket 0 exclusively, the rest bucket 1 — GD must push w[0] up
    // and w[1] down, symmetric so the bias stays 0
    val feats = Seq(
      (1L, 1L, 0L, 3L, 3L), (2L, 1L, 0L, 3L, 3L),
      (3L, 0L, 1L, 3L, 3L), (4L, 0L, 1L, 3L, 3L)
    ).toDF("doc_id", "y", "b", "cnt", "n_tok")
    val (w, bias) = QualityClassifier.train(feats, buckets = 2,
      iterations = 3, lr = 8L)
    val sc = QualityClassifier.scores(feats, w, bias)
      .as[(Long, Long)].collect().toMap
    assert(sc(1L) == sc(2L) && sc(3L) == sc(4L))
    assert(sc(1L) > 500000L && sc(3L) < 500000L,
      s"reference docs must score above the rest: $sc")
    // symmetric fixture: scores mirror around 0.5 and bias stays 0
    assert(sc(1L) + sc(3L) == 1000000L)
    assert(bias.as[Long].head() == 0L)
    // bit-stability: a re-train lands on identical weights
    val (w2, _) = QualityClassifier.train(feats, buckets = 2,
      iterations = 3, lr = 8L)
    assert(w.as[(Long, Long)].collect().toSet ==
      w2.as[(Long, Long)].collect().toSet)
  }

  test("evaluation: hand-computed AUC with ties and 0.5-threshold " +
      "confusion metrics") {
    import graft.pipeline.Evaluation
    // np=3, nn=3; strict positive-over-negative pairs: 3+3+2, one tie
    // at 500000 counting 1/2 -> U = 8.5, AUC = 8.5/9 = 0.944444
    val scored = Seq(
      (900000L, 1L), (700000L, 1L), (500000L, 1L),
      (500000L, 0L), (300000L, 0L), (100000L, 0L)
    ).toDF("score_micro", "y")
    val m = Evaluation.binaryMetrics(scored)
      .as[(String, Double)].collect().toMap
    assert(m("auc") == 0.944444, s"AUC with a half-counted tie: $m")
    assert(m("n_pos") == 3.0 && m("n_neg") == 3.0)
    // predicted positive at >= 500000: tp=3, fp=1
    assert(m("prec_05") == 0.75 && m("rec_05") == 1.0)
    assert(m("f1_05") == 0.857143, s"f1 = 6/7 rounded half-up: $m")
    assert(m("acc_05") == 0.833333, s"acc = 5/6 rounded half-up: $m")
  }

  test("evaluation: perfect separation scores AUC 1; one-class input " +
      "reports 0 for undefined ratios") {
    import graft.pipeline.Evaluation
    val perfect = Seq((900000L, 1L), (800000L, 1L), (200000L, 0L))
      .toDF("score_micro", "y")
    val mp = Evaluation.binaryMetrics(perfect)
      .as[(String, Double)].collect().toMap
    assert(mp("auc") == 1.0 && mp("prec_05") == 1.0 && mp("rec_05") == 1.0)
    val oneClass = Seq((900000L, 1L), (100000L, 1L))
      .toDF("score_micro", "y")
    val mo = Evaluation.binaryMetrics(oneClass)
      .as[(String, Double)].collect().toMap
    assert(mo("auc") == 0.0 && mo("n_neg") == 0.0,
      s"no negatives -> AUC undefined, reported 0: $mo")
    assert(mo("rec_05") == 0.5, s"recall still defined (tp=1 of np=2): $mo")
  }

  test("doremi mixture: weights renormalize and reward excess-loss domains") {
    val rows = graft.queries.Catalog.byName("q178_doremi_mixture")
      .run(spark, sf)
      .select(col("source"), col("excess_nll"), col("base_share"),
        col("weight"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4,
      s"weights must renormalize to ~1: ${rows.map(_._4).sum}")
    // the multiplier is monotone in excess: the max-excess domain's
    // weight/share uplift must be the largest
    val uplift = rows.map(r => (r._2, r._4 / r._3))
    val maxExcess = uplift.maxBy(_._1)
    assert(maxExcess._2 == uplift.map(_._2).max,
      s"max-excess domain must get the max uplift: $uplift")
    // zero-excess domains all share the identical (multiplier-1) uplift
    val flat = uplift.filter(_._1 == 0.0).map(_._2)
    assert(flat.nonEmpty && math.abs(flat.max - flat.min) < 1e-4)
  }

  test("silhouette: covers every vector, stays in [0,1], borders bounded") {
    val rows = graft.queries.Catalog.byName("q179_silhouette")
      .run(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_._1).sum == nVec,
      "every vector lands in exactly one cluster report row")
    assert(rows.forall { case (n, m, b) => m >= 0.0 && m <= 1.0 && b <= n },
      s"silhouette means must be in [0,1], borders <= size: ${rows.toSeq}")
  }

  test("weighted pagerank: uniform confidence reduces to the uniform path") {
    import org.apache.spark.sql.functions.lit
    val edges = Seq(("a", "b"), ("a", "c"), ("c", "b"))
      .toDF("from_id", "to_id")
    val uni = PageRank.ranks(edges, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wUni = PageRank.weightedRanks(
        edges.withColumn("confidence", lit(0.8)), 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // equal weights cancel in w/W — identical quantized ranks
    assert(wUni == uni, s"$wUni vs $uni")
    // unequal weights shift mass toward the heavy edge: a splits 0.9/0.1
    // between b and c, so b must outrank the uniform run's b
    val skew = Seq(("a", "b", 0.9), ("a", "c", 0.1), ("c", "b", 0.5))
      .toDF("from_id", "to_id", "confidence")
    val w = PageRank.weightedRanks(skew, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("b") > uni("b") && w("c") < uni("c"), s"$w vs $uni")
  }

  test("q237: correlations bounded; len-toks strongly positive") {
    val rows = graft.queries.Catalog.byName("q237_feature_correlation")
      .run(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9,
        s"${r.getAs[String]("feat_a")}-${r.getAs[String]("feat_b")}: $v")
    }
    // char count and whitespace token count are near-duplicates of the
    // same length signal — the audit MUST flag them as redundant
    val lt = rows.find(r => r.getAs[String]("feat_a") == "len" &&
      r.getAs[String]("feat_b") == "toks").get.getAs[Double]("r")
    assert(lt > 0.9, s"len-toks r=$lt")
  }

  test("q246: richness estimators bound observed richness from above") {
    val rows = graft.queries.Catalog.byName("q246_vocab_richness")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("n_types")
      assert(r.getAs[Long]("s_rare") + r.getAs[Long]("s_abund") == v)
      val chao1 = r.getAs[Double]("chao1")
      assert(chao1 >= v - 1e-6, s"chao1 $chao1 < V $v")
      // ACE >= S_abund + S_rare / C >= V whenever the coverage is defined
      Option(r.getAs[java.lang.Double]("ace")).foreach { ace =>
        assert(ace >= v - 1e-6, s"ace $ace < V $v")
        assert(!ace.isNaN && !ace.isInfinite)
      }
    }
  }

  test("pagerank: rank mass concentrates along the edge direction") {
    // the KGraph points orders→customers→nations→regions: downstream
    // node types must accumulate more rank on average, and the single
    // highest-ranked node must be a region sink
    val byType = PageRank.ranks(graft.graph.KGraph.materialized(spark, sf), 3)
      .groupBy(substring(col("node_id"), 1, 1).as("t"))
      .agg(avg(col("rank")).as("m"), max(col("rank")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(byType("r")._1 > byType("n")._1 && byType("n")._1 > byType("c")._1,
      s"rank must flow downstream: $byType")
    assert(byType("r")._2 == byType.values.map(_._2).max,
      "a region sink must hold the global maximum")
  }

  test("q260: influence is the exact ce delta and sources move the model") {
    val rows = graft.queries.Catalog.byName("q260_loo_influence")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n_val_bigrams")).distinct
    assert(ns.length == 1 && ns.head > 0)
    rows.foreach { r =>
      val ceF = r.getAs[Double]("ce_full")
      val ceL = r.getAs[Double]("ce_loo")
      assert(ceF > 0 && ceL > 0)
      assert(math.abs(r.getAs[Double]("influence") - (ceL - ceF)) < 1e-6)
    }
    // removing a source must move cross-entropy somewhere
    assert(rows.exists(r => math.abs(r.getAs[Double]("influence")) > 0))
  }

  test("q279: ROC cells are monotone in the threshold; J = TPR - FPR") {
    val rows = graft.queries.Catalog.byName("q279_roc_points")
      .run(spark, sf).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == 9)
    var prevTp = Long.MaxValue; var prevFp = Long.MaxValue
    rows.foreach { r =>
      val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
      // raising the threshold can only shrink the predicted-positive set
      assert(tp <= prevTp && fp <= prevFp); prevTp = tp; prevFp = fp
      val tpr = r.getAs[Double]("tpr"); val fpr = r.getAs[Double]("fpr")
      assert(tpr >= 0 && tpr <= 1 && fpr >= 0 && fpr <= 1)
      assert(math.abs(r.getAs[Double]("youden_j") - (tpr - fpr)) < 2e-6)
    }
  }

  test("q280: AP is bounded, and the trained ranking beats random") {
    val r = graft.queries.Catalog.byName("q280_average_precision")
      .run(spark, sf).collect().head
    val ap = r.getAs[Double]("average_precision")
    val base = r.getAs[Double]("random_baseline")
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    assert(ap > 0.0 && ap <= 1.0 && base > 0.0 && base < 1.0)
    // the q173 classifier separates src0 clearly at this sf; a ranking
    // no better than random here would mean the scorer broke
    assert(ap > base, s"AP $ap should beat the random baseline $base")
  }
}
