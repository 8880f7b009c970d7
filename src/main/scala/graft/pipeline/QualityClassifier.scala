package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Lineage.LineageOps

/** Linear quality classifier over hashed bag-of-words features — the
  * fasttext-shaped filter every public pretraining pipeline runs
  * (CCNet's LM-adjacent filter, the GPT-3/PaLM "looks like the
  * high-quality reference" classifier; builder mandate, no reference
  * counterpart). A logistic regression is trained by FIXED-count
  * batch gradient descent to separate a reference slice (y=1, e.g. a
  * trusted source) from the rest, then every document is scored with
  * the learned weights; downstream selection thresholds or
  * importance-samples on that score (DSIR's discriminative sibling).
  *
  * Scale shape: features are `buckets` hashed unigram frequencies
  * (portable md5 buckets, the q145 DSIR machinery), so every weight /
  * gradient table is FEATURE-bounded (≤ buckets rows, broadcast), and
  * each GD iteration is two linear passes over the (doc, bucket, cnt)
  * frame: one margin aggregate keyed by doc, one gradient aggregate
  * keyed by bucket. Nothing pairs documents with documents; iteration
  * count is a compile-time-small constant.
  *
  * Determinism contract (the established micro-unit pattern): weights
  * and the bias live as micro-unit BIGINTS; every per-row double term
  * (w·x products, the sigmoid) is quantized to a micro-unit bigint the
  * moment it is computed, so all sums are exact integer sums and every
  * iteration's weights are bit-identical cross-engine. The sigmoid's
  * exp() is quantized immediately (round absorbs libm ulp differences,
  * the q163/q164 ln precedent). Negative halves round away from zero
  * identically on both engines.
  */
object QualityClassifier {

  val DefaultBuckets = 64
  val DefaultIterations = 3
  val DefaultLr = 8L // integer learning rate, micro-exact updates

  /** Per-document hashed features: (doc_id, y, b, cnt, n_tok) — one
    * row per (doc, bucket) with cnt > 0. `isRef` marks the y=1 slice. */
  def features(docs: DataFrame, isRef: Column,
      buckets: Int = DefaultBuckets): DataFrame =
    Dsir.instances(docs, buckets)
      .withColumn("y", when(isRef, 1L).otherwise(0L))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .join(Dsir.instances(docs, buckets)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok")),
        Seq("doc_id"))

  /** micro-unit margin contribution of one (bucket, cnt) feature row
    * under micro-int weight `wi`: round(wi · cnt / n_tok). */
  private def termQ(wi: Column, cnt: Column, nTok: Column): Column =
    round(wi * cnt * lit(1.0) / nTok, 0).cast("long")

  /** round-half-away-from-zero on the driver — the semantics Spark's
    * `round` and DuckDB's `round` share (scala's math.round rounds
    * -2.5 UP to -2, which would diverge from both engines). */
  private def rnd(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Trained state after `iterations` GD steps: (weights(b, wi),
    * bias 1-row frame (bi)) — both micro-unit bigints.
    *
    * Gradients are CLASS-BALANCED (each document's error scaled by
    * nd / (2·n_class) — the standard reweighting for the heavily
    * imbalanced reference-vs-rest split, where an unbalanced fit just
    * learns the base rate into the bias and every score collapses to
    * the prior): the scaled error is micro-quantized before the
    * gradient sums, keeping the exact-integer contract.
    *
    * The model state (buckets+1 micro-unit longs) lives on the DRIVER
    * between steps and enters each pass as a literal array — the
    * documented bounded-collect pattern (state is feature-bounded,
    * never corpus-bounded), so a GD step is exactly two linear passes
    * (margin/error aggregate, gradient aggregate) with no per-step
    * broadcast jobs; IterationShapeSpec pins the per-step stage count. */
  def train(feats: DataFrame, buckets: Int = DefaultBuckets,
      iterations: Int = DefaultIterations, lr: Long = DefaultLr)
      : (DataFrame, DataFrame) = {
    val spark = feats.sparkSession
    import spark.implicits._
    // the label frame and its class totals are loop-invariant —
    // materialize once; the totals are 3 bounded scalars
    val f = feats.truncateLineage()
    val ys = f.select(col("doc_id"), col("y")).distinct().truncateLineage()
    val cls = ys.groupBy(col("y")).agg(count(lit(1)).as("ny"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nd = cls.values.sum
    // absent-class guard: the literal for a class with zero members is
    // never evaluated at runtime (no row takes that branch) — max(1)
    // only keeps the eager expression build total
    val nPos = cls.getOrElse(1L, 1L).max(1L)
    val nNeg = cls.getOrElse(0L, 1L).max(1L)
    val wArr = Array.fill(buckets)(0L)
    var bi = 0L
    for (_ <- 1 to iterations) {
      val wLit = typedLit(wArr.toSeq)
      val margins = f
        .groupBy(col("doc_id"))
        .agg(sum(termQ(element_at(wLit, (col("b") + 1).cast("int")),
          col("cnt"), col("n_tok"))).as("mq"))
      val errs = margins
        .join(ys, Seq("doc_id"))
        .select(col("doc_id"),
          round((round(lit(1e6) / (lit(1.0) +
              exp(-(col("mq") + lit(bi)) / lit(1e6))), 0).cast("long") -
            col("y") * lit(1000000L)) * lit(nd) * lit(1.0) /
            (lit(2L) * when(col("y") === 1L, lit(nPos))
              .otherwise(lit(nNeg))), 0)
            .cast("long").as("err"))
        .truncateLineage()
      val grads = f.join(errs, Seq("doc_id"))
        .groupBy(col("b"))
        .agg(sum(termQ(col("err"), col("cnt"), col("n_tok"))).as("gq"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val errSum = errs.agg(sum(col("err"))).head().getLong(0)
      for (b <- 0 until buckets)
        wArr(b) -= rnd(lr * grads.getOrElse(b.toLong, 0L) * 1.0 / nd)
      bi -= rnd(lr * errSum * 1.0 / nd)
    }
    ((0 until buckets).map(b => (b.toLong, wArr(b))).toDF("b", "wi"),
      Seq(bi).toDF("bi"))
  }

  /** Micro-quantized sigmoid scores under (weights, bias):
    * (doc_id, score_micro) with score_micro = round(σ(margin)·1e6). */
  def scores(feats: DataFrame, weights: DataFrame, bias: DataFrame)
      : DataFrame =
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(termQ(col("wi"), col("cnt"), col("n_tok"))).as("mq"))
      .crossJoin(broadcast(bias))
      .select(col("doc_id"),
        round(lit(1e6) / (lit(1.0) +
          exp(-(col("mq") + col("bi")) / lit(1e6))), 0)
          .cast("long").as("score_micro"))

  /** DuckDB oracle twin: CTE chain over `documents` ending in
    * `qscore(doc_id, score_micro)` — the same micro-unit GD, iteration
    * for iteration. */
  object sql {
    def trainCtes(ref: String, buckets: Int = DefaultBuckets,
        iterations: Int = DefaultIterations, lr: Long = DefaultLr)
        : String = {
      val bucket = Sampling.sql.hashBucket("l[i]", buckets)
      val base =
        s"""qtoks AS (
           |  SELECT doc_id, source, string_split(text, ' ') AS l
           |  FROM documents),
           |qinst AS (
           |  SELECT doc_id, source, $bucket AS b
           |  FROM qtoks, unnest(range(1, len(l) + 1)) r(i)),
           |qntok AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok
           |  FROM qinst GROUP BY 1),
           |qfeat AS (
           |  SELECT f.doc_id, f.y, f.b, f.cnt, n.n_tok FROM (
           |    SELECT doc_id,
           |      CASE WHEN source = '$ref' THEN 1 ELSE 0 END AS y,
           |      b, CAST(count(*) AS BIGINT) AS cnt
           |    FROM qinst GROUP BY 1, 2, 3) f
           |  JOIN qntok n USING (doc_id)),
           |qy AS (SELECT DISTINCT doc_id, y FROM qfeat),
           |qnd AS (
           |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
           |  FROM qfeat),
           |qcls AS (
           |  SELECT y, CAST(count(*) AS BIGINT) AS ny FROM qy GROUP BY 1),
           |qw0 AS (
           |  SELECT CAST(b AS BIGINT) AS b, CAST(0 AS BIGINT) AS wi
           |  FROM range(0, $buckets) t(b)),
           |qb0 AS (SELECT CAST(0 AS BIGINT) AS bi)""".stripMargin
      def margin(i: Int) =
        s"""  SELECT f.doc_id, bb.bi + CAST(COALESCE(sum(
           |      CAST(round(w.wi * f.cnt * 1.0 / f.n_tok) AS BIGINT)), 0)
           |    AS BIGINT) AS mq
           |  FROM qfeat f JOIN qw$i w USING (b) CROSS JOIN qb$i bb
           |  GROUP BY f.doc_id, bb.bi""".stripMargin
      val iters = (1 to iterations).map { i =>
        s"""qm$i AS (
           |${margin(i - 1)}),
           |qe$i AS (
           |  SELECT m.doc_id,
           |    CAST(round((CAST(round(1e6 / (1.0 + exp(-(m.mq / 1e6))))
           |        AS BIGINT) - y.y * 1000000) *
           |      n.nd * 1.0 / (2 * c.ny)) AS BIGINT) AS err
           |  FROM qm$i m
           |  JOIN qy y USING (doc_id)
           |  JOIN qcls c USING (y)
           |  CROSS JOIN qnd n),
           |qg$i AS (
           |  SELECT f.b, CAST(sum(
           |      CAST(round(e.err * f.cnt * 1.0 / f.n_tok) AS BIGINT))
           |    AS BIGINT) AS gq
           |  FROM qfeat f JOIN qe$i e USING (doc_id) GROUP BY 1),
           |qw$i AS (
           |  SELECT w.b, w.wi -
           |    CAST(round($lr * COALESCE(g.gq, 0) * 1.0 / n.nd) AS BIGINT)
           |      AS wi
           |  FROM qw${i - 1} w LEFT JOIN qg$i g USING (b) CROSS JOIN qnd n),
           |qb$i AS (
           |  SELECT bb.bi -
           |    CAST(round($lr * es.s * 1.0 / n.nd) AS BIGINT) AS bi
           |  FROM qb${i - 1} bb
           |  CROSS JOIN (SELECT CAST(COALESCE(sum(err), 0) AS BIGINT) AS s
           |              FROM qe$i) es
           |  CROSS JOIN qnd n)""".stripMargin
      }
      val fin =
        s"""qmF AS (
           |${margin(iterations)}),
           |qscore AS (
           |  SELECT doc_id,
           |    CAST(round(1e6 / (1.0 + exp(-(mq / 1e6)))) AS BIGINT)
           |      AS score_micro
           |  FROM qmF)""".stripMargin
      (base +: iters :+ fin).mkString(",\n")
    }
  }
}
