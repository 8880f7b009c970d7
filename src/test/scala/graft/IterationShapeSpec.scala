package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import graft.graph.PageRank
import graft.queries.Catalog

/** Per-iteration plan-shape pins for the iterative heavy hitters
  * (round-7 verdict item 8). PlanShapeSpec guards whole-plan
  * properties; these two queries additionally promise a per-ITERATION
  * shape in their scaladocs — q147 "one hash join + one keyed sum per
  * iteration", q149 "one k-row centroid broadcast per Lloyd round" —
  * which a lineage edit could silently double without tripping any
  * whole-plan guard. This spec pins both executable facts.
  */
class IterationShapeSpec extends SparkSpec {
  import spark.implicits._

  /** Number of stages Spark actually submits while `body` runs —
    * lineage truncation hides per-iteration work from the final plan,
    * so the honest per-iteration measure is executed stages, not plan
    * text. */
  private def submittedStages(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // the listener bus is async and private[spark]; poll until the
      // count stops moving instead of waiting on the bus directly
      var prev = -1
      var same = 0
      while (same < 3) {
        Thread.sleep(200)
        val c = counter.get()
        if (c == prev) same += 1 else { same = 0; prev = c }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    counter.get()
  }

  private lazy val prEdges = {
    // 40-node, 3-regular-ish ring so every stage family (join, agg,
    // checkpoint) is exercised with real shuffles
    val n = 40
    (0 until n).flatMap(i => Seq(
      (f"n$i%02d", f"n${(i + 1) % n}%02d"),
      (f"n$i%02d", f"n${(i + 7) % n}%02d")))
      .toDF("from_id", "to_id")
      .localCheckpoint()
  }

  test("q147 pagerank: stage count grows by a pinned per-iteration delta") {
    // warm once so one-time costs (input materialization) don't skew
    PageRank.ranks(prEdges, 1).count()
    val s3 = submittedStages { PageRank.ranks(prEdges, 3).count() }
    val s4 = submittedStages { PageRank.ranks(prEdges, 4).count() }
    val delta = s4 - s3
    info(s"stages: 3 iters=$s3, 4 iters=$s4, per-iteration delta=$delta")
    // one hash join (ranks onto the pre-partitioned edge list) + one
    // keyed sum + the left join back onto the node set + the
    // checkpoint materialization — doubling the per-iteration shuffles
    // (the failure this guards) would land at >= 2x this pin
    assert(delta >= 1 && delta <= 6,
      s"per-iteration stage delta drifted: $delta (3-iter run $s3, 4-iter run $s4)")
  }

  test("q173 classifier: stage count grows by a pinned per-GD-step delta") {
    import graft.pipeline.QualityClassifier
    val feats = (1L to 40L).flatMap(d => Seq(
      (d, d % 2, d % 8, 3L, 6L), (d, d % 2, (d + 3) % 8, 3L, 6L)))
      .toDF("doc_id", "y", "b", "cnt", "n_tok")
      .localCheckpoint()
    def run(iters: Int): Unit = {
      val (w, bias) = QualityClassifier.train(feats, buckets = 8,
        iterations = iters)
      QualityClassifier.scores(feats, w, bias).count()
    }
    run(1) // warm
    val s3 = submittedStages { run(3) }
    val s4 = submittedStages { run(4) }
    val delta = s4 - s3
    info(s"stages: 3 iters=$s3, 4 iters=$s4, per-iteration delta=$delta")
    // one margin aggregate + one gradient aggregate + the bounded
    // weight/bias updates per step — doubling the per-step passes (the
    // failure this guards) would land at >= 2x this pin
    assert(delta >= 1 && delta <= 12,
      s"per-GD-step stage delta drifted: $delta (3-iter $s3, 4-iter $s4)")
  }

  test("q149 kmeans: exactly one centroid broadcast join per Lloyd round") {
    // KMeans.fit chains iterations without lineage truncation, so the
    // final plan is the full DAG: each of the KmIters update rounds and
    // the final labeling runs ONE crossJoin(broadcast(centroids)) —
    // KmIters + 1 = 3 BroadcastNestedLoopJoins, no more, no fewer.
    val plan = Catalog.byName("q149_kmeans_corpus_map")
      .run(spark, sf).queryExecution.explainString(FormattedMode)
    // FormattedMode prints each operator twice (tree line + detail
    // block); the "(id) Name" detail headers are unique per operator
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(plan).size
    info(s"q149 BNLJ count=$bnlj")
    assert(bnlj == 3,
      s"q149 should plan exactly 3 centroid broadcast joins (2 Lloyd rounds " +
        s"+ final assignment), found $bnlj")
  }
}
