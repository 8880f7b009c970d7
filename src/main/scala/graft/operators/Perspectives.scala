package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Perspective analysis (SURVEY.md §2.7 remainder, reference
  * synthesis/perspective_analysis.py): pairwise perspective comparison
  * matrix, consensus levels, and temporal perspective evolution.
  *
  * A "perspective" here is a (topic, perspective-key) document group —
  * the distributed analog of the reference's Perspective dataclass
  * (perspective_analysis.py:43-57), whose viewpoint text is the group's
  * content, key claims its recurring terms, supporting evidence its
  * member ids.
  */
object Perspectives {

  /** Pairwise perspective similarity matrix per topic
    * (perspective_analysis.py:1083-1128): for same-type perspectives
    * sim = 0.5·viewpoint + 0.3·claims + 0.2·evidence, where viewpoint
    * similarity is token-set Jaccard of the groups' token unions
    * (:1130-1144), claims similarity is Jaccard of the tokens appearing
    * ≥ `claimMin` times in the group (:1113-1116), and evidence overlap
    * is 0 for disjoint member sets (:1118-1121; group members are
    * disjoint by construction). Upper triangle only (the matrix is
    * symmetric with unit diagonal).
    *
    * One explode + two aggregates + a within-topic equi-join over
    * #perspectives-per-topic rows — cost Σ|topic-perspectives|², with
    * perspective counts small by nature (the reference caps at 10). */
  def comparisonMatrix(docs: DataFrame, topicCol: String, perspCol: String,
      textCol: String, claimMin: Int = 3): DataFrame = {
    val counts = docs.select(col(topicCol).as("topic"),
        col(perspCol).as("persp"),
        explode(TextFunctions.distinctTokens(col(textCol))).as("tok"))
      .groupBy(col("topic"), col("persp"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val sets = counts.groupBy(col("topic"), col("persp"))
      .agg(collect_set(col("tok")).as("toks"),
        collect_set(when(col("cnt") >= claimMin, col("tok"))).as("claims"))
    val a = sets.select(col("topic"), col("persp").as("a_persp"),
      col("toks").as("a_toks"), col("claims").as("a_claims"))
    val b = sets.select(col("topic"), col("persp").as("b_persp"),
      col("toks").as("b_toks"), col("claims").as("b_claims"))
    a.join(b, "topic").filter(col("a_persp") < col("b_persp"))
      .withColumn("sim",
        TextFunctions.jaccardSim(col("a_toks"), col("b_toks")) * 0.5 +
          TextFunctions.jaccardSim(col("a_claims"), col("b_claims")) * 0.3)
      .select(col("topic"), col("a_persp"), col("b_persp"), col("sim"))
  }

  /** Consensus level per topic from the average off-diagonal matrix
    * similarity (perspective_analysis.py:1280-1309): ≥0.8 strong, ≥0.6
    * moderate, ≥0.4 weak, ≥0.2 none, else strong_disagreement. */
  def consensusLevels(matrix: DataFrame): DataFrame =
    matrix.groupBy(col("topic"))
      .agg(avg(col("sim")).as("avg_sim"), count(lit(1)).as("n_pairs"))
      .withColumn("level",
        when(col("avg_sim") >= 0.8, "strong_consensus")
          .when(col("avg_sim") >= 0.6, "moderate_consensus")
          .when(col("avg_sim") >= 0.4, "weak_consensus")
          .when(col("avg_sim") >= 0.2, "no_consensus")
          .otherwise("strong_disagreement"))

  /** Temporal perspective evolution (perspective_analysis.py:1693-1780):
    * given one token set per (topic, period), compute similarity between
    * consecutive periods, then per topic classify the trend —
    * insufficient_data (<3 periods), stable (avg sim > 0.7), converging
    * (consecutive sims strictly decreasing, :1775-1776), diverging
    * (strictly increasing), else cyclical — and count turning points
    * (interior periods where |sim(prev,cur) − sim(cur,next)| > 0.3,
    * :1782-1812). Two lag/lead windows + one aggregate. */
  def temporalEvolution(periodSets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("topic")).orderBy(col("period"))
    val sims = periodSets
      .withColumn("prev_toks", lag(col("toks"), 1).over(w))
      .withColumn("sim", when(col("prev_toks").isNotNull,
        TextFunctions.jaccardSim(col("toks"), col("prev_toks"))))
      .withColumn("next_sim", lead(col("sim"), 1).over(w))
      .withColumn("d", col("next_sim") - col("sim"))
      .withColumn("turning",
        when(col("sim").isNotNull && col("next_sim").isNotNull &&
          abs(col("sim") - col("next_sim")) > 0.3, 1).otherwise(0))
    sims.groupBy(col("topic"))
      .agg(count(lit(1)).as("n_periods"),
        avg(col("sim")).as("avg_sim"),
        max(col("d")).as("max_d"), min(col("d")).as("min_d"),
        sum(col("turning")).as("n_turning"))
      .withColumn("trend",
        when(col("n_periods") < 3, "insufficient_data")
          .when(col("avg_sim") > 0.7, "stable")
          .when(col("max_d") < 0, "converging")
          .when(col("min_d") > 0, "diverging")
          .otherwise("cyclical"))
      .select(col("topic"), col("n_periods"), col("avg_sim"),
        col("trend"), col("n_turning"))
  }
}
