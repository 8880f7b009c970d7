package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Contradiction mining (enhanced_mcp_endpoint.py:587-686, pattern
  * scoring :889-952): same-group document pairs asserting opposite poles
  * of antonym axes, scored by the fraction of axes in opposition.
  *
  * Scale shape: docs with no axis term at all are dropped BEFORE the
  * self-join (a scoring pair needs axis terms on both sides), so the
  * candidate space is Σ|axis-docs-in-group|², not Σ|group|² — the
  * distributed analog of the reference's ≤100-candidate prune (:612).
  */
object Contradictions {

  /** One row per contradicting pair: (group, a_id, b_id, score) with
    * score = opposing axes / |axes| ≥ minScore, top `limit` by score. */
  def mine(docs: DataFrame, groupCol: String, idCol: String, textCol: String,
      axes: Seq[(String, String)], minScore: Double = 0.5,
      limit: Int = 10): DataFrame = {
    require(axes.nonEmpty, "contradiction mining needs at least one axis")
    // the any-axis prune below drops no-axis-term docs before the
    // self-join; at minScore <= 0 that prune would change the output
    // (score-0 pairs between pruned docs would qualify), so the prune's
    // contract is enforced here rather than left implicit
    require(minScore > 0,
      s"minScore must be > 0 (the pre-join axis prune assumes score-0 " +
        s"pairs never qualify): $minScore")
    val words = axes.flatMap { case (x, y) => Seq(x, y) }
    require(words.distinct.size == words.size,
      s"axis words must be distinct (a shared word would project duplicate " +
        s"has_<word> columns and make the scoring ambiguous): $axes")
    def flags(df: DataFrame) = axes.foldLeft(df) { case (d, (x, y)) =>
      d.withColumn(s"has_$x",
          array_contains(TextFunctions.distinctTokens(col(textCol)), x))
        .withColumn(s"has_$y",
          array_contains(TextFunctions.distinctTokens(col(textCol)), y))
    }
    val anyAxis = axes
      .flatMap { case (x, y) => Seq(col(s"has_$x"), col(s"has_$y")) }
      .reduce(_ || _)
    val f = flags(docs).select(
      (Seq(col(idCol), col(groupCol)) ++
        axes.flatMap { case (x, y) => Seq(col(s"has_$x"), col(s"has_$y")) }): _*)
      .filter(anyAxis)
    val a = f.columns.foldLeft(f)((d, c) =>
      if (c.startsWith("has_")) d.withColumnRenamed(c, s"a_$c") else d)
      .withColumnRenamed(idCol, "a_id")
    val b = f.columns.foldLeft(f)((d, c) =>
      if (c.startsWith("has_")) d.withColumnRenamed(c, s"b_$c") else d)
      .withColumnRenamed(idCol, "b_id")
    val axisScore: Column = axes.map { case (x, y) =>
      when((col(s"a_has_$x") && !col(s"a_has_$y") && col(s"b_has_$y") && !col(s"b_has_$x")) ||
        (col(s"a_has_$y") && !col(s"a_has_$x") && col(s"b_has_$x") && !col(s"b_has_$y")), 1)
        .otherwise(0)
    }.reduce(_ + _)
    a.join(b, groupCol)
      .filter(col("a_id") < col("b_id"))
      .withColumn("score", axisScore.cast("double") / axes.size)
      .filter(col("score") >= minScore)
      .select(col(groupCol), col("a_id"), col("b_id"), col("score"))
      .orderBy(col("score").desc, col("a_id"), col("b_id"))
      .limit(limit)
  }
}
