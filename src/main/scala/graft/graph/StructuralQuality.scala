package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural quality analyzer (quality/quality_assessment.py
  * StructuralQualityAnalyzer:415-625): per-node scores derived from the
  * node's incident relationships —
  *
  *   connectivity: tier on incident count (0 / 0.3 / 0.6 / 0.9 / 1.0)
  *   relationship_quality: mean over rels of min(1, 0.5 + type adj +
  *     0.2·confidence) — generic types (related_to/associated_with)
  *     −0.2, specific ones (part_of/instance_of/causes/enables) +0.3,
  *     confidence bonus only when truthy (> 0), mirroring the
  *     reference's `if rel.confidence` check
  *   centrality: 0.7·(min(in,out)/max(in,out)) + 0.3·min(n/10, 1)
  *   diversity: tier on distinct-type ratio
  *
  * overall = mean of the four, level per the shared tier mapping. One
  * explode-to-incidence + one aggregate — the whole analysis is a
  * groupBy over the edge list, scale-shaped like q47's degree
  * distribution. The node universe is edge-derived (isolated nodes
  * score 0.0 across the board in the reference; callers wanting them
  * can left-join a node table against this output and coalesce to 0).
  * Self-loops count once per endpoint here (the synthetic graph has
  * none; the reference counts a self-loop once but flags it both
  * incoming and outgoing — a documented corner divergence). */
object StructuralQuality {

  def assess(edges: DataFrame): DataFrame = {
    // per-edge quality in milli-units (500 + adj + 200·confidence, capped
    // at 1000): the per-node mean then aggregates integers and divides
    // ONCE, so the result doesn't depend on float summation order — an
    // avg() over doubles here rounds differently between engines when a
    // node's mean lands exactly on a 6-decimal boundary (observed:
    // 0.6515625 with 64 incident edges). DIVERGENCE: round(conf*200)
    // quantizes the reference's exact 0.5+adj+0.2*conf to 0.005 steps
    // (≤5e-4 per edge) — cross-engine determinism is bought at the cost
    // of reference parity on non-multiple-of-0.005 confidences (README
    // divergences list).
    val relQMilli = least(lit(500L) +
      when(col("relation_type").isin("related_to", "associated_with"), -200L)
        .when(col("relation_type").isin("part_of", "instance_of", "causes",
          "enables"), 300L)
        .otherwise(0L) +
      when(col("confidence").isNotNull && col("confidence") =!= 0,
        round(col("confidence") * 200).cast("long")).otherwise(0L), lit(1000L))
    val inc = edges
      .select(col("from_id").as("node_id"), lit(1L).as("n_out"),
        lit(0L).as("n_in"), col("relation_type"), relQMilli.as("rel_q_milli"))
      .unionByName(edges
        .select(col("to_id").as("node_id"), lit(0L).as("n_out"),
          lit(1L).as("n_in"), col("relation_type"), relQMilli.as("rel_q_milli")))
    val agg = inc.groupBy(col("node_id"))
      .agg(count(lit(1)).as("n_rels"), sum(col("n_out")).as("out_n"),
        sum(col("n_in")).as("in_n"),
        (sum(col("rel_q_milli")).cast("double") /
          (count(lit(1)) * 1000)).as("rel_quality"),
        countDistinct(col("relation_type")).as("n_types"))
    val connectivity = when(col("n_rels") === 0, 0.0)
      .when(col("n_rels") === 1, 0.3).when(col("n_rels") <= 3, 0.6)
      .when(col("n_rels") <= 7, 0.9).otherwise(1.0)
    val balance = when(greatest(col("in_n"), col("out_n")) > 0,
      least(col("in_n"), col("out_n")).cast("double") /
        greatest(col("in_n"), col("out_n"))).otherwise(0.0)
    val centrality = balance * 0.7 +
      least(col("n_rels") / 10.0, lit(1.0)) * 0.3
    val divRatio = col("n_types").cast("double") / col("n_rels")
    val diversity = when(divRatio >= 0.8, 1.0).when(divRatio >= 0.6, 0.8)
      .when(divRatio >= 0.4, 0.6).when(divRatio >= 0.2, 0.4).otherwise(0.2)
    agg
      .withColumn("connectivity", connectivity)
      .withColumn("centrality", centrality)
      .withColumn("diversity", diversity)
      .withColumn("overall_structural",
        (col("connectivity") + col("rel_quality") + col("centrality") +
          col("diversity")) / 4)
      .withColumn("quality_level",
        graft.text.QualityAssessment.level(col("overall_structural")))
      .select(col("node_id"), col("n_rels"), col("connectivity"),
        col("rel_quality"), col("centrality"), col("diversity"),
        col("overall_structural"), col("quality_level"))
  }
}
