package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Knowledge synthesis (enhanced_mcp_endpoint.py:463-503 dispatch):
  * `summary` and `comparison` over a selected node set; `timeline` is
  * `temporal/` + q68. The reference loops over a driver-side node list;
  * these run over a `selected` DataFrame of any size (the node-id
  * selection is the caller's semi-join), with the all-pairs comparison
  * bounded by the caller's selection exactly as the reference's
  * `node_ids` argument bounds it.
  *
  * `selected` columns: node_id, content, source, confidence.
  */
object Synthesis {

  /** `summary` synthesis (:751-783): set-level stats plus the top-10
    * summary points (first sentence of each content, kept if longer than
    * 20 chars). One row per summary point with the stats as constant
    * columns — the flattened envelope. Points order: by node_id
    * (distributed engines need an order-free rule; the reference's order
    * is its input-list order). */
  def summary(selected: DataFrame): DataFrame = {
    val stats = selected.agg(
      count(lit(1)).as("nodes_processed"),
      countDistinct(col("source")).as("n_sources"),
      avg(col("confidence")).as("average_confidence"),
      sum(length(col("content"))).as("total_content_length"))
    val points = selected
      .withColumn("point", concat(substring_index(col("content"), ".", 1), lit(".")))
      .filter(length(col("point")) > 20)
      .select(col("node_id"), col("point"))
      .orderBy(col("node_id"))
      .limit(10)
    points.crossJoin(broadcast(stats))
  }

  /** `comparison` synthesis (:785-817): every unordered pair of the
    * selected nodes with confidence diff, source match, and word-overlap
    * Jaccard content similarity (:935-947). */
  def comparison(selected: DataFrame): DataFrame = {
    val t = selected.select(col("node_id"), col("source"), col("confidence"),
      TextFunctions.distinctTokens(lower(col("content"))).as("toks"))
    val a = t.select(col("node_id").as("a_id"), col("source").as("a_src"),
      col("confidence").as("a_conf"), col("toks").as("a_toks"))
    val b = t.select(col("node_id").as("b_id"), col("source").as("b_src"),
      col("confidence").as("b_conf"), col("toks").as("b_toks"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        abs(col("a_conf") - col("b_conf")).as("confidence_diff"),
        (col("a_src") === col("b_src")).as("source_match"),
        TextFunctions.jaccardSim(col("a_toks"), col("b_toks"))
          .as("content_similarity"))
  }
}
