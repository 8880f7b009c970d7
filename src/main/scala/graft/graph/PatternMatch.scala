package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Node-attribute constraints of a pattern
  * (enhanced_mcp_endpoint.py:687-704): every defined field must hold. */
final case class NodeConstraints(
    contentContains: Option[String] = None,
    minTruthfulness: Option[Double] = None,
    sourceContains: Option[String] = None,
    contentLengthMin: Option[Int] = None)

/** Relationship-participation constraints
  * (enhanced_mcp_endpoint.py:706-723): the node must have at least one
  * outgoing / incoming edge of the required type. */
final case class RelationshipConstraints(
    outgoingRelationType: Option[String] = None,
    incomingRelationType: Option[String] = None)

/** A declarative pattern specification
  * (enhanced_mcp_endpoint.py:270-345's `pattern` dict as a typed spec). */
final case class PatternSpec(
    nodes: NodeConstraints = NodeConstraints(),
    relationships: RelationshipConstraints = RelationshipConstraints(),
    maxResults: Int = 20)

/** Generic pattern matching: compile a [[PatternSpec]] against a node
  * attribute table and an edge table into a filter + semi-join plan.
  *
  * The reference (enhanced_mcp_endpoint.py:270-345) generates candidates
  * by semantic search on `content_contains`, then checks constraints and
  * relationship participation per node in driver loops; here candidates
  * come from an exact containment filter (its no-embedding-manager
  * degenerate form — deterministic, so oracle-checkable) and each
  * relationship check is one left-semi join against the pre-filtered
  * edge side. Scoring is the reference formula
  * (enhanced_mcp_endpoint.py:725-740): 0.3·truthfulness + 0.2·richness
  * + 0.5 if the content term matches, capped at 1.
  *
  * Scale shape: predicate filters push into the node scan; each rel
  * constraint is a semi-join on the node id (shuffle-partitionable, and
  * the distinct projected edge side is small); the final top-k is
  * orderBy+limit → TakeOrderedAndProject.
  *
  * `nodes` columns: node_id, content, source, truthfulness, richness.
  * `edges` columns: from_id, to_id, relation_type.
  */
object PatternMatch {

  def matches(nodes: DataFrame, edges: DataFrame, spec: PatternSpec): DataFrame = {
    val constraintFilters = Seq(
      spec.nodes.contentContains.map(s => col("content").contains(lit(s))),
      spec.nodes.minTruthfulness.map(t => col("truthfulness") >= t),
      spec.nodes.sourceContains.map(s => col("source").contains(lit(s))),
      spec.nodes.contentLengthMin.map(n => length(col("content")) >= n)
    ).flatten
    val filtered = constraintFilters.foldLeft(nodes)(_ filter _)
    val withOut = spec.relationships.outgoingRelationType.fold(filtered) { t =>
      filtered.join(
        edges.filter(col("relation_type") === t)
          .select(col("from_id").as("node_id")).distinct(),
        Seq("node_id"), "left_semi")
    }
    val withIn = spec.relationships.incomingRelationType.fold(withOut) { t =>
      withOut.join(
        edges.filter(col("relation_type") === t)
          .select(col("to_id").as("node_id")).distinct(),
        Seq("node_id"), "left_semi")
    }
    val contentBonus =
      if (spec.nodes.contentContains.isDefined) lit(0.5) else lit(0.0)
    withIn
      .withColumn("pattern_score", least(lit(1.0),
        col("truthfulness") * 0.3 + col("richness") * 0.2 + contentBonus))
      .orderBy(col("pattern_score").desc, col("node_id"))
      .limit(spec.maxResults)
  }
}
