package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Nested relationship projection (reference `include_relationships`,
  * query_engine.py:361, :435-440 and QueryResult.relationships): result
  * rows carry their incident relationships as a nested array column, and
  * projections can keep a subset of the nested fields.
  *
  * The reference enriches per node with one adapter call each; here the
  * enrichment is ONE aggregate over the (bidirectional) edge list plus a
  * left join on the result id — shuffle-partitionable on the node id and
  * map-side combinable, the 100 TB form of the same contract.
  */
object Projections {

  /** Attach each result's incident relationships as a deterministic,
    * sorted `relationships` array<struct(direction, other_id,
    * relation_type, confidence)> (query_engine.py:435-440; direction is
    * the reference's outgoing/incoming split, graph adapter both_e).
    * Results without relationships get an empty array, like the
    * reference's default-empty `QueryResult.relationships`. */
  def includeRelationships(results: DataFrame, edges: DataFrame,
      idCol: String = "node_id"): DataFrame = {
    val rel = struct(col("direction"), col("other_id"),
      col("relation_type"), col("confidence"))
    val rels = edges.select(col("from_id").as(idCol), lit("out").as("direction"),
        col("to_id").as("other_id"), col("relation_type"), col("confidence"))
      .unionByName(edges.select(col("to_id").as(idCol), lit("in").as("direction"),
        col("from_id").as("other_id"), col("relation_type"), col("confidence")))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(rel)).as("relationships"))
    val joined = results.join(rels, Seq(idCol), "left")
    val relType = rels.schema("relationships").dataType
    joined.withColumn("relationships",
      coalesce(col("relationships"), array().cast(relType)))
  }

  /** Project a nested array-of-struct column down to a subset of its
    * fields (the "nested relationship projection" the reference's
    * include/exclude surface implies): `transform` keeps the array shape,
    * each element reduced to `fields`. */
  def projectNested(df: DataFrame, arrayCol: String,
      fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "projectNested needs at least one field")
    val elem = df.schema(arrayCol).dataType match {
      case ArrayType(s: StructType, _) => s
      case other => sys.error(s"$arrayCol is not array<struct>: $other")
    }
    val missing = fields.filterNot(elem.fieldNames.contains)
    require(missing.isEmpty, s"unknown nested fields: ${missing.mkString(", ")}")
    // Column API, not an interpolated SQL string — field names with
    // spaces/dots/quotes would break (or silently change) a parsed expr
    df.withColumn(arrayCol,
      transform(col(arrayCol),
        x => struct(fields.map(f => x.getField(f).as(f)): _*)))
  }
}
