package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Standardized cross-module interchange (SURVEY §1.1 last row —
  * orchestrator/data_formats.py): the identifier string format and the
  * StandardizedKnowledge/Relationship envelopes, as COLUMN expressions
  * so rendering/parsing runs distributed inside a scan (no driver
  * serialization loop).
  *
  * Identifier format (data_formats.py:101-138):
  * `[namespace:]module:entity_type:entity_id[:v<version>]` — namespace
  * present when >3 colon parts remain after stripping the version
  * suffix; version recognised by its `v` prefix on the last part.
  */
object Interchange {

  /** Render an identifier string from its parts (null namespace/version
    * omit their segments, mirroring `StandardizedIdentifier.__str__`). */
  def renderId(module: Column, entityType: Column, entityId: Column,
      namespace: Column = lit(null), version: Column = lit(null)): Column =
    concat_ws(":",
      namespace, module, entityType, entityId,
      when(version.isNotNull, concat(lit("v"), version)))

  /** Parse an identifier string into a
    * struct(namespace, module, entity_type, entity_id, version).
    * Malformed inputs (< 3 core parts, data_formats.py:114-116's
    * ValueError) yield a NULL struct — the per-row analog of refusing. */
  def parseId(s: Column): Column = {
    val parts = split(s, ":")
    val hasVer = element_at(parts, -1).rlike("^v")
    val core = when(hasVer, slice(parts, lit(1), size(parts) - 1))
      .otherwise(parts)
    val hasNs = size(core) > 3
    val ns = when(hasNs, element_at(core, 1))
    val rest = when(hasNs, slice(core, lit(2), size(core) - 1)).otherwise(core)
    val version = when(hasVer, substring(element_at(parts, -1), 2, 1000))
    when(size(rest) === 3, struct(
      ns.as("namespace"),
      element_at(rest, 1).as("module"),
      element_at(rest, 2).as("entity_type"),
      element_at(rest, 3).as("entity_id"),
      version.as("version")))
  }

  /** StandardizedKnowledge envelope (data_formats.py:241-286) as one
    * JSON column per node row — identifier nested as in `to_dict`.
    * Input needs (node_id, content, source, tags, creation_timestamp);
    * moduleId tags the producing module. */
  def knowledgeJson(nodes: DataFrame, moduleId: String): DataFrame =
    nodes.select(to_json(struct(
      struct(lit(null).cast("string").as("namespace"),
        lit(moduleId).as("module_id"),
        lit("knowledge_node").as("entity_type"),
        col("node_id").cast("string").as("entity_id"),
        lit(null).cast("string").as("version")).as("identifier"),
      col("content"),
      lit("text/plain").as("content_type"),
      col("tags"),
      col("creation_timestamp").as("created_at"),
      lit(1).as("version"),
      col("source"))).as("json"))

  private val KnowledgeSchema =
    "identifier struct<namespace:string,module_id:string," +
      "entity_type:string,entity_id:string,version:string>," +
      "content string, content_type string, tags array<string>," +
      "created_at double, version int, source string"

  /** Inverse of `knowledgeJson`: parse the envelope back to columns. */
  def fromKnowledgeJson(jsons: DataFrame): DataFrame =
    jsons
      .select(from_json(col("json"), KnowledgeSchema,
        Map.empty[String, String]).as("k"))
      .select(col("k.identifier.entity_id").as("node_id"),
        col("k.content").as("content"), col("k.source").as("source"),
        col("k.tags").as("tags"),
        col("k.created_at").as("creation_timestamp"))
}
