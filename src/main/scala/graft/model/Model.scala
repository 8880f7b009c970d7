package graft.model

/** Core data model of the engine — mirrors the reference's fundamental
  * abstractions (knowledge nodes, typed directed relationships, revisions)
  * re-expressed as Spark-friendly case classes with typed columns instead
  * of the reference's string-packed property bags.
  *
  * Reference: memory_core/model/knowledge_node.py:19-49,
  * memory_core/model/relationship.py:19-47,
  * memory_core/versioning/revision_manager.py:55-111.
  */
final case class KnowledgeNode(
    nodeId: String,
    content: String,
    source: String,
    creationTimestamp: Double,         // unix seconds
    ratingRichness: Double = 0.5,      // all ratings in [0,1]
    ratingTruthfulness: Double = 0.5,
    ratingStability: Double = 0.5,
    tags: Seq[String] = Seq.empty,
    props: Map[String, String] = Map.empty)

final case class Relationship(
    edgeId: String,
    fromId: String,
    toId: String,
    relationType: String,              // is_a, part_of, RELATED, SIMILAR_TAGS, ...
    timestamp: Double,
    confidenceScore: Double = 0.5,
    version: Int = 1)

final case class Revision(
    revId: String,
    objectType: String,                // node | edge
    objectId: String,
    changeType: String,                // create | update | delete
    timestamp: Double,
    oldData: Map[String, String],
    newData: Map[String, String])

/** Result row of the query engine (reference query/query_types.py:188-215). */
final case class QueryResult(
    nodeId: String,
    content: String,
    relevanceScore: Double,
    qualityScore: Double,
    combinedScore: Double)
