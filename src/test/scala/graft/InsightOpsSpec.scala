package graft

import org.apache.spark.sql.functions._
import graft.graph.{GraphOps, NodeConstraints, PatternMatch, PatternSpec, RelationshipConstraints}
import graft.operators.{Anomalies, Perspectives}
import graft.temporal.TemporalOps

/** Tiny-fixture semantics tests for the round-4 operators: pattern
  * matching, topic subgraph, anomaly detectors, perspective analysis,
  * cycle amplitude. */
class InsightOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    ("a", "b", "likes", 0.9), ("b", "c", "likes", 0.8),
    ("c", "a", "cites", 0.7), ("a", "d", "cites", 0.6),
    ("d", "e", "likes", 0.5))
    .toDF("from_id", "to_id", "relation_type", "confidence")

  test("PatternMatch compiles constraints and relationship semi-joins") {
    val nodes = Seq(
      ("a", "alpha join doc", "src1", 0.9, 0.5),
      ("b", "beta join doc", "src1", 0.9, 0.5),  // no outgoing 'cites'
      ("c", "gamma join doc", "src2", 0.9, 0.5), // source mismatch
      ("d", "delta doc", "src1", 0.9, 0.5))      // content mismatch
      .toDF("node_id", "content", "source", "truthfulness", "richness")
    val spec = PatternSpec(
      NodeConstraints(contentContains = Some("join"),
        minTruthfulness = Some(0.5), sourceContains = Some("src1")),
      RelationshipConstraints(outgoingRelationType = Some("cites")))
    val out = PatternMatch.matches(nodes, edges, spec)
      .select("node_id", "pattern_score").as[(String, Double)].collect()
    assert(out.map(_._1).toSeq == Seq("a"))
    // 0.3·0.9 + 0.2·0.5 + 0.5 content bonus = 0.87
    assert(math.abs(out.head._2 - 0.87) < 1e-9)
  }

  test("PatternMatch with no constraints keeps all nodes, capped") {
    val nodes = Seq(("a", "x", "s", 0.5, 0.5), ("b", "y", "s", 0.9, 0.5))
      .toDF("node_id", "content", "source", "truthfulness", "richness")
    val out = PatternMatch.matches(nodes, edges, PatternSpec(maxResults = 1))
      .select("node_id").as[String].collect()
    assert(out.toSeq == Seq("b")) // higher truthfulness score wins
  }

  test("topicSubgraph composes relevance filter + induced subgraph + density") {
    val content = Seq(
      ("a", "data table doc"), ("b", "data table doc"),
      ("c", "data only doc"), ("e", "data table doc"))
      .toDF("node_id", "content")
    val hits = Seq("a", "b", "c", "d").toDF("node_id") // d: no content row
    val out = GraphOps.topicSubgraph(edges, content, hits,
      keywords = Seq("data", "table"), maxNodes = 10, minRelevance = 0.7)
    val rows = out.select("from_id", "to_id", "n_nodes", "n_edges", "density")
      .as[(String, String, Long, Long, Double)].collect()
    // kept = {a, b} (c fails relevance, d has no content, e not a hit);
    // induced edge: a->b only
    assert(rows.toSeq == Seq(("a", "b", 2L, 1L, 0.5)))
  }

  test("semanticOutliers flags low-similarity members of low-cohesion groups") {
    val docsDf = Seq(
      ("g1", 1L, "alpha beta gamma"), ("g1", 2L, "alpha beta delta"),
      ("g1", 3L, "zz yy xx"), // the outlier
      ("g2", 4L, "p q"), ("g2", 5L, "p q")) // n=2 < minGroup
      .toDF("src", "id", "text")
    val out = Anomalies.semanticOutliers(docsDf, "src", "id", "text",
      minGroup = 3, groupAvgBelow = 0.9, nodeAvgBelow = 0.1)
      .select("id").as[Long].collect()
    assert(out.toSeq == Seq(3L))
  }

  test("temporalGapsBursts finds gap runs and burst days") {
    val series = Seq(
      ("u1", 0, 10L), ("u1", 1, 10L), ("u1", 4, 10L), // gap days 2-3
      ("u2", 0, 1L), ("u2", 1, 1L), ("u2", 2, 1L), ("u2", 3, 1L),
      ("u2", 4, 1L), ("u2", 5, 1L), ("u2", 6, 1L), ("u2", 7, 100L)) // burst
      .toDF("k", "idx", "cnt")
    val out = Anomalies.temporalGapsBursts(series, "k", "idx", "cnt",
      sigmaK = 2.0, minGap = 2)
      .select("k", "kind", "start_idx", "end_idx", "len")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(out.contains(("u1", "gap", 2L, 3L, 2L)))
    assert(out.exists(r => r._1 == "u2" && r._2 == "burst" && r._3 == 7L))
  }

  test("behavioralOutliers applies the three reference rules") {
    // hub node with far more incident edges than average
    val hubEdges = (1 to 30).map(i => ("hub", s"n$i", "likes", 0.5)) ++
      Seq(("n1", "n2", "likes", 0.5), ("n3", "n4", "likes", 0.5))
    val out = Anomalies.behavioralOutliers(
      hubEdges.toDF("from_id", "to_id", "relation_type", "confidence"))
      .select("node_id", "reason").as[(String, String)].collect().toMap
    assert(out.contains("hub"))
    assert(out("hub").contains("excessive_relationships"))
  }

  test("comparisonMatrix and consensusLevels") {
    val docsDf = Seq(
      ("t1", "en", "alpha beta gamma"), ("t1", "fr", "alpha beta delta"),
      ("t1", "de", "zz yy"))
      .toDF("source", "lang", "text")
    val m = Perspectives.comparisonMatrix(docsDf, "source", "lang", "text",
      claimMin = 1)
    val sims = m.select("a_persp", "b_persp", "sim")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // en vs fr share 2 of 4 tokens: J = 0.5 → sim = 0.5·0.5 + 0.3·0.5 = 0.4
    assert(math.abs(sims(("en", "fr")) - 0.4) < 1e-9)
    assert(sims(("de", "en")) == 0.0 && sims(("de", "fr")) == 0.0)
    val lvl = Perspectives.consensusLevels(m)
      .select("level").as[String].collect()
    assert(lvl.toSeq == Seq("strong_disagreement")) // avg = 0.4/3 < 0.2
  }

  test("temporalEvolution classifies trends per the reference rules") {
    // stable: identical sets every period (sim 1.0 > 0.7)
    val stable = (0 to 3).map(p => ("s", p, Seq("a", "b")))
    // diverging: strictly increasing consecutive sims
    val diverging = Seq(
      ("d", 0, Seq("a", "b", "c", "d")), ("d", 1, Seq("c", "d", "e", "f")),
      ("d", 2, Seq("c", "d", "e", "x")), ("d", 3, Seq("c", "d", "e", "x")))
    // insufficient: only 2 periods
    val short = Seq(("i", 0, Seq("a")), ("i", 1, Seq("a")))
    val ps = (stable ++ diverging ++ short).toDF("topic", "period", "toks")
    val out = Perspectives.temporalEvolution(ps)
      .select("topic", "trend").as[(String, String)].collect().toMap
    assert(out("s") == "stable")
    assert(out("d") == "diverging")
    assert(out("i") == "insufficient_data")
  }

  test("includeRelationships attaches sorted arrays; projectNested drops fields") {
    val results = Seq("a", "z").toDF("node_id") // z has no edges
    val enriched = graft.operators.Projections.includeRelationships(results, edges)
    val projected = graft.operators.Projections.projectNested(
      enriched, "relationships", Seq("direction", "other_id"))
    val byNode = projected
      .select(col("node_id"), expr(
        "transform(relationships, x -> concat_ws(':', x.direction, x.other_id))"))
      .as[(String, Seq[String])].collect().toMap
    // a: out->b (likes), out->d (cites), in<-c (cites) — sorted by struct order
    assert(byNode("a") == Seq("in:c", "out:b", "out:d"))
    assert(byNode("z") == Seq.empty) // empty array, not null
    // confidence was dropped by the nested projection
    val elem = projected.schema("relationships").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elem.fieldNames.toSeq == Seq("direction", "other_id"))
    // unknown nested field is rejected
    intercept[IllegalArgumentException] {
      graft.operators.Projections.projectNested(enriched, "relationships", Seq("nope"))
    }
  }

  test("Endpoints facade delegates the MCP surface to the operators") {
    import graft.engine.Endpoints
    val seeds = Seq("a").toDF("node_id")
    // relation filter drops the cites edges → only a->b reachable
    val hop = Endpoints.multiHopTraversal(edges, seeds, maxHops = 2,
      relTypes = Seq("likes"))
      .as[(String, Int)].collect().toSet
    assert(hop == Set(("a", 0), ("b", 1), ("c", 2)))
    val paths = Endpoints.multiHopTraversal(edges, seeds, maxHops = 1,
      relTypes = Seq("likes"), withPaths = true)
      .filter(col("hop") === 1).select("path").as[String].collect().toSeq
    assert(paths == Seq("a --likes--> b"))
    val contra = Endpoints.findContradictions(
      Seq((1L, "g", "very slow code"), (2L, "g", "fast code here"))
        .toDF("id", "grp", "text"),
      "grp", "id", "text", axes = Seq(("slow", "fast")), minScore = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(contra == Seq((1L, 2L)))
    val sub = Endpoints.exportSubgraph(edges, Seq("a", "b").toDF("node_id"))
      .select("from_id", "to_id").as[(String, String)].collect().toSeq
    assert(sub == Seq(("a", "b")))
  }

  test("popularityFull applies the floor, boost, and caps") {
    import graft.operators.Ranking
    val rows = Seq((0L, 0L), (1L, 0L), (99L, 0L), (99L, 5L), (10000L, 100L))
      .toDF("access", "recent")
      .select(col("access"), col("recent"),
        Ranking.popularityFull(col("access"), col("recent")).as("pop"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows((0L, 0L)) == 0.1) // never-accessed floor
    assert(math.abs(rows((1L, 0L)) - math.log(2) / math.log(100)) < 1e-9)
    assert(math.abs(rows((99L, 0L)) - 1.0) < 1e-9) // log base caps at 1
    assert(math.abs(rows((99L, 5L)) - 1.0) < 1e-9) // boost still capped at 1
    assert(rows((10000L, 100L)) == 1.0)
    // boost itself caps at 0.2
    val boosted = Seq((2L, 100L)).toDF("access", "recent")
      .select(Ranking.popularityFull(col("access"), col("recent")))
      .as[Double].collect().head
    assert(math.abs(boosted - (math.log(3) / math.log(100) + 0.2)) < 1e-9)
  }

  test("Contradictions.mine rejects overlapping axis words") {
    val err = intercept[IllegalArgumentException] {
      graft.operators.Contradictions.mine(
        Seq((1L, "g", "x")).toDF("id", "grp", "text"),
        "grp", "id", "text", axes = Seq(("hot", "cold"), ("cold", "freezing")))
    }
    assert(err.getMessage.contains("distinct"))
  }

  test("cycleAmplitude computes phase-mean range per period") {
    // period-2 alternation 10/20 → phase means 10 and 20 → amp2 = 10
    val series = (0 until 8).map(i => ("k1", i, if (i % 2 == 0) 10L else 20L))
      .toDF("k", "idx", "cnt")
    val out = TemporalOps.cycleAmplitude(series, "k", "idx", "cnt", Seq(2, 4))
      .select("amp2", "amp4").as[(Double, Double)].collect().head
    assert(out._1 == 10.0)
    assert(out._2 == 10.0) // phases 0,2 → 10; 1,3 → 20
  }
}
