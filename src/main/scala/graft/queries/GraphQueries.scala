package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphOps, KGraph}
import graft.graph.GraphOps.{Both, Incoming, Outgoing}

/** Graph traversal operators (SURVEY.md §2.3): neighbor expansion,
  * multi-hop BFS with hop distance + relation/confidence edge filters,
  * shortest-path lengths, induced subgraph, pattern matching.
  * Oracles are DuckDB recursive CTEs over the identical edge list.
  */
object GraphQueries {

  private def W = s"WITH RECURSIVE ${KGraph.edgesSql}"

  // -- q11: 1-hop neighbor expansion, both directions, relation filter
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val seeds = s.range(1, 51).select(concat(lit("c:"), col("id")).as("node_id"))
    GraphOps.neighbors(KGraph.orientedMaterialized(s, dir, Both), seeds, Both,
        Seq("placed_by", "located_in"), preOriented = true)
      .orderBy(col("node_id"), col("neighbor_id"), col("relation_type"))
  }

  private val q11Sql =
    s"""$W, seeds AS (SELECT 'c:'||x AS node_id FROM range(1, 51) t(x)),
       |bi AS (
       |  SELECT from_id AS node_id, to_id AS neighbor_id, relation_type, confidence FROM edges
       |  UNION ALL
       |  SELECT to_id, from_id, relation_type, confidence FROM edges)
       |SELECT s.node_id, b.neighbor_id, b.relation_type, b.confidence
       |FROM seeds s JOIN bi b ON s.node_id = b.node_id
       |WHERE b.relation_type IN ('placed_by','located_in')
       |ORDER BY s.node_id, b.neighbor_id, b.relation_type""".stripMargin

  // -- q12: multi-hop BFS (incoming, 3 hops) with min-hop annotation
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val seeds = s.sql("SELECT 'r:0' AS node_id")
    GraphOps.multiHop(KGraph.orientedMaterialized(s, dir, Incoming), seeds,
        maxHops = 3, Incoming, preOriented = true)
      .orderBy(col("node_id"))
  }

  private val q12Sql =
    s"""$W,
       |walk(node_id, hop) AS (
       |  SELECT 'r:0', 0
       |  UNION ALL
       |  SELECT e.from_id, w.hop + 1 FROM walk w
       |  JOIN edges e ON e.to_id = w.node_id
       |  WHERE w.hop < 3)
       |SELECT node_id, CAST(min(hop) AS INT) AS hop FROM walk
       |GROUP BY node_id ORDER BY node_id""".stripMargin

  // -- q13: multi-hop over OUTGOING edges with relation + min-confidence
  //         edge filter (enhanced_mcp_endpoint.py:76-171 semantics)
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val seeds = s.range(1, 101)
      .select(concat(lit("o:"), col("id") * 15).as("node_id"))
    GraphOps.multiHop(KGraph.orientedMaterialized(s, dir, Outgoing), seeds,
        maxHops = 3, Outgoing, preOriented = true,
        edgeFilter = Some(col("confidence") >= 0.75 &&
          col("relation_type").isin("placed_by", "located_in", "contains", "part_of")))
      .orderBy(col("node_id"))
  }

  private val q13Sql =
    s"""$W,
       |seeds AS (SELECT 'o:'||(x*15) AS node_id FROM range(1, 101) t(x)),
       |fe AS (SELECT from_id, to_id FROM edges
       |       WHERE confidence >= 0.75
       |         AND relation_type IN ('placed_by','located_in','contains','part_of')),
       |walk(node_id, hop) AS (
       |  SELECT node_id, 0 FROM seeds
       |  UNION ALL
       |  SELECT e.to_id, w.hop + 1 FROM walk w
       |  JOIN fe e ON e.from_id = w.node_id
       |  WHERE w.hop < 3)
       |SELECT node_id, CAST(min(hop) AS INT) AS hop FROM walk
       |GROUP BY node_id ORDER BY node_id""".stripMargin

  // -- q14: unweighted shortest-path lengths (BFS both directions, ≤3)
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val src = s.sql("SELECT 'c:1' AS node_id")
    GraphOps.shortestPathLengths(KGraph.orientedMaterialized(s, dir, Both), src,
        maxHops = 3, preOriented = true)
      .orderBy(col("node_id"))
  }

  private val q14Sql =
    s"""$W,
       |und AS (SELECT from_id AS a, to_id AS b FROM edges
       |        UNION ALL SELECT to_id, from_id FROM edges),
       |walk(node_id, hop) AS (
       |  SELECT 'c:1', 0
       |  UNION ALL
       |  SELECT u.b, w.hop + 1 FROM walk w JOIN und u ON u.a = w.node_id
       |  WHERE w.hop < 3)
       |SELECT node_id, CAST(min(hop) AS INT) AS hop FROM walk
       |GROUP BY node_id ORDER BY node_id""".stripMargin

  // -- q15: induced subgraph (semi-joins both endpoints) + per-type counts
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val edges = KGraph.materialized(s, dir)
    val keepCustomers = graft.Tables.load(s, dir, "customer")
      .filter(col("c_nationkey") < 5)
      .select(concat(lit("c:"), col("c_custkey")).as("node_id"))
    val keepNations = graft.Tables.load(s, dir, "nation")
      .select(concat(lit("n:"), col("n_nationkey")).as("node_id"))
    val keep = keepCustomers.unionByName(keepNations)
    GraphOps.inducedSubgraph(edges, keep)
      .groupBy(col("relation_type"))
      .agg(count(lit(1)).as("n_edges"),
        round(avg(col("confidence")), 6).as("avg_conf"))
      .orderBy(col("relation_type"))
  }

  private val q15Sql =
    s"""$W,
       |keep AS (
       |  SELECT 'c:'||c_custkey AS node_id FROM customer WHERE c_nationkey < 5
       |  UNION ALL
       |  SELECT 'n:'||n_nationkey FROM nation)
       |SELECT relation_type, count(*) AS n_edges,
       |  round(avg(confidence), 6) AS avg_conf
       |FROM edges e
       |WHERE EXISTS (SELECT 1 FROM keep k WHERE k.node_id = e.from_id)
       |  AND EXISTS (SELECT 1 FROM keep k WHERE k.node_id = e.to_id)
       |GROUP BY relation_type ORDER BY relation_type""".stripMargin

  // -- q16: pattern matching — node constraints + relationship-pattern
  //         check, scored (enhanced_mcp_endpoint.py:270-345): orders with
  //         status 'F' placed by customers in nations 0-4 that contain an
  //         ECONOMY part; score = matched-part ratio
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
    val cust = graft.Tables.load(s, dir, "customer").filter(col("c_nationkey") < 5)
    val li = graft.Tables.load(s, dir, "lineitem")
    val part = graft.Tables.load(s, dir, "part")
    orders
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_orderkey"), col("c_custkey"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("p_type") === "ECONOMY", 1).otherwise(0)).as("n_economy"))
      .filter(col("n_economy") > 0)
      .withColumn("score", round(col("n_economy") / col("n_parts"), 6))
      .select(col("o_orderkey"), col("c_custkey"), col("n_parts"),
        col("n_economy"), col("score"))
      .orderBy(col("o_orderkey"))
  }

  private val q16Sql =
    """SELECT o_orderkey, c_custkey,
      |  count(*) AS n_parts,
      |  CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END) AS BIGINT) AS n_economy,
      |  round(sum(CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS score
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey < 5
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY o_orderkey, c_custkey
      |HAVING sum(CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END) > 0
      |ORDER BY o_orderkey""".stripMargin

  /** Unrolled BFS-with-paths levels (oracle side): level h keeps, per
    * newly reached node, the lexicographically smallest rendered path —
    * the exact mirror of GraphOps.multiHopPaths' per-level min aggregate
    * (no recursive path enumeration, so oracle cost stays polynomial). */
  private def pathLevelsSql(edgesRel: String, render: String,
      seed: String, maxHops: Int): String = {
    val levels = (1 to maxHops).map { h =>
      val prev = (0 until h).map(i => s"SELECT node_id FROM l$i").mkString(" UNION ALL ")
      s"""l$h AS (
         |  SELECT e.to_id AS node_id, $h AS hop, min($render) AS path
         |  FROM l${h - 1} l JOIN $edgesRel e ON e.from_id = l.node_id
         |  WHERE e.to_id NOT IN ($prev)
         |  GROUP BY e.to_id)""".stripMargin
    }
    val union = (0 to maxHops).map(i => s"SELECT * FROM l$i").mkString(" UNION ALL ")
    s"""l0 AS (SELECT $seed AS node_id, 0 AS hop, $seed AS path),
       |${levels.mkString(",\n")},
       |walkp AS ($union)""".stripMargin
  }

  // -- q71: multi-hop traversal WITH rendered paths
  //         (enhanced_mcp_endpoint.py:76-171: outgoing edges, relation +
  //         min-confidence filter, paths "[n1 --type--> n2]" capped at 50)
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val seeds = s.sql("SELECT 'o:15' AS node_id")
    GraphOps.multiHopPaths(KGraph.orientedMaterialized(s, dir, Outgoing), seeds,
        maxHops = 3, Outgoing, preOriented = true,
        edgeFilter = Some(col("confidence") >= 0.65 &&
          col("relation_type").isin("placed_by", "located_in", "contains",
            "part_of", "supplied_by")))
      .orderBy(col("hop"), col("path"), col("node_id"))
      .limit(50)
  }

  private val q71Sql =
    s"""$W,
       |fe AS (SELECT from_id, to_id, relation_type FROM edges
       |       WHERE confidence >= 0.65
       |         AND relation_type IN ('placed_by','located_in','contains',
       |                               'part_of','supplied_by')),
       |${pathLevelsSql("fe",
          "l.path || ' --' || e.relation_type || '--> ' || e.to_id",
          "'o:15'", 3)}
       |SELECT node_id, hop, path FROM walkp
       |ORDER BY hop, path, node_id LIMIT 50""".stripMargin

  // -- q72: shortest path WITH node-id path reconstruction (both
  //         directions, graph_storage_adapter.py:319-359 — the reference
  //         returns the node-id list; ties break lexicographically)
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val src = s.sql("SELECT 'c:1' AS node_id")
    GraphOps.shortestPaths(KGraph.orientedMaterialized(s, dir, Both), src,
        maxHops = 3, preOriented = true)
      .orderBy(col("node_id"))
  }

  private val q72Sql =
    s"""$W,
       |und AS (SELECT from_id, to_id FROM edges
       |        UNION ALL SELECT to_id, from_id FROM edges),
       |${pathLevelsSql("und", "l.path || ' > ' || e.to_id", "'c:1'", 3)}
       |SELECT node_id, hop, path FROM walkp ORDER BY node_id""".stripMargin

  // -- q94: per-node structural quality (quality_assessment.py
  //         StructuralQualityAnalyzer:415-625): connectivity tier,
  //         relationship quality, in/out balance centrality, type
  //         diversity tier → overall mean + level
  private def q94(s: SparkSession, dir: String): DataFrame =
    graft.graph.StructuralQuality.assess(KGraph.materialized(s, dir))
      .select(col("node_id"), col("n_rels"),
        round(col("connectivity"), 6).as("connectivity"),
        round(col("rel_quality"), 6).as("rel_quality"),
        round(col("centrality"), 6).as("centrality"),
        round(col("diversity"), 6).as("diversity"),
        round(col("overall_structural"), 6).as("overall_structural"),
        col("quality_level"))
      .orderBy(col("node_id"))

  private val q94Sql = {
    // exact milli-units mirror (see StructuralQuality.assess): integer
    // sums divide once, so rel_quality is float-order independent
    val relQ = """least(500 +
      |      CASE WHEN relation_type IN ('related_to', 'associated_with') THEN -200
      |           WHEN relation_type IN ('part_of', 'instance_of', 'causes', 'enables') THEN 300
      |           ELSE 0 END +
      |      CASE WHEN confidence IS NOT NULL AND confidence <> 0
      |           THEN CAST(round((confidence::DOUBLE) * 200) AS BIGINT) ELSE 0 END, 1000)""".stripMargin
    s"""$W,
       |inc AS (
       |  SELECT from_id AS node_id, 1 AS n_out, 0 AS n_in, relation_type,
       |    $relQ AS rel_q_milli
       |  FROM edges
       |  UNION ALL
       |  SELECT to_id, 0, 1, relation_type, $relQ FROM edges),
       |a AS (
       |  SELECT node_id, count(*) AS n_rels, sum(n_out) AS out_n,
       |    sum(n_in) AS in_n,
       |    CAST(sum(rel_q_milli) AS DOUBLE) / (count(*) * 1000) AS rel_quality,
       |    count(DISTINCT relation_type) AS n_types
       |  FROM inc GROUP BY node_id),
       |sc AS (
       |  SELECT node_id, n_rels, rel_quality,
       |    CASE WHEN n_rels = 1 THEN 0.3 WHEN n_rels <= 3 THEN 0.6
       |         WHEN n_rels <= 7 THEN 0.9 ELSE 1.0 END AS connectivity,
       |    (CASE WHEN greatest(in_n, out_n) > 0
       |          THEN least(in_n, out_n) * 1.0 / greatest(in_n, out_n)
       |          ELSE 0.0 END) * 0.7 +
       |      least(n_rels / 10.0, 1.0) * 0.3 AS centrality,
       |    CASE WHEN n_types * 1.0 / n_rels >= 0.8 THEN 1.0
       |         WHEN n_types * 1.0 / n_rels >= 0.6 THEN 0.8
       |         WHEN n_types * 1.0 / n_rels >= 0.4 THEN 0.6
       |         WHEN n_types * 1.0 / n_rels >= 0.2 THEN 0.4
       |         ELSE 0.2 END AS diversity
       |  FROM a)
       |SELECT node_id, n_rels,
       |  round(connectivity, 6) AS connectivity,
       |  round(rel_quality, 6) AS rel_quality,
       |  round(centrality, 6) AS centrality,
       |  round(diversity, 6) AS diversity,
       |  round((connectivity + rel_quality + centrality + diversity) / 4, 6)
       |    AS overall_structural,
       |  CASE WHEN (connectivity + rel_quality + centrality + diversity) / 4 >= 0.9 THEN 'excellent'
       |       WHEN (connectivity + rel_quality + centrality + diversity) / 4 >= 0.7 THEN 'good'
       |       WHEN (connectivity + rel_quality + centrality + diversity) / 4 >= 0.5 THEN 'fair'
       |       WHEN (connectivity + rel_quality + centrality + diversity) / 4 >= 0.3 THEN 'poor'
       |       ELSE 'critical' END AS quality_level
       |FROM sc ORDER BY node_id""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q11_neighbors_1hop", q11, Some(q11Sql)),
    Q("q12_multihop_bfs_in", q12, Some(q12Sql), headline = true),
    Q("q13_multihop_filtered", q13, Some(q13Sql)),
    Q("q14_shortest_path_len", q14, Some(q14Sql), headline = true),
    Q("q15_induced_subgraph", q15, Some(q15Sql)),
    Q("q16_pattern_match", q16, Some(q16Sql)),
    Q("q71_multihop_paths", q71, Some(q71Sql)),
    Q("q72_shortest_path_recon", q72, Some(q72Sql)),
    Q("q94_structural_quality", q94, Some(q94Sql)))
}
