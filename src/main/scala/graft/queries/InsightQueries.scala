package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.{GraphOps, KGraph, NodeConstraints, PatternMatch, PatternSpec, RelationshipConstraints}
import graft.operators.{Anomalies, Perspectives, Ranking}
import graft.semantic.VectorSearch
import graft.text.{TextFunctions => TF}
import graft.functions.{VectorFunctions => VF}
import graft.engine.Lineage.LineageOps

/** Round-4 additions (SURVEY.md §2 gap closure): topic subgraph
  * extraction, generic pattern matching, the remaining anomaly detector
  * families (semantic / temporal / behavioral), perspective comparison
  * matrix + temporal evolution, and the last two ranking features
  * (diversity, metadata richness).
  */
object InsightQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  // Deterministic doc → graph-node mapping used by q73/q74: the synthetic
  // corpus has no native node ids, so docs are assigned to typed nodes
  // the way the reference's ingestion assigns extracted units to existing
  // entities (ingestion/knowledge_extraction merge step). Two docs may
  // share a node; node content is the min-doc_id text (deterministic).
  private val q73Map =
    when(col("doc_id") % 2 === 0,
      concat(lit("c:"), (col("doc_id") / 2).cast("long").cast("string")))
      .otherwise(concat(lit("n:"), (col("doc_id") % 25).cast("string")))
  private val q73MapSql =
    "CASE WHEN doc_id % 2 = 0 THEN 'c:'||(doc_id // 2) ELSE 'n:'||(doc_id % 25) END"

  // -- q73: topic subgraph extraction — semantic top-k (2·max_nodes,
  //         cap 100) → keyword-relevance filter (≥ 0.7) → top max_nodes →
  //         induced subgraph → density (enhanced_mcp_endpoint.py:174-268)
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val qvec = emb(s, dir).filter(col("vec_id") === 0).select(col("embedding"))
    val hits = VectorSearch.topK(emb(s, dir).filter(col("vec_id") =!= 0), qvec, 100)
      .select(col("vec_id").as("doc_id"))
      .join(docs(s, dir), "doc_id")
      .select(q73Map.as("node_id")).distinct()
    val nodeContent = docs(s, dir)
      .groupBy(q73Map.as("node_id"))
      .agg(min_by(col("text"), col("doc_id")).as("content"))
    GraphOps.topicSubgraph(KGraph.materialized(s, dir), nodeContent, hits,
        keywords = Seq("data", "table"), maxNodes = 50, minRelevance = 0.7)
      .select(col("from_id"), col("to_id"), col("relation_type"),
        col("n_nodes"), col("n_edges"), col("density"))
      .orderBy(col("from_id"), col("to_id"), col("relation_type"))
  }

  private val q73Sql =
    s"""WITH ${KGraph.edgesSql},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |hits AS (
       |  SELECT e.vec_id AS doc_id FROM embeddings e, q WHERE vec_id <> 0
       |  ORDER BY ${VF.sql.cosine("e.embedding", "qe")} DESC, vec_id LIMIT 100),
       |nc AS (
       |  SELECT $q73MapSql AS node_id, arg_min(text, doc_id) AS content
       |  FROM documents GROUP BY 1),
       |hn AS (
       |  SELECT DISTINCT $q73MapSql AS node_id
       |  FROM hits JOIN documents USING (doc_id)),
       |kept AS (
       |  SELECT node_id FROM (
       |    SELECT h.node_id,
       |      (CASE WHEN contains(content, 'data') THEN 1 ELSE 0 END +
       |       CASE WHEN contains(content, 'table') THEN 1 ELSE 0 END) / 2.0 AS relevance
       |    FROM hn h JOIN nc USING (node_id)) x
       |  WHERE relevance >= 0.7
       |  ORDER BY relevance DESC, node_id LIMIT 50),
       |sub AS (
       |  SELECT from_id, to_id, relation_type FROM edges
       |  WHERE from_id IN (SELECT node_id FROM kept)
       |    AND to_id IN (SELECT node_id FROM kept))
       |SELECT from_id, to_id, relation_type,
       |  (SELECT count(*) FROM kept) AS n_nodes,
       |  (SELECT count(*) FROM sub) AS n_edges,
       |  (SELECT count(*) FROM sub) * 1.0 /
       |    greatest((SELECT count(*) FROM kept), 1) AS density
       |FROM sub ORDER BY from_id, to_id, relation_type""".stripMargin

  // -- q74: generic PatternSpec matching — node constraints (content /
  //         truthfulness / source / length) + relationship participation
  //         (outgoing located_in AND incoming placed_by) + reference
  //         scoring, top 20 (enhanced_mcp_endpoint.py:270-345, :687-740).
  //         Docs map to customer/supplier nodes; suppliers fail the
  //         incoming placed_by constraint, exercising the semi-join.
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val nodes = docs(s, dir).select(
      when(col("doc_id") % 2 === 0, concat(lit("c:"), col("doc_id").cast("string")))
        .otherwise(concat(lit("s:"), col("doc_id").cast("string"))).as("node_id"),
      col("text").as("content"), col("source"),
      (((col("doc_id") * 37) % 100) / lit(100.0)).as("truthfulness"),
      least(col("n_chars") / lit(500.0), lit(1.0)).as("richness"))
    val spec = PatternSpec(
      NodeConstraints(contentContains = Some("join"),
        minTruthfulness = Some(0.3), sourceContains = Some("src1"),
        contentLengthMin = Some(150)),
      RelationshipConstraints(outgoingRelationType = Some("located_in"),
        incomingRelationType = Some("placed_by")),
      maxResults = 20)
    PatternMatch.matches(nodes, KGraph.materialized(s, dir), spec)
      .select(col("node_id"), round(col("truthfulness"), 6).as("truthfulness"),
        round(col("richness"), 6).as("richness"),
        round(col("pattern_score"), 6).as("pattern_score"))
      .orderBy(col("pattern_score").desc, col("node_id"))
  }

  private val q74Sql =
    s"""WITH ${KGraph.edgesSql},
       |nodes AS (
       |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'c:'||doc_id ELSE 's:'||doc_id END AS node_id,
       |    text AS content, source,
       |    ((doc_id * 37) % 100) / 100.0 AS truthfulness,
       |    least(n_chars / 500.0, 1.0) AS richness
       |  FROM documents),
       |matched AS (
       |  SELECT * FROM nodes n
       |  WHERE contains(content, 'join') AND truthfulness >= 0.3
       |    AND contains(source, 'src1') AND len(content) >= 150
       |    AND EXISTS (SELECT 1 FROM edges e
       |          WHERE e.relation_type = 'located_in' AND e.from_id = n.node_id)
       |    AND EXISTS (SELECT 1 FROM edges e
       |          WHERE e.relation_type = 'placed_by' AND e.to_id = n.node_id))
       |SELECT node_id, round(truthfulness, 6) AS truthfulness,
       |  round(richness, 6) AS richness,
       |  round(least(1.0, truthfulness * 0.3 + richness * 0.2 + 0.5), 6) AS pattern_score
       |FROM matched
       |ORDER BY least(1.0, truthfulness * 0.3 + richness * 0.2 + 0.5) DESC, node_id
       |LIMIT 20""".stripMargin

  // -- q75: semantic anomaly — within source groups whose avg pairwise
  //         token-Jaccard is low, members far from the rest of the group
  //         (insight_discovery.py:1579-1621, :1843-1900; thresholds tuned
  //         to the corpus's similarity floor — the reference's 0.2/0.15
  //         target free-text corpora)
  private def q75(s: SparkSession, dir: String): DataFrame =
    Anomalies.semanticOutliers(docs(s, dir), "source", "doc_id", "text",
        minGroup = 3, groupAvgBelow = 0.6, nodeAvgBelow = 0.3)
      .select(col("grp"), col("id"), round(col("avg_sim"), 6).as("avg_sim"),
        round(col("grp_avg"), 6).as("grp_avg"), col("n"))
      .orderBy(col("grp"), col("id"))

  private val q75Sql =
    """WITH t AS (
      |  SELECT source, doc_id, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents),
      |p AS (
      |  SELECT a.source AS grp, a.doc_id AS id,
      |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
      |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
      |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      ELSE 0.0 END AS jac
      |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id <> b.doc_id),
      |pn AS (SELECT grp, id, avg(jac) AS avg_sim FROM p GROUP BY 1, 2),
      |gs AS (SELECT grp, avg(avg_sim) AS grp_avg, count(*) AS n FROM pn GROUP BY 1)
      |SELECT pn.grp, pn.id, round(avg_sim, 6) AS avg_sim,
      |  round(grp_avg, 6) AS grp_avg, n
      |FROM pn JOIN gs ON pn.grp = gs.grp
      |WHERE n >= 3 AND grp_avg < 0.6 AND avg_sim < 0.3
      |ORDER BY pn.grp, pn.id""".stripMargin

  // -- q76: temporal anomaly — per-user daily activity bursts (> μ+3σ)
  //         and gaps (≥ 2 consecutive missing days inside the span)
  //         (insight_discovery.py:1652-1734 re-expressed as series form)
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val series = events(s, dir)
      .groupBy(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("idx"))
      .agg(count(lit(1)).as("cnt"))
    Anomalies.temporalGapsBursts(series, "user_id", "idx", "cnt",
        sigmaK = 3.0, minGap = 2)
      .select(col("k"), col("kind"), col("start_idx"), col("end_idx"),
        col("len"), round(col("severity"), 6).as("severity"))
      .orderBy(col("k"), col("kind"), col("start_idx"))
  }

  private val q76Sql =
    """WITH s AS (
      |  SELECT user_id AS k,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT k, avg(cnt) AS mu, stddev(cnt) AS sigma FROM s GROUP BY 1),
      |bursts AS (
      |  SELECT s.k, 'burst' AS kind, idx AS start_idx, idx AS end_idx,
      |    CAST(1 AS BIGINT) AS len,
      |    least((cnt - mu) / sigma / 5, 1.0) AS severity
      |  FROM s JOIN st ON s.k = st.k
      |  WHERE sigma > 0 AND cnt > mu + 3 * sigma),
      |gaps AS (
      |  SELECT k, 'gap' AS kind, prev + 1 AS start_idx, idx - 1 AS end_idx,
      |    idx - prev - 1 AS len, least((idx - prev - 1) / 30.0, 1.0) AS severity
      |  FROM (SELECT k, idx, lag(idx) OVER (PARTITION BY k ORDER BY idx) AS prev FROM s)
      |  WHERE prev IS NOT NULL AND idx - prev - 1 >= 2)
      |SELECT k, kind, start_idx, end_idx, len, round(severity, 6) AS severity
      |FROM (SELECT * FROM bursts UNION ALL SELECT * FROM gaps)
      |ORDER BY k, kind, start_idx""".stripMargin

  // -- q77: behavioral anomaly — per-node relationship-behavior signature
  //         vs global averages (insight_discovery.py:1736-1791, :1937-1983)
  private def q77(s: SparkSession, dir: String): DataFrame =
    Anomalies.behavioralOutliers(KGraph.materialized(s, dir))
      .select(col("node_id"), col("total_rel"), col("uniq_types"),
        col("reason"), round(col("severity"), 6).as("severity"))
      .orderBy(col("node_id"))

  private val q77Sql =
    s"""WITH ${KGraph.edgesSql},
       |rels AS (
       |  SELECT from_id AS node_id, relation_type FROM edges
       |  UNION ALL SELECT to_id, relation_type FROM edges),
       |sig AS (
       |  SELECT node_id, count(*) AS total_rel,
       |    count(DISTINCT relation_type) AS uniq_types
       |  FROM rels GROUP BY 1),
       |avgs AS (SELECT avg(total_rel) AS avg_rel, avg(uniq_types) AS avg_uniq FROM sig)
       |SELECT node_id, total_rel, uniq_types,
       |  concat_ws(', ',
       |    CASE WHEN total_rel > avg_rel * 3 THEN 'excessive_relationships' END,
       |    CASE WHEN total_rel > 0 AND total_rel < avg_rel * 0.1
       |         THEN 'minimal_relationships' END,
       |    CASE WHEN uniq_types > avg_uniq * 2
       |         THEN 'excessive_relationship_diversity' END) AS reason,
       |  round(greatest(
       |    CASE WHEN total_rel > avg_rel * 3
       |         THEN least(total_rel / avg_rel / 5, 1.0) ELSE 0.0 END,
       |    CASE WHEN total_rel > 0 AND total_rel < avg_rel * 0.1
       |         THEN 0.6 ELSE 0.0 END,
       |    CASE WHEN uniq_types > avg_uniq * 2
       |         THEN least(uniq_types / avg_uniq / 3, 1.0) ELSE 0.0 END), 6) AS severity
       |FROM sig, avgs
       |WHERE total_rel > avg_rel * 3
       |   OR (total_rel > 0 AND total_rel < avg_rel * 0.1)
       |   OR uniq_types > avg_uniq * 2
       |ORDER BY node_id""".stripMargin

  // -- q78: perspective comparison matrix — (source = topic, lang =
  //         perspective) groups; sim = 0.5·viewpoint-token Jaccard +
  //         0.3·key-claims Jaccard (+ 0.2·evidence overlap = 0, disjoint
  //         groups) (perspective_analysis.py:1083-1144)
  private def q78(s: SparkSession, dir: String): DataFrame =
    Perspectives.comparisonMatrix(docs(s, dir), "source", "lang", "text",
        claimMin = 3)
      .select(col("topic"), col("a_persp"), col("b_persp"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("topic"), col("a_persp"), col("b_persp"))

  private val q78Sql =
    """WITH counts AS (
      |  SELECT source AS topic, lang AS persp, t.tok, count(*) AS cnt
      |  FROM documents, unnest(list_distinct(string_split(text, ' '))) AS t(tok)
      |  GROUP BY 1, 2, 3),
      |sets AS (
      |  SELECT topic, persp, list(tok) AS toks,
      |    list(tok) FILTER (cnt >= 3) AS claims
      |  FROM counts GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.topic, a.persp AS a_persp, b.persp AS b_persp,
      |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
      |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
      |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      ELSE 0.0 END AS jt,
      |    CASE WHEN (len(a.claims) + len(b.claims) - len(list_intersect(a.claims, b.claims))) > 0
      |      THEN len(list_intersect(a.claims, b.claims)) * 1.0 /
      |           (len(a.claims) + len(b.claims) - len(list_intersect(a.claims, b.claims)))
      |      ELSE 0.0 END AS jc
      |  FROM sets a JOIN sets b ON a.topic = b.topic AND a.persp < b.persp)
      |SELECT topic, a_persp, b_persp, round(jt * 0.5 + jc * 0.3, 6) AS sim
      |FROM pairs ORDER BY topic, a_persp, b_persp""".stripMargin

  // -- q79: temporal perspective evolution — per event_type (topic), the
  //         daily active-user set is the period perspective; consecutive-
  //         period Jaccard, trend classification + turning-point count
  //         (perspective_analysis.py:1693-1812)
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val periodSets = events(s, dir)
      .groupBy(col("event_type").as("topic"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("period"))
      .agg(collect_set(col("user_id").cast("string")).as("toks"))
    Perspectives.temporalEvolution(periodSets)
      .select(col("topic"), col("n_periods"),
        round(col("avg_sim"), 6).as("avg_sim"), col("trend"),
        col("n_turning").cast("long").as("n_turning"))
      .orderBy(col("topic"))
  }

  private val q79Sql =
    """WITH ps AS (
      |  SELECT event_type AS topic,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS period,
      |    list_distinct(list((user_id)::VARCHAR)) AS toks
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT topic, period, toks,
      |    lag(toks) OVER (PARTITION BY topic ORDER BY period) AS pt
      |  FROM ps),
      |sims AS (
      |  SELECT topic, period,
      |    CASE WHEN pt IS NULL THEN NULL
      |      WHEN (len(toks) + len(pt) - len(list_intersect(toks, pt))) > 0
      |      THEN len(list_intersect(toks, pt)) * 1.0 /
      |           (len(toks) + len(pt) - len(list_intersect(toks, pt)))
      |      ELSE 0.0 END AS sim
      |  FROM w),
      |d AS (
      |  SELECT topic, sim,
      |    lead(sim) OVER (PARTITION BY topic ORDER BY period) AS next_sim
      |  FROM sims),
      |agg AS (
      |  SELECT topic, count(*) AS n_periods, avg(sim) AS avg_sim,
      |    max(next_sim - sim) AS max_d, min(next_sim - sim) AS min_d,
      |    CAST(sum(CASE WHEN sim IS NOT NULL AND next_sim IS NOT NULL
      |      AND abs(sim - next_sim) > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
      |  FROM d GROUP BY 1)
      |SELECT topic, n_periods, round(avg_sim, 6) AS avg_sim,
      |  CASE WHEN n_periods < 3 THEN 'insufficient_data'
      |       WHEN avg_sim > 0.7 THEN 'stable'
      |       WHEN max_d < 0 THEN 'converging'
      |       WHEN min_d > 0 THEN 'diverging'
      |       ELSE 'cyclical' END AS trend,
      |  n_turning
      |FROM agg ORDER BY topic""".stripMargin

  // -- q80: diversity feature score — 1 − avg token-Jaccard vs the other
  //         members of the top-50 result set (result_ranker.py:495-540);
  //         all-pairs over k ≤ 50 results, bounded by construction
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val top = AnalyticsQueries.ranked(s, dir)
      .select(col("doc_id"), TF.distinctTokens(col("text")).as("toks"))
      .truncateLineage() // 50 rows; both self-join sides reuse it
    val a = top.select(col("doc_id").as("a_id"), col("toks").as("a"))
    val b = top.select(col("doc_id").as("b_id"), col("toks").as("b"))
    a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .withColumn("jac", TF.jaccardSim(col("a"), col("b")))
      .groupBy(col("a_id").as("doc_id"))
      .agg(greatest(lit(0.0), lit(1.0) - avg(col("jac"))).as("diversity"))
      .select(col("doc_id"), round(col("diversity"), 6).as("diversity"))
      .orderBy(col("doc_id"))
  }

  private val q80Sql =
    s"""WITH ${AnalyticsQueries.rankedSql},
       |cand AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM topk),
       |pairs AS (
       |  SELECT a.doc_id,
       |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
       |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
       |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
       |      ELSE 0.0 END AS jac
       |  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id)
       |SELECT doc_id, round(greatest(0.0, 1.0 - avg(jac)), 6) AS diversity
       |FROM pairs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -- q81: metadata richness score — meaningful standard fields + capped
  //         custom-field bonus, / 8, capped at 1 (result_ranker.py:459-493
  //         mapped onto the synthetic document schema)
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val standard = Seq(
      when(col("source").isNotNull, 1).otherwise(0),
      when(col("lang").isNotNull, 1).otherwise(0),
      when(col("n_chars") > 0, 1).otherwise(0),
      when(col("text").contains("data"), 1).otherwise(0),
      when(col("text").contains("table"), 1).otherwise(0)).reduce(_ + _)
    val custom = least(
      Seq("join", "key", "row")
        .map(t => when(col("text").contains(t), 1).otherwise(0))
        .reduce(_ + _), lit(3))
    docs(s, dir)
      .withColumn("n_fields", standard + custom)
      .select(col("doc_id"), col("n_fields"),
        round(Ranking.metadataRichness(col("n_fields")), 6).as("richness"))
      .orderBy(col("doc_id"))
  }

  private val q81Sql =
    """SELECT doc_id,
      |  ((CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END) +
      |   (CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END) +
      |   (CASE WHEN n_chars > 0 THEN 1 ELSE 0 END) +
      |   (CASE WHEN contains(text, 'data') THEN 1 ELSE 0 END) +
      |   (CASE WHEN contains(text, 'table') THEN 1 ELSE 0 END) +
      |   least((CASE WHEN contains(text, 'join') THEN 1 ELSE 0 END) +
      |         (CASE WHEN contains(text, 'key') THEN 1 ELSE 0 END) +
      |         (CASE WHEN contains(text, 'row') THEN 1 ELSE 0 END), 3)) AS n_fields,
      |  round(least(((CASE WHEN source IS NOT NULL THEN 1 ELSE 0 END) +
      |   (CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END) +
      |   (CASE WHEN n_chars > 0 THEN 1 ELSE 0 END) +
      |   (CASE WHEN contains(text, 'data') THEN 1 ELSE 0 END) +
      |   (CASE WHEN contains(text, 'table') THEN 1 ELSE 0 END) +
      |   least((CASE WHEN contains(text, 'join') THEN 1 ELSE 0 END) +
      |         (CASE WHEN contains(text, 'key') THEN 1 ELSE 0 END) +
      |         (CASE WHEN contains(text, 'row') THEN 1 ELSE 0 END), 3)) / 8.0, 1.0), 6)
      |    AS richness
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q82: batch revert-to-previous-state (revision_manager.py:322-362)
  //         — per object (user), the reverted state is the second-most-
  //         recent revision's value; <2 revisions keep current. One
  //         window pass replaces the reference's per-object loop.
  private def q82(s: SparkSession, dir: String): DataFrame =
    graft.versioning.Snapshots.revertToPrevious(
        events(s, dir).withColumn("sec", unix_timestamp(col("ts"))),
        "user_id", "sec", "event_id", Seq("value"))
      .select(col("user_id"), round(col("cur_value"), 6).as("cur_value"),
        round(col("reverted_value"), 6).as("reverted_value"), col("reverted"))
      .orderBy(col("user_id"))

  private val q82Sql =
    """WITH r AS (
      |  SELECT user_id, value,
      |    row_number() OVER w AS rn,
      |    lead(sec) OVER w AS prev_sec,
      |    lead(value) OVER w AS prev_value
      |  FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec DESC, event_id DESC))
      |SELECT user_id, round(value, 6) AS cur_value,
      |  round(CASE WHEN prev_sec IS NOT NULL THEN prev_value ELSE value END, 6)
      |    AS reverted_value,
      |  prev_sec IS NOT NULL AS reverted
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- q83: include_relationships enrichment + nested projection
  //         (query_engine.py:361, :435-440) — each result node carries a
  //         sorted relationships array; the nested projection keeps
  //         (direction, other_id, relation_type) and drops confidence.
  //         Rendered to a string so the oracle hash sees the nested data.
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val results = Tables.load(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node_id"))
    val enriched = graft.operators.Projections.includeRelationships(
      results, KGraph.materialized(s, dir))
    graft.operators.Projections.projectNested(enriched, "relationships",
        Seq("direction", "other_id", "relation_type"))
      .select(col("node_id"),
        size(col("relationships")).as("n_rels"),
        array_join(expr(
          "transform(relationships, x -> concat_ws(':', x.direction, x.other_id, x.relation_type))"),
          "|").as("rels_str"))
      .orderBy(col("node_id"))
  }

  private val q83Sql =
    s"""WITH ${KGraph.edgesSql},
       |results AS (
       |  SELECT 'c:'||c_custkey AS node_id FROM customer WHERE c_acctbal > 9000),
       |bi AS (
       |  SELECT from_id AS node_id, 'out' AS direction, to_id AS other_id,
       |    relation_type, confidence FROM edges
       |  UNION ALL
       |  SELECT to_id, 'in', from_id, relation_type, confidence FROM edges),
       |rels AS (
       |  SELECT node_id,
       |    list(direction || ':' || other_id || ':' || relation_type
       |      ORDER BY direction, other_id, relation_type, confidence) AS rl
       |  FROM bi GROUP BY node_id)
       |SELECT r.node_id,
       |  CAST(coalesce(len(rl), 0) AS INT) AS n_rels,
       |  coalesce(array_to_string(rl, '|'), '') AS rels_str
       |FROM results r LEFT JOIN rels USING (node_id)
       |ORDER BY r.node_id""".stripMargin

  // -- q86: full popularity score (result_ranker.py:379-411) — 0.1 floor,
  //         log base, recent-access boost min(recent/10, 0.2) — over
  //         per-user access stats derived from the event log
  private def q86(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("access_count"),
        sum(when(col("ts") >= "2024-01-24", 1).otherwise(0)).as("recent_count"))
      .select(col("user_id"), col("access_count"), col("recent_count"),
        round(Ranking.popularityFull(col("access_count"), col("recent_count")), 6)
          .as("popularity"))
      .orderBy(col("user_id"))

  private val q86Sql =
    """SELECT user_id, access_count, recent_count,
      |  round(CASE WHEN access_count = 0 THEN 0.1
      |    ELSE least(least(ln(access_count + 1) / ln(100), 1.0) +
      |      (CASE WHEN recent_count > 0
      |         THEN least(recent_count / 10.0, 0.2) ELSE 0.0 END), 1.0)
      |    END, 6) AS popularity
      |FROM (
      |  SELECT user_id, count(*) AS access_count,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-24' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS recent_count
      |  FROM events GROUP BY user_id) x
      |ORDER BY user_id""".stripMargin

  // -- q87: text-query relevance (result_ranker.py:247-264): exact-phrase
  //         containment → 1.0, else matched query words / |query words|
  private def q87(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        round(Ranking.textRelevance(col("text"), "fast data table"), 6)
          .as("relevance"))
      .orderBy(col("doc_id"))

  private val q87Sql =
    """SELECT doc_id,
      |  round(CASE WHEN contains(lower(text), 'fast data table') THEN 1.0
      |    ELSE ((CASE WHEN list_contains(string_split(lower(text), ' '), 'fast') THEN 1 ELSE 0 END) +
      |          (CASE WHEN list_contains(string_split(lower(text), ' '), 'data') THEN 1 ELSE 0 END) +
      |          (CASE WHEN list_contains(string_split(lower(text), ' '), 'table') THEN 1 ELSE 0 END)) / 3.0
      |    END, 6) AS relevance
      |FROM documents ORDER BY doc_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q73_topic_subgraph", q73, Some(q73Sql), headline = true),
    Q("q74_pattern_spec", q74, Some(q74Sql)),
    Q("q75_semantic_outliers", q75, Some(q75Sql)),
    Q("q76_temporal_gaps_bursts", q76, Some(q76Sql)),
    Q("q77_behavioral_anomaly", q77, Some(q77Sql)),
    Q("q78_perspective_matrix", q78, Some(q78Sql), headline = true),
    Q("q79_perspective_evolution", q79, Some(q79Sql)),
    Q("q80_diversity_feature", q80, Some(q80Sql)),
    Q("q81_metadata_richness", q81, Some(q81Sql)),
    Q("q82_snapshot_revert", q82, Some(q82Sql)),
    Q("q83_include_relationships", q83, Some(q83Sql)),
    Q("q86_rank_popularity_full", q86, Some(q86Sql)),
    Q("q87_rank_text_relevance", q87, Some(q87Sql)))
}
