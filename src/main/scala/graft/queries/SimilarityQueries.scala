package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.semantic.SimilarityJoins
import graft.text.{TextFunctions => TF}

/** Relationship-discovery similarity joins (SURVEY.md §2.3): SAME_SOURCE /
  * SAME_DOMAIN grouping, SIMILAR_TAGS / SIMILAR_CONTENT token Jaccard,
  * and the TEMPORAL_PROXIMITY range join.
  */
object SimilarityQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // -- q23: SAME_SOURCE / SAME_DOMAIN pair discovery, aggregated per group
  private def q23(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.groupPairCounts(docs(s, dir), Seq("source", "lang"))
      .select(col("source"), col("lang"), col("n"), col("n_pairs"))
      .orderBy(col("source"), col("lang"))

  private val q23Sql =
    """SELECT source, lang, count(*) AS n,
      |  CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
      |FROM documents GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  // -- q24: SIMILAR_TAGS — token-set Jaccard join blocked by source, with
  //         the reference's confidence formula. Prefix-filtered candidates
  //         (exact — identical output to the block cross product, verified
  //         by the unchanged exact oracle below).
  private def q24(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.prefixJaccardJoin(docs(s, dir), "source", "text", 0.7)
      .select(col("blk"), col("a_id"), col("b_id"),
        round(col("sim"), 6).as("sim"), round(col("confidence"), 6).as("confidence"))
      .orderBy(col("blk"), col("a_id"), col("b_id"))

  private val q24Sql =
    """WITH t AS (
      |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents)
      |SELECT blk, a_id, b_id, round(sim, 6) AS sim,
      |  round(least(0.95, 0.6 + (sim - 0.7) * 0.4), 6) AS confidence
      |FROM (
      |  SELECT a.source AS blk, a.doc_id AS a_id, b.doc_id AS b_id,
      |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
      |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
      |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
      |      ELSE 0.0 END AS sim
      |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id) x
      |WHERE sim > 0.7
      |ORDER BY blk, a_id, b_id""".stripMargin

  // -- q25: SIMILAR_CONTENT — stopworded token Jaccard, higher bar
  private def q25(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.prefixJaccardJoin(docs(s, dir), "lang", "text", 0.8,
        stopworded = true)
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("sim")), 6).as("avg_sim"))
      .orderBy(col("blk"))

  private val q25Sql = {
    val sw = TF.stopwords("en").map(w => s"'$w'").mkString(",")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    list_filter(list_distinct(string_split(text, ' ')),
       |      w -> w NOT IN ($sw)) AS toks
       |  FROM documents)
       |SELECT blk, count(*) AS n_pairs, round(avg(sim), 6) AS avg_sim
       |FROM (
       |  SELECT a.lang AS blk,
       |    CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
       |      THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
       |           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
       |      ELSE 0.0 END AS sim
       |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id) x
       |WHERE sim > 0.8
       |GROUP BY blk ORDER BY blk""".stripMargin
  }

  // -- q26: TEMPORAL_PROXIMITY range join — bucketed band join on
  //         (user, 300 s window), exact |Δt| predicate after
  private def q26(s: SparkSession, dir: String): DataFrame =
    SimilarityJoins.temporalProximity(Tables.load(s, dir, "events"),
        "user_id", "event_id", "ts", windowSec = 300L)
      .select(col("k").as("user_id"), col("a_id"), col("b_id"),
        col("delta_sec"), round(col("confidence"), 6).as("confidence"))
      .orderBy(col("user_id"), col("a_id"), col("b_id"))

  private val q26Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events)
      |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
      |  abs(a.sec - b.sec) AS delta_sec,
      |  round(greatest(0.5, 1.0 - abs(a.sec - b.sec) * 1.0 / 3600), 6) AS confidence
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(a.sec - b.sec) < 300
      |ORDER BY a.user_id, a_id, b_id""".stripMargin

  // -- q245: fuzzy name matching — record-linkage pass over part names:
  //          within each brand block, every pair whose Jaro–Winkler
  //          similarity clears 0.9 (the near-duplicate-entity screen a
  //          catalog runs before assigning canonical ids). Scoring is
  //          the native-codegen JaroWinklerExpr (`functions/expressions/
  //          JaroWinklerExpr.scala`, registered in SQL as
  //          `jaro_winkler`); the oracle is DuckDB's INDEPENDENT
  //          jaro_winkler_similarity — the semantics are cross-checked
  //          implementation-against-implementation, not against a twin
  //          of our own code. Scale shape: MULTI-PASS blocking (the
  //          standard record-linkage move) — candidates are pairs
  //          sharing (brand, FIRST name token) OR (brand, LAST name
  //          token), two equi-joins unioned and deduped, never a
  //          brand-wide |P|² (brand-only blocking benched 15× at 10×
  //          data; this key is ~linear because block sizes are bounded
  //          by brand × name-vocabulary). Recall vs the brand-wide
  //          sweep measured 100% on this corpus at two scales (a
  //          JW ≥ 0.9 pair of 5-word names virtually always agrees on
  //          the first or last word — the prefix boost rewards exactly
  //          that).
  private val JwThreshold = 0.9

  /** The blocked JW ≥ 0.9 pair sweep shared by q245 (the pair report)
    * and q254 (entity resolution over its transitive closure). */
  private def jwPairs(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        element_at(split(col("p_name"), " "), 1).as("t1"),
        element_at(split(col("p_name"), " "), -1).as("tl"))
    def legOn(t: String) = {
      val a = p.select(col("p_brand").as("brand"), col(t).as("tok"),
        col("p_partkey").as("a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("brand"), col(t).as("tok"),
        col("p_partkey").as("b"), col("p_name").as("name_b"))
      // score and threshold INSIDE the leg: the jw filter kills ~99.99%
      // of candidates map-side, so the cross-leg distinct shuffles only
      // survivors instead of every candidate pair (benched 2.4x at sf1.0)
      a.join(b, Seq("brand", "tok")).filter(col("a") < col("b"))
        .withColumn("jw", TF.jaroWinkler(col("name_a"), col("name_b")))
        .filter(col("jw") >= JwThreshold)
        .select(col("brand"), col("a"), col("b"), round(col("jw"), 6).as("jw"))
    }
    legOn("t1").unionByName(legOn("tl")).distinct()
  }

  private def q245(s: SparkSession, dir: String): DataFrame =
    jwPairs(s, dir).orderBy(col("brand"), col("a"), col("b"))

  /** DuckDB CTEs for [[jwPairs]] — defines `pairs(brand, a, b, jw)`. */
  private val jwPairCtes =
    s"""p AS (
       |  SELECT p_partkey, p_name, p_brand,
       |    string_split(p_name, ' ')[1] AS t1,
       |    string_split(p_name, ' ')[len(string_split(p_name, ' '))] AS tl
       |  FROM part),
       |leg1 AS (
       |  SELECT a.p_brand AS brand, a.p_partkey AS a, b.p_partkey AS b,
       |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.t1 = b.t1
       |    AND a.p_partkey < b.p_partkey
       |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $JwThreshold),
       |leg2 AS (
       |  SELECT a.p_brand AS brand, a.p_partkey AS a, b.p_partkey AS b,
       |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.tl = b.tl
       |    AND a.p_partkey < b.p_partkey
       |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= $JwThreshold),
       |pairs AS (
       |  SELECT DISTINCT brand, a, b, jw FROM (
       |    SELECT * FROM leg1 UNION ALL SELECT * FROM leg2))""".stripMargin

  private val q245Sql =
    s"""WITH $jwPairCtes
       |SELECT brand, a, b, jw FROM pairs
       |ORDER BY brand, a, b""".stripMargin

  // -- q254: entity resolution — the canonical-id assignment a catalog
  //          runs AFTER the q245 screen: transitive closure of the
  //          blocked JW pairs (two-phase star-contraction CC, O(log n)
  //          rounds), one entity per component labeled by its smallest
  //          member key, reported with membership and value spread.
  //          Composition is the point: pair generation never leaves
  //          the blocked equi-join legs, closure never touches names
  //          again (id-pair edges only), and the report aggregates are
  //          cluster-bounded. Singleton parts are already canonical and
  //          stay out of the report (n_members ≥ 2 by construction).
  private def q254(s: SparkSession, dir: String): DataFrame = {
    val edges = jwPairs(s, dir)
      .select(col("a").as("from_id"), col("b").as("to_id"))
    val cc = graft.graph.GraphOps.connectedComponents(edges)
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_retailprice"))
    cc.join(p, cc("node_id") === p("p_partkey"))
      .groupBy(col("component").as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("p_brand")).as("n_brands"),
        min_by(col("p_name"), col("p_partkey")).as("canonical_name"),
        min(col("p_retailprice")).as("price_min"),
        max(col("p_retailprice")).as("price_max"))
      .orderBy(col("entity_id"))
  }

  private val q254Sql =
    s"""WITH RECURSIVE $jwPairCtes,
       |und AS (
       |  SELECT a AS s, b AS t FROM pairs
       |  UNION SELECT b AS s, a AS t FROM pairs),
       |reach AS (
       |  SELECT s, t FROM und
       |  UNION
       |  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s
       |  WHERE u.t <> r.s),
       |comp AS (
       |  SELECT s AS pk, least(s, min(t)) AS entity_id
       |  FROM reach GROUP BY s)
       |SELECT c.entity_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
       |  arg_min(p.p_name, p.p_partkey) AS canonical_name,
       |  min(p.p_retailprice) AS price_min,
       |  max(p.p_retailprice) AS price_max
       |FROM comp c JOIN part p ON p.p_partkey = c.pk
       |GROUP BY c.entity_id ORDER BY c.entity_id""".stripMargin

  // -- q257: Fellegi–Sunter linkage weights (Fellegi & Sunter 1969) —
  //          the probabilistic-record-linkage calibration that turns
  //          q245's single JW screen into per-field evidence weights:
  //          over a deterministic 1-in-4 sample of the (brand, first-
  //          token) candidate block (the q176 integer pair-sampling
  //          scheme), pairs are labeled match/unmatch by the JW ≥ 0.9
  //          screen, and each comparison field — last name token, and
  //          a ±1 char length band (the components an address/name
  //          linkage would compare; TPC-H's type/size columns are
  //          independent of the name by construction, so they carry no
  //          linkage signal on this corpus) — gets
  //          m_f = P(agree|M), u_f = P(agree|U) and the log2 m/u
  //          agreement / disagreement weights. Exactness: m and u are
  //          micro6 rationals of exact counts; weights are the
  //          established micro-unit log quantization (round(log2·1e6))
  //          over EXACT integer cross-products, so both engines
  //          quantize the same real number; zero cells yield NULL
  //          (infinite evidence) on both. Scale shape: ONE sampled
  //          equi-join leg streamed into a 2-field × 4-cell aggregate —
  //          estimation needs a candidate sample, not the exhaustive
  //          pair union (the dial q245's notes document).
  private def q257(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        element_at(split(col("p_name"), " "), 1).as("t1"),
        element_at(split(col("p_name"), " "), -1).as("tl"))
    val a = p.select(col("p_brand").as("brand"), col("t1").as("tok"),
      col("p_partkey").as("a"), col("p_name").as("name_a"),
      col("tl").as("tl_a"))
    val b = p.select(col("p_brand").as("brand"), col("t1").as("tok"),
      col("p_partkey").as("b"), col("p_name").as("name_b"),
      col("tl").as("tl_b"))
    val cand = a.join(b, Seq("brand", "tok")).filter(col("a") < col("b"))
      .filter((col("a") * 31 + col("b")) % 4 === 0L)
      .withColumn("is_match",
        TF.jaroWinkler(col("name_a"), col("name_b")) >= JwThreshold)
    val fields = cand.select(col("is_match"),
        (col("tl_a") === col("tl_b")).as("agree"),
        lit("last_tok").as("field"))
      .unionByName(cand.select(col("is_match"),
        (abs(length(col("name_a")) - length(col("name_b"))) <= 1)
          .as("agree"),
        lit("len_band").as("field")))
    val counts = fields.groupBy(col("field"))
      .agg(sum(when(col("is_match"), 1L).otherwise(0L)).as("nm"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("nu"),
        sum(when(col("is_match") && col("agree"), 1L).otherwise(0L))
          .as("ma"),
        sum(when(!col("is_match") && col("agree"), 1L).otherwise(0L))
          .as("ua"))
    def w2(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(num > 0L && den > 0L,
        round(log2(num.cast("double") / den.cast("double")) *
          lit(1000000), 0).cast("long") / lit(1e6))
    counts.select(col("field"), col("nm").as("n_match"),
        col("nu").as("n_unmatch"),
        ExactRound.ratio6(col("ma"), col("nm")).as("m_prob"),
        ExactRound.ratio6(col("ua"), col("nu")).as("u_prob"),
        w2(col("ma") * col("nu"), col("ua") * col("nm")).as("w_agree"),
        w2((col("nm") - col("ma")) * col("nu"),
          (col("nu") - col("ua")) * col("nm")).as("w_disagree"))
      .orderBy(col("field"))
  }

  private val q257Sql = {
    import graft.functions.{ExactRound => ER}
    def w2(num: String, den: String) =
      s"""CASE WHEN ($num) > 0 AND ($den) > 0
         |  THEN CAST(round(log2(CAST($num AS DOUBLE) / CAST($den AS DOUBLE))
         |    * 1000000) AS BIGINT) / 1e6 END""".stripMargin
    s"""WITH p AS (
       |  SELECT p_partkey, p_name, p_brand,
       |    string_split(p_name, ' ')[1] AS t1,
       |    string_split(p_name, ' ')[len(string_split(p_name, ' '))] AS tl
       |  FROM part),
       |cand AS (
       |  SELECT jaro_winkler_similarity(a.p_name, b.p_name) >= $JwThreshold
       |      AS is_match,
       |    a.tl = b.tl AS tl_agree,
       |    abs(length(a.p_name) - length(b.p_name)) <= 1 AS len_agree
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.t1 = b.t1
       |    AND a.p_partkey < b.p_partkey
       |  WHERE (a.p_partkey * 31 + b.p_partkey) % 4 = 0),
       |fields AS (
       |  SELECT is_match, tl_agree AS agree, 'last_tok' AS field FROM cand
       |  UNION ALL
       |  SELECT is_match, len_agree, 'len_band' FROM cand),
       |counts AS (
       |  SELECT field,
       |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
       |    CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nu,
       |    CAST(sum(CASE WHEN is_match AND agree THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ma,
       |    CAST(sum(CASE WHEN NOT is_match AND agree THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ua
       |  FROM fields GROUP BY field)
       |SELECT field, nm AS n_match, nu AS n_unmatch,
       |  ${ER.sql.ratio6("ma", "nm")} AS m_prob,
       |  ${ER.sql.ratio6("ua", "nu")} AS u_prob,
       |  ${w2("ma * nu", "ua * nm")} AS w_agree,
       |  ${w2("(nm - ma) * nu", "(nu - ua) * nm")} AS w_disagree
       |FROM counts ORDER BY field""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q23_same_source_pairs", q23, Some(q23Sql)),
    Q("q24_tag_jaccard_join", q24, Some(q24Sql), headline = true),
    Q("q25_content_jaccard_sw", q25, Some(q25Sql)),
    Q("q26_temporal_proximity", q26, Some(q26Sql), headline = true),
    Q("q245_name_matching", q245, Some(q245Sql)),
    Q("q254_entity_resolution", q254, Some(q254Sql), headline = true),
    Q("q257_fellegi_sunter", q257, Some(q257Sql)))
}
