package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{VectorFunctions => VF}
import graft.text.{TextFunctions => TF}

/** Knowledge-synthesis pipelines (SURVEY.md §3.3): the answer_question
  * evidence pipeline (enhanced_mcp_endpoint.py:505-587 — semantic top-k
  * → related-evidence expansion → quality-sorted, capped) and timeline
  * synthesis (:751-855), as single declarative plans.
  */
object SynthesisQueries {

  // -- q67: QA evidence — semantic top-10 (query = vec 0) → expand to
  //         same-source docs → quality-ranked top 20 with evidence type
  private def q67(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val docs = Tables.load(s, dir, "documents")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val top = emb.crossJoin(broadcast(qv))
      .withColumn("sim", VF.cosine(col("embedding"), col("qvec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id").as("doc_id"), col("sim"))
    val srcs = docs.join(top, "doc_id").select(col("source")).distinct()
    docs.join(srcs, "source") // expansion: same-source evidence candidates
      .join(top, Seq("doc_id"), "left_outer")
      .withColumn("evidence_type",
        when(col("sim").isNotNull, "direct").otherwise("expanded"))
      .withColumn("quality", TF.qualityScore(col("text"), col("n_chars")))
      .select(col("doc_id"), col("source"), col("evidence_type"),
        round(col("quality"), 6).as("quality"),
        round(coalesce(col("sim"), lit(0.0)), 6).as("sim"))
      .orderBy(col("quality").desc, col("doc_id"))
      .limit(20)
  }

  private val q67Sql =
    s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
       |top AS (
       |  SELECT e.vec_id AS doc_id,
       |    ${VF.sql.cosine("e.embedding", "q.embedding")} AS sim
       |  FROM embeddings e, q
       |  ORDER BY sim DESC, e.vec_id LIMIT 10),
       |srcs AS (SELECT DISTINCT source FROM documents JOIN top USING (doc_id))
       |SELECT d.doc_id, d.source,
       |  CASE WHEN t.doc_id IS NOT NULL THEN 'direct' ELSE 'expanded' END AS evidence_type,
       |  round(${TF.sql.qualityScore("d.text", "d.n_chars")}, 6) AS quality,
       |  round(coalesce(t.sim, 0.0), 6) AS sim
       |FROM documents d JOIN srcs USING (source)
       |LEFT JOIN top t ON d.doc_id = t.doc_id
       |-- both sides order by the ROUNDED quality alias (Spark's orderBy
       |-- follows the select, so it too resolves the rounded column) with
       |-- doc_id tiebreak — deterministic and identical at the LIMIT edge
       |ORDER BY quality DESC, d.doc_id LIMIT 20""".stripMargin

  // -- q68: timeline synthesis per user — span, activity, dominant event
  //         type, largest inactivity gap
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_type"))
    val spans = ev
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(wLag))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("sec")).as("first_sec"), max(col("sec")).as("last_sec"),
        (max(col("sec")) - min(col("sec"))).as("span_sec"),
        max(col("gap")).as("max_gap_sec"))
    val wTop = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("event_type"))
    val dominant = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("dominant_type"))
    spans.join(dominant, "user_id")
      .select(col("user_id"), col("n_events"), col("first_sec"), col("last_sec"),
        col("span_sec"), col("max_gap_sec"), col("dominant_type"))
      .orderBy(col("user_id"))
  }

  private val q68Sql =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |  FROM events),
      |gaps AS (
      |  SELECT user_id, sec,
      |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_type) AS gap
      |  FROM ev),
      |spans AS (
      |  SELECT user_id, count(*) AS n_events, min(sec) AS first_sec,
      |    max(sec) AS last_sec, max(sec) - min(sec) AS span_sec,
      |    max(gap) AS max_gap_sec
      |  FROM gaps GROUP BY user_id),
      |dom AS (
      |  SELECT user_id, event_type AS dominant_type FROM (
      |    SELECT user_id, event_type, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
      |    FROM ev GROUP BY user_id, event_type) x
      |  WHERE rn = 1)
      |SELECT s.user_id, s.n_events, s.first_sec, s.last_sec, s.span_sec,
      |  s.max_gap_sec, d.dominant_type
      |FROM spans s JOIN dom d USING (user_id)
      |ORDER BY s.user_id""".stripMargin

  // Deterministic node selection shared by q84/q85 — the analog of the
  // reference's caller-supplied node_ids list (synthesize_knowledge takes
  // an explicit bounded set); confidence derives like q74's truthfulness.
  private def selected(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 25 === 0)
      .select(concat(lit("d:"), col("doc_id").cast("string")).as("node_id"),
        col("text").as("content"), col("source"),
        (((col("doc_id") * 37) % 100) / lit(100.0)).as("confidence"))

  private val selectedSql =
    """sel AS (
      |  SELECT 'd:'||doc_id AS node_id, text AS content, source,
      |    ((doc_id * 37) % 100) / 100.0 AS confidence
      |  FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  // -- q84: summary synthesis — set stats + top-10 first-sentence points
  //         (enhanced_mcp_endpoint.py:751-783)
  private def q84(s: SparkSession, dir: String): DataFrame =
    graft.operators.Synthesis.summary(selected(s, dir))
      .select(col("node_id"), col("point"), col("nodes_processed"),
        col("n_sources"),
        round(col("average_confidence"), 6).as("average_confidence"),
        col("total_content_length"))
      .orderBy(col("node_id"))

  private val q84Sql =
    s"""WITH $selectedSql,
       |stats AS (
       |  SELECT count(*) AS nodes_processed,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |    round(avg(confidence), 6) AS average_confidence,
       |    CAST(sum(len(content)) AS BIGINT) AS total_content_length
       |  FROM sel),
       |points AS (
       |  SELECT node_id, split_part(content, '.', 1) || '.' AS point
       |  FROM sel WHERE len(split_part(content, '.', 1) || '.') > 20
       |  ORDER BY node_id LIMIT 10)
       |SELECT node_id, point, nodes_processed, n_sources,
       |  average_confidence, total_content_length
       |FROM points, stats ORDER BY node_id""".stripMargin

  // -- q85: comparison synthesis — pairwise confidence diff, source
  //         match, word-overlap similarity (enhanced_mcp_endpoint
  //         .py:785-817, :935-947) over the bounded selection
  private def q85(s: SparkSession, dir: String): DataFrame =
    graft.operators.Synthesis.comparison(selected(s, dir))
      .select(col("a_id"), col("b_id"),
        round(col("confidence_diff"), 6).as("confidence_diff"),
        col("source_match"),
        round(col("content_similarity"), 6).as("content_similarity"))
      .orderBy(col("a_id"), col("b_id"))

  private val q85Sql =
    s"""WITH $selectedSql,
       |t AS (
       |  SELECT node_id, source, confidence,
       |    list_distinct(string_split(lower(content), ' ')) AS toks
       |  FROM sel)
       |SELECT a.node_id AS a_id, b.node_id AS b_id,
       |  round(abs(a.confidence - b.confidence), 6) AS confidence_diff,
       |  a.source = b.source AS source_match,
       |  round(CASE WHEN (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0
       |    THEN len(list_intersect(a.toks, b.toks)) * 1.0 /
       |         (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
       |    ELSE 0.0 END, 6) AS content_similarity
       |FROM t a JOIN t b ON a.node_id < b.node_id
       |ORDER BY a_id, b_id""".stripMargin

  // -- q104: QuestionParser taxonomy (question_answering.py:88-308).
  //    Ten deterministic question templates (one per doc, chosen by
  //    doc_id%10, most splicing the doc's first token) cover all eight
  //    question types plus the factual default, entity extraction
  //    (proper nouns + quoted strings), keyword filtering, intent
  //    rendering, time/limit constraints and the confidence formula.
  //    Templates with `None` take no corpus token.
  private val QTemplates: Seq[(String, Option[String])] = Seq(
    ("What is the Spark Engine doing with ", Some(" today?")),
    ("Compare Alpha Core versus Beta Cache for ", Some(" workloads")),
    ("Why does the Query Planner fail on ", Some(" inputs?")),
    ("How to tune the Shuffle Stage for ", Some(" spill?")),
    ("When did the Batch Window move before 2020 rollout?", None),
    ("Define the meaning of ", Some(" in simple terms")),
    ("How is the Page Pool related to the Disk Layer?", None),
    ("What patterns in the data reveal trends for ", Some("?")),
    ("Show the 3 most common faults in 2021 during rollout windows", None),
    ("Tell me about \"silver lining\" and Hadoop platforms", None))

  private def q104(s: SparkSession, dir: String): DataFrame = {
    import graft.query.QuestionParser
    val id = col("doc_id")
    val w = regexp_extract(col("text"), "^[a-z]+", 0)
    val question = QTemplates.zipWithIndex
      .foldLeft(when(lit(false), "never")) {
        case (acc, ((pre, post), i)) =>
          acc.when(id % 10 === i, post match {
            case Some(p) => concat(lit(pre), w, lit(p))
            case None => lit(pre)
          })
      }.otherwise("unreachable")
    QuestionParser.parse(
        Tables.load(s, dir, "documents").select(id, question.as("question")),
        "question")
      .select(col("doc_id"), col("question"), col("question_type"),
        array_join(col("entities"), "|").as("entities"),
        array_join(col("keywords"), "|").as("keywords"),
        col("intent"), col("time_filter"), col("limit_n"),
        round(col("parsing_confidence"), 6).as("parsing_confidence"))
      .orderBy(col("doc_id"))
  }

  private val q104Sql = {
    import graft.query.QuestionParser._
    val qCase = QTemplates.zipWithIndex.map { case ((pre, post), i) =>
      val expr = post match {
        case Some(p) =>
          s"'${pre.replace("\"", "\"")}' || regexp_extract(text, '^[a-z]+') || '$p'"
        case None => s"'$pre'"
      }
      s"WHEN $i THEN $expr"
    }.mkString("\n      ")
    val typeCase = TypePatterns.map { case (t, pat) =>
      s"WHEN regexp_matches(ql, '(?i)$pat') THEN '$t'"
    }.mkString("\n      ")
    // single-quote regex chars spliced via chr(39) to dodge SQL quoting
    val sqPat = """chr(39) || '([^' || chr(39) || ']*)' || chr(39)"""
    val stopList = StopWords.map(wd => s"'$wd'").mkString(", ")
    s"""WITH qs AS (
       |  SELECT doc_id, CASE doc_id % 10
       |      $qCase
       |      END AS question
       |  FROM documents),
       |parsed AS (
       |  SELECT doc_id, question, lower(trim(question)) AS ql,
       |    list_sort(list_distinct(list_filter(
       |      regexp_extract_all(question,
       |        '[A-Z][a-z]+(?:\\s+[A-Z][a-z]+)*') ||
       |      regexp_extract_all(question, '"([^"]*)"', 1) ||
       |      regexp_extract_all(question, $sqPat, 1),
       |      e -> length(e) > 2))) AS ents,
       |    list_filter(regexp_extract_all(lower(trim(question)),
       |      '\\b\\w+\\b'),
       |      w -> length(w) > 2 AND w NOT IN ($stopList)) AS kws
       |  FROM qs),
       |typed AS (
       |  SELECT *, CASE
       |      $typeCase
       |      ELSE 'factual' END AS question_type
       |  FROM parsed)
       |SELECT doc_id, question, question_type,
       |  array_to_string(ents, '|') AS entities,
       |  array_to_string(kws, '|') AS keywords,
       |  CASE WHEN question_type = 'factual' AND len(ents) > 0
       |      THEN 'Get factual information about ' ||
       |        array_to_string(list_slice(ents, 1, 2), ', ')
       |    WHEN question_type = 'factual' THEN 'Get factual information'
       |    WHEN question_type = 'comparative' THEN 'Compare entities: ' ||
       |      array_to_string(list_slice(ents, 1, 3), ', ')
       |    WHEN question_type = 'causal'
       |      THEN 'Explain causation involving ' ||
       |        array_to_string(list_slice(ents, 1, 2), ', ')
       |    WHEN question_type = 'procedural'
       |      THEN 'Provide procedural information for ' ||
       |        array_to_string(list_slice(kws, 1, 2), ', ')
       |    ELSE 'Process ' || question_type || ' question about ' ||
       |      array_to_string(list_slice(ents, 1, 2), ', ')
       |    END AS intent,
       |  coalesce(
       |    nullif(regexp_extract(ql, 'in (\\d{4})', 1), ''),
       |    nullif(regexp_extract(ql, 'during ([^,]+)', 1), ''),
       |    nullif(regexp_extract(ql, 'before ([^,]+)', 1), ''),
       |    nullif(regexp_extract(ql, 'after ([^,]+)', 1), ''))
       |    AS time_filter,
       |  CAST(nullif(regexp_extract(ql, '(\\d+)\\s+(most|top|best)', 1),
       |    '') AS INT) AS limit_n,
       |  round(least(0.5
       |    + (CASE WHEN len(ents) > 0
       |        THEN 0.2 * least(len(ents) / 3.0, 1.0) ELSE 0.0 END)
       |    + (CASE WHEN len(kws) > 0
       |        THEN 0.1 * least(len(kws) / 5.0, 1.0) ELSE 0.0 END)
       |    + (CASE WHEN question_type <> 'factual' THEN 0.2
       |        ELSE 0.0 END), 1.0), 6) AS parsing_confidence
       |FROM typed ORDER BY doc_id""".stripMargin
  }

  // -- q101: comprehensive synthesis
  //    (knowledge_synthesis_engine.py:303-780). One synthesis per
  //    domain: the QA leg ranks the domain's docs by the q67 quality
  //    score (top-5 sources, top-1 answer); the insight leg derives
  //    common-term patterns (words in >= 60% of the domain's docs, cap
  //    10), one half-vs-half activity trend over the q95 date
  //    derivation, and length-z anomalies; the perspective leg groups
  //    docs into doc_id%4 stances (>= 2 members) with min-doc
  //    viewpoints and pairwise-overlap consensus tiers. SynthesisEngine
  //    then applies the reference's integration arithmetic.
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SynthesisEngine
    val id = col("doc_id")
    val d = Tables.load(s, dir, "documents")
      .withColumn("quality", TF.qualityScore(col("text"), col("n_chars")))
      .withColumn("words", array_distinct(
        filter(split(lower(col("text")), """\s+"""), w => length(w) > 0)))
      .withColumn("created_at",
        when(id % 11 === 0, lit(null).cast("date"))
          .otherwise(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            (id * 13 % 500).cast("int"))))

    val w5 = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    val ranked = d.withColumn("qrn", row_number().over(w5))
    val qa = ranked.filter(col("qrn") <= 5).groupBy(col("source")).agg(
      avg(col("quality")).as("qa_confidence"),
      count(lit(1)).as("qa_sources"),
      min_by(col("words"), col("qrn")).as("answer_words"))

    val domSize = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val wordDf = d.select(col("source"), col("doc_id"),
        explode(col("words")).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(domSize, "source")
      .withColumn("ratio", col("df").cast("double") / col("n_docs"))
      .filter(col("ratio") >= 0.6)
      .withColumn("prn", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("df").desc, col("word"))))
      .filter(col("prn") <= 10)
    val patterns = wordDf.groupBy(col("source")).agg(
      count(lit(1)).as("n_patterns"), sum(col("ratio")).as("pat_conf_sum"))

    val trend = d.filter(col("created_at").isNotNull)
      .groupBy(col("source")).agg(
        count(when(col("created_at") < "2024-09-01", 1)).as("h1"),
        count(when(col("created_at") >= "2024-09-01", 1)).as("h2"))
      .withColumn("n_trends",
        when(col("h1") + col("h2") > 0, 1L).otherwise(0L))
      .withColumn("trend_conf",
        least((col("h1") + col("h2")) / lit(20.0), lit(1.0)))

    val lenStats = d.groupBy(col("source")).agg(
      avg(length(col("text"))).as("len_avg"),
      stddev_pop(length(col("text"))).as("len_sd"))
    val anomalies = d.join(lenStats, "source")
      .filter(col("len_sd") > 0 &&
        abs(length(col("text")) - col("len_avg")) > col("len_sd") * 2)
    val anomalyAgg = anomalies.groupBy(col("source"))
      .agg(count(lit(1)).as("n_anomalies"))

    val stanceConf = d.withColumn("stance", expr("(doc_id div 20) % 4"))
      .groupBy(col("source"), col("stance")).agg(
        count(lit(1)).as("members"), avg(col("quality")).as("pconf"),
        min_by(col("words"), col("doc_id")).as("viewpoint_words"))
      .filter(col("members") >= 2)
    val perspAgg = stanceConf.groupBy(col("source")).agg(
      count(lit(1)).as("n_perspectives"),
      avg(col("pconf")).as("perspective_confidence"))
    val pairSim = stanceConf.as("a").join(stanceConf.as("b"),
        col("a.source") === col("b.source") &&
          col("a.stance") < col("b.stance"))
      .select(col("a.source").as("source"),
        TF.jaccardSim(col("a.viewpoint_words"), col("b.viewpoint_words"))
          .as("sim"))
      .groupBy(col("source")).agg(avg(col("sim")).as("avg_sim"))
      .withColumn("overall_consensus",
        when(col("avg_sim") > 0.8, "strong_consensus")
          .when(col("avg_sim") > 0.6, "moderate_consensus")
          .when(col("avg_sim") > 0.4, "weak_consensus")
          .otherwise("no_consensus"))
    val agreements = stanceConf.join(qa, "source")
      .filter(TF.jaccardSim(col("viewpoint_words"), col("answer_words"))
        > 0.2)
      .groupBy(col("source")).agg(count(lit(1)).as("n_agreements"))

    val srcDocs = ranked.filter(col("qrn") <= 5)
      .select(col("source"), col("doc_id"))
      .unionByName(anomalies.select(col("source"), col("doc_id")))
      .unionByName(d.withColumn("stance", expr("(doc_id div 20) % 4"))
        .join(stanceConf.select(col("source"), col("stance")),
          Seq("source", "stance"))
        .select(col("source"), col("doc_id")))
    val sources = srcDocs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("sources_analyzed"))

    val legs = qa
      .join(patterns, Seq("source"), "left")
      .join(trend, Seq("source"), "left")
      .join(anomalyAgg, Seq("source"), "left")
      .join(perspAgg, Seq("source"), "left")
      .join(pairSim.select(col("source"), col("overall_consensus")),
        Seq("source"), "left")
      .join(agreements, Seq("source"), "left")
      .join(sources, Seq("source"), "left")
      .withColumn("n_patterns", coalesce(col("n_patterns"), lit(0L)))
      .withColumn("n_trends", coalesce(col("n_trends"), lit(0L)))
      .withColumn("n_anomalies", coalesce(col("n_anomalies"), lit(0L)))
      .withColumn("n_perspectives", coalesce(col("n_perspectives"), lit(0L)))
      .withColumn("perspective_confidence",
        coalesce(col("perspective_confidence"), lit(0.0)))
      .withColumn("n_agreements", coalesce(col("n_agreements"), lit(0L)))
      .withColumn("sources_analyzed",
        coalesce(col("sources_analyzed"), lit(0L)))
      .withColumn("insight_confidence",
        when(col("n_patterns") + col("n_trends") + col("n_anomalies") > 0,
          (coalesce(col("pat_conf_sum"), lit(0.0)) +
            coalesce(col("trend_conf") * col("n_trends"), lit(0.0)) +
            lit(0.7) * col("n_anomalies")) /
            (col("n_patterns") + col("n_trends") + col("n_anomalies"))))
      .withColumn("query_text",
        concat(lit("What is known about "), col("source"), lit("?")))
    SynthesisEngine.comprehensive(legs)
      .select(col("source").as("domain"), col("query_text"),
        round(col("qa_confidence"), 6).as("qa_confidence"),
        col("qa_sources"), col("n_patterns"), col("n_trends"),
        col("n_anomalies"),
        round(col("insight_confidence"), 6).as("insight_confidence"),
        col("n_perspectives"),
        round(col("perspective_confidence"), 6)
          .as("perspective_confidence"),
        col("overall_consensus"), col("n_agreements"),
        col("sources_analyzed"),
        round(col("cross_validation_score"), 6)
          .as("cross_validation_score"),
        round(col("data_coverage"), 6).as("data_coverage"),
        round(col("synthesis_confidence"), 6).as("synthesis_confidence"),
        col("executive_summary"))
      .orderBy(col("domain"))
  }

  private val q101Sql = {
    val qual = TF.sql.qualityScore("text", "n_chars")
    val wordsOf = (t: String) =>
      s"list_distinct(list_filter(string_split_regex(lower($t), '\\s+'), " +
        "w -> length(w) > 0))"
    // mirrors SetJaccardExpr: inter/union with the 0-denominator -> 0.0
    def jac(a: String, b: String) =
      s"""(CASE WHEN (len($a) + len($b) - len(list_intersect($a, $b))) > 0
         |  THEN len(list_intersect($a, $b)) * 1.0 /
         |    (len($a) + len($b) - len(list_intersect($a, $b)))
         |  ELSE 0.0 END)""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id, source, text, $qual AS quality,
       |    ${wordsOf("text")} AS words,
       |    CASE WHEN doc_id % 11 = 0 THEN NULL
       |      ELSE DATE '2024-01-01' + CAST((doc_id * 13) % 500 AS INT)
       |      END AS created_at
       |  FROM documents),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY quality DESC, doc_id) AS qrn FROM d),
       |qa AS (
       |  SELECT source, avg(quality) AS qa_confidence,
       |    CAST(count(*) AS BIGINT) AS qa_sources,
       |    min_by(words, qrn) AS answer_words
       |  FROM ranked WHERE qrn <= 5 GROUP BY source),
       |dom AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
       |wdf AS (
       |  SELECT source, word, count(DISTINCT doc_id) AS df
       |  FROM (SELECT source, doc_id, unnest(words) AS word FROM d)
       |  GROUP BY source, word),
       |pat AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_patterns,
       |    sum(ratio) AS pat_conf_sum
       |  FROM (
       |    SELECT source, word, ratio, row_number() OVER (
       |      PARTITION BY source ORDER BY df DESC, word) AS prn
       |    FROM (SELECT w.source, w.word, w.df,
       |        w.df * 1.0 / dom.n_docs AS ratio
       |      FROM wdf w JOIN dom USING (source)
       |      WHERE w.df * 1.0 / dom.n_docs >= 0.6))
       |  WHERE prn <= 10 GROUP BY source),
       |tr AS (
       |  SELECT source,
       |    CAST(count(*) FILTER (WHERE created_at < DATE '2024-09-01')
       |      AS BIGINT) AS h1,
       |    CAST(count(*) FILTER (WHERE created_at >= DATE '2024-09-01')
       |      AS BIGINT) AS h2
       |  FROM d WHERE created_at IS NOT NULL GROUP BY source),
       |trend AS (
       |  SELECT source,
       |    CAST(CASE WHEN h1 + h2 > 0 THEN 1 ELSE 0 END AS BIGINT)
       |      AS n_trends,
       |    least((h1 + h2) / 20.0, 1.0) AS trend_conf
       |  FROM tr),
       |lenstats AS (
       |  SELECT source, avg(length(text)) AS len_avg,
       |    stddev_pop(length(text)) AS len_sd
       |  FROM d GROUP BY source),
       |anom AS (
       |  SELECT d.source, d.doc_id
       |  FROM d JOIN lenstats USING (source)
       |  WHERE len_sd > 0 AND abs(length(text) - len_avg) > 2 * len_sd),
       |anomagg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_anomalies
       |  FROM anom GROUP BY source),
       |stance AS (
       |  SELECT source, (doc_id // 20) % 4 AS stance,
       |    CAST(count(*) AS BIGINT) AS members,
       |    avg(quality) AS pconf, min_by(words, doc_id) AS viewpoint_words
       |  FROM d GROUP BY source, (doc_id // 20) % 4
       |  HAVING count(*) >= 2),
       |persp AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_perspectives,
       |    avg(pconf) AS perspective_confidence
       |  FROM stance GROUP BY source),
       |pairsim AS (
       |  SELECT source, CASE WHEN avg_sim > 0.8 THEN 'strong_consensus'
       |    WHEN avg_sim > 0.6 THEN 'moderate_consensus'
       |    WHEN avg_sim > 0.4 THEN 'weak_consensus'
       |    ELSE 'no_consensus' END AS overall_consensus
       |  FROM (
       |    SELECT a.source AS source,
       |      avg(${jac("a.viewpoint_words", "b.viewpoint_words")}) AS avg_sim
       |    FROM stance a JOIN stance b
       |      ON a.source = b.source AND a.stance < b.stance
       |    GROUP BY a.source)),
       |agree AS (
       |  SELECT s.source, CAST(count(*) AS BIGINT) AS n_agreements
       |  FROM stance s JOIN qa USING (source)
       |  WHERE ${jac("s.viewpoint_words", "qa.answer_words")} > 0.2
       |  GROUP BY s.source),
       |srcdocs AS (
       |  SELECT source, doc_id FROM ranked WHERE qrn <= 5
       |  UNION ALL SELECT source, doc_id FROM anom
       |  UNION ALL
       |  SELECT d.source, d.doc_id
       |  FROM d JOIN stance s ON d.source = s.source
       |    AND (d.doc_id // 20) % 4 = s.stance),
       |srcs AS (
       |  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT)
       |    AS sources_analyzed
       |  FROM srcdocs GROUP BY source),
       |legs AS (
       |  SELECT qa.source, qa.qa_confidence, qa.qa_sources,
       |    coalesce(pat.n_patterns, 0) AS n_patterns,
       |    coalesce(trend.n_trends, 0) AS n_trends,
       |    coalesce(anomagg.n_anomalies, 0) AS n_anomalies,
       |    CASE WHEN coalesce(pat.n_patterns, 0) +
       |        coalesce(trend.n_trends, 0) +
       |        coalesce(anomagg.n_anomalies, 0) > 0
       |      THEN (coalesce(pat.pat_conf_sum, 0.0) +
       |        coalesce(trend.trend_conf * trend.n_trends, 0.0) +
       |        0.7 * coalesce(anomagg.n_anomalies, 0)) /
       |        (coalesce(pat.n_patterns, 0) + coalesce(trend.n_trends, 0) +
       |          coalesce(anomagg.n_anomalies, 0))
       |      END AS insight_confidence,
       |    coalesce(persp.n_perspectives, 0) AS n_perspectives,
       |    coalesce(persp.perspective_confidence, 0.0)
       |      AS perspective_confidence,
       |    pairsim.overall_consensus,
       |    coalesce(agree.n_agreements, 0) AS n_agreements,
       |    coalesce(srcs.sources_analyzed, 0) AS sources_analyzed,
       |    'What is known about ' || qa.source || '?' AS query_text
       |  FROM qa
       |  LEFT JOIN pat USING (source)
       |  LEFT JOIN trend USING (source)
       |  LEFT JOIN anomagg USING (source)
       |  LEFT JOIN persp USING (source)
       |  LEFT JOIN pairsim USING (source)
       |  LEFT JOIN agree USING (source)
       |  LEFT JOIN srcs USING (source)),
       |meta AS (
       |  SELECT *,
       |    CASE WHEN qa_confidence IS NULL OR n_perspectives = 0 THEN 0.5
       |      ELSE least(n_agreements * 1.0 / n_perspectives + 0.3, 1.0)
       |      END AS cross_validation_score,
       |    CASE WHEN sources_analyzed >= 10 THEN 0.9
       |      WHEN sources_analyzed >= 5 THEN 0.7
       |      WHEN sources_analyzed >= 3 THEN 0.5
       |      WHEN sources_analyzed >= 1 THEN 0.3 ELSE 0.1 END
       |      AS data_coverage
       |  FROM legs),
       |synth AS (
       |  SELECT *,
       |    least(((coalesce(qa_confidence, 0.0) +
       |      coalesce(insight_confidence, 0.0) + perspective_confidence) /
       |      ((CASE WHEN qa_confidence IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN insight_confidence IS NOT NULL THEN 1 ELSE 0 END)
       |       + 1)) * 0.7 + cross_validation_score * 0.3, 0.95)
       |      AS synthesis_confidence
       |  FROM meta)
       |SELECT source AS domain, query_text,
       |  round(qa_confidence, 6) AS qa_confidence, qa_sources,
       |  n_patterns, n_trends, n_anomalies,
       |  round(insight_confidence, 6) AS insight_confidence,
       |  n_perspectives,
       |  round(perspective_confidence, 6) AS perspective_confidence,
       |  overall_consensus, n_agreements, sources_analyzed,
       |  round(cross_validation_score, 6) AS cross_validation_score,
       |  round(data_coverage, 6) AS data_coverage,
       |  round(synthesis_confidence, 6) AS synthesis_confidence,
       |  concat_ws('. ',
       |    'Comprehensive synthesis for: ' || query_text,
       |    CASE WHEN qa_confidence IS NOT NULL
       |      THEN 'Direct answer provided with ' ||
       |        CAST(round(qa_confidence * 100, 1) AS VARCHAR) ||
       |        '% confidence' ||
       |        CASE WHEN qa_sources > 0
       |          THEN ' based on ' || qa_sources || ' sources'
       |          ELSE '' END END,
       |    CASE WHEN n_patterns + n_trends + n_anomalies > 0
       |      THEN 'Discovered ' || (n_patterns + n_trends + n_anomalies)
       |        || ' insights including patterns, trends, and anomalies'
       |      ELSE 'No significant patterns or trends identified' END,
       |    CASE WHEN n_perspectives > 0
       |      THEN 'Analyzed ' || n_perspectives ||
       |        ' different perspectives' ||
       |        CASE WHEN overall_consensus IS NOT NULL
       |          THEN ' with ' || replace(overall_consensus, '_', ' ') ||
       |            ' among viewpoints'
       |          ELSE '' END
       |      ELSE 'Limited perspective diversity found' END,
       |    CASE WHEN synthesis_confidence > 0.7
       |      THEN 'High confidence in synthesis results'
       |      WHEN synthesis_confidence > 0.4
       |      THEN 'Moderate confidence in synthesis results'
       |      ELSE 'Low confidence - additional research recommended' END)
       |    || '.' AS executive_summary
       |FROM synth ORDER BY domain""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q67_qa_evidence", q67, Some(q67Sql)),
    Q("q68_timeline_synthesis", q68, Some(q68Sql)),
    Q("q84_synthesis_summary", q84, Some(q84Sql)),
    Q("q85_synthesis_comparison", q85, Some(q85Sql)),
    Q("q101_comprehensive_synthesis", q101, Some(q101Sql)),
    Q("q104_question_parse", q104, Some(q104Sql)))
}
