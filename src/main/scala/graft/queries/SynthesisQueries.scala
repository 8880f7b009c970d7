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

  val qs: Seq[Q] = Seq(
    Q("q67_qa_evidence", q67, Some(q67Sql)),
    Q("q68_timeline_synthesis", q68, Some(q68Sql)),
    Q("q84_synthesis_summary", q84, Some(q84Sql)),
    Q("q85_synthesis_comparison", q85, Some(q85Sql)),
    Q("q104_question_parse", q104, Some(q104Sql)))
}
