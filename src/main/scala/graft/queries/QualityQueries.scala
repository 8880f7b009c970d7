package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.quality.SourceReliability
import graft.quality.SourceReliability.{Meta => SMeta}

/** Quality-module family (the reference's quality/ package second half):
  * source reliability, gap detection, contradiction resolution,
  * cross-validation. Documents carry no source URLs or timestamps, so
  * the catalog queries derive deterministic source strings / metadata
  * from doc_id (the established synthetic-metadata idiom) — the
  * analyzers themselves are generic column expressions.
  */
object QualityQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // deterministic source strings covering every classification branch:
  // URL normalization (query/fragment strip, trailing-slash strip), DOI
  // extraction, free-text cleanup; known-domain, questionable-marker
  // and db-miss authority paths; shared + unique consistency groups.
  private val SrcCases: Seq[String] = Seq(
    "https://www.nature.com/articles/nat{0}/",
    "https://www.cdc.gov/flu/weekly?week={1}",
    "https://en.wikipedia.org/wiki/Topic_{2}",
    "doi: 10.1000/jrnl.{3}, Journal of Testing",
    "Personal blog post number {1}",
    "https://www.reuters.com/world/story{4}",
    "University research publication no. {5}",
    "tabloid rumor feed {1}")

  // key renderers: {1} = doc_id itself (unique), others are small mods
  // so identifiers repeat and the per-source count paths all run
  private def key(i: Int, docId: org.apache.spark.sql.Column) = i match {
    case 0 => (docId % 30).cast("string")
    case 1 => docId.cast("string")
    case 2 => (docId % 7).cast("string")
    case 3 => (docId % 12).cast("string")
    case 4 => (docId % 40).cast("string")
    case 5 => (docId % 5).cast("string")
  }
  private def keySql(i: Int) = i match {
    case 0 => "(doc_id % 30)"
    case 1 => "doc_id"
    case 2 => "(doc_id % 7)"
    case 3 => "(doc_id % 12)"
    case 4 => "(doc_id % 40)"
    case 5 => "(doc_id % 5)"
  }

  private[queries] def q96(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val src = SrcCases.zipWithIndex.foldLeft(when(lit(false), "never")) {
      case (w, (tpl, i)) =>
        val k = "\\{(\\d)\\}".r.findFirstMatchIn(tpl).get.group(1).toInt
        val Array(pre, post) = tpl.split("\\{\\d\\}", -1)
        w.when(id % 8 === i, concat(lit(pre), key(k, id), lit(post)))
    }.otherwise("unreachable")
    val d = docs(s, dir)
      .withColumn("src", src)
      .withColumn("author",
        when(id % 5 === 0, "Dr. Jane Researcher")
          .when(id % 5 === 1, "John Doe").otherwise(lit(null).cast("string")))
      .withColumn("publication",
        when(id % 4 === 0, "Journal of Synthetic Data")
          .when(id % 4 === 1, "Vendor Whitepaper")
          .otherwise(lit(null).cast("string")))
      .withColumn("institution",
        when(id % 6 === 0, "Test University").otherwise(lit(null).cast("string")))
      .withColumn("peer_reviewed", id % 9 === 0)
      .withColumn("publication_date",
        when(id % 3 === 0, lit(null).cast("date"))
          .otherwise(date_add(lit(java.sql.Date.valueOf("2023-01-01")),
            (id * 7 % 900).cast("int"))))
      .withColumn("updated_at",
        when(id % 4 === 0, date_add(lit(java.sql.Date.valueOf("2025-01-01")),
          (id % 200).cast("int"))).otherwise(lit(null).cast("date")))
    val meta = SMeta().copy(author = col("author"),
      publication = col("publication"), institution = col("institution"),
      peerReviewed = col("peer_reviewed"),
      publicationDate = col("publication_date"), updatedAt = col("updated_at"))
    SourceReliability.assess(d, "src", "text",
        lit(java.sql.Date.valueOf("2025-06-01")), meta)
      .select(col("doc_id"), col("source_identifier"), col("source_type"),
        col("n_same_source"),
        round(col("authority_score"), 6).as("authority_score"),
        round(col("authority_confidence"), 6).as("authority_confidence"),
        round(col("consistency_score"), 6).as("consistency_score"),
        round(col("consistency_confidence"), 6).as("consistency_confidence"),
        round(col("freshness_score"), 6).as("freshness_score"),
        round(col("freshness_confidence"), 6).as("freshness_confidence"),
        round(col("reliability_score"), 6).as("reliability_score"),
        col("reliability_level"),
        round(col("assessment_confidence"), 6).as("assessment_confidence"))
      .orderBy(col("doc_id"))
  }

  private[queries] val q96Sql = {
    import SourceReliability._
    val srcCase = SrcCases.zipWithIndex.map { case (tpl, i) =>
      val k = "\\{(\\d)\\}".r.findFirstMatchIn(tpl).get.group(1).toInt
      val Array(pre, post) = tpl.split("\\{\\d\\}", -1)
      s"WHEN $i THEN '$pre' || ${keySql(k)} || '$post'"
    }.mkString("\n      ")
    val typeChain = TypePatterns.map { case (t, pats) =>
      s"WHEN regexp_matches(lower(src), '${pats.mkString("|")}') THEN '$t'"
    }.mkString("\n      ")
    def anyContains(target: String, ds: Seq[String]): String =
      ds.map(x => s"contains($target, '$x')").mkString(" OR ")
    val domainAdds = HighAuthority
      .map(x => s"(CASE WHEN contains(lower(text), '$x') THEN 0.1 ELSE 0.0 END)")
      .mkString(" + ")
    val citeAdds = CitationPats
      .map(p => s"(CASE WHEN regexp_matches(text, '$p') THEN 0.05 ELSE 0.0 END)")
      .mkString(" + ")
    val methAdds = MethodologyWords
      .map(w => s"(CASE WHEN contains(lower(text), '$w') THEN 0.02 ELSE 0.0 END)")
      .mkString(" + ")
    def cntHits(target: String, ws: Seq[String]): String = ws
      .map(w => s"(CASE WHEN contains($target, '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH meta AS (
       |  SELECT doc_id, text,
       |    CASE doc_id % 8
       |      $srcCase
       |      END AS src,
       |    CASE WHEN doc_id % 5 = 0 THEN 'Dr. Jane Researcher'
       |      WHEN doc_id % 5 = 1 THEN 'John Doe' END AS author,
       |    CASE WHEN doc_id % 4 = 0 THEN 'Journal of Synthetic Data'
       |      WHEN doc_id % 4 = 1 THEN 'Vendor Whitepaper' END AS publication,
       |    CASE WHEN doc_id % 6 = 0 THEN 'Test University' END AS institution,
       |    doc_id % 9 = 0 AS peer_reviewed,
       |    CASE WHEN doc_id % 3 = 0 THEN NULL
       |      ELSE DATE '2023-01-01' + CAST((doc_id * 7) % 900 AS INT)
       |      END AS publication_date,
       |    CASE WHEN doc_id % 4 = 0 THEN
       |      DATE '2025-01-01' + CAST(doc_id % 200 AS INT) END AS updated_at
       |  FROM documents),
       |ident AS (
       |  SELECT *,
       |    CASE WHEN src LIKE 'http://%' OR src LIKE 'https://%'
       |        THEN regexp_replace(regexp_extract(src,
       |          '^https?://([^?#]*)', 1), '/+$$', '')
       |      WHEN contains(lower(src), 'doi:')
       |          AND regexp_extract(src, '(?i)doi:\\s*([^\\s,]+)', 1) <> ''
       |        THEN 'doi:' || regexp_extract(src, '(?i)doi:\\s*([^\\s,]+)', 1)
       |      ELSE substring(regexp_replace(trim(src), '\\s+', ' '), 1, 200)
       |      END AS source_identifier,
       |    CASE
       |      $typeChain
       |      ELSE 'unknown' END AS source_type
       |  FROM meta),
       |counted AS (
       |  SELECT i.*, c.n_same_source FROM ident i JOIN (
       |    SELECT source_identifier, count(*) AS n_same_source
       |    FROM ident GROUP BY 1) c USING (source_identifier)),
       |comps AS (
       |  SELECT doc_id, source_identifier, source_type, n_same_source,
       |    CASE WHEN ${anyContains("lower(source_identifier)", HighAuthority)}
       |        THEN 0.9
       |      WHEN ${anyContains("lower(source_identifier)", MediumAuthority)}
       |        THEN 0.7
       |      WHEN ${anyContains("lower(source_identifier)", QuestionableMarkers)}
       |        THEN 0.2 END AS db,
       |    CASE source_type WHEN 'academic' THEN 0.9
       |      WHEN 'governmental' THEN 0.8 WHEN 'professional' THEN 0.7
       |      WHEN 'news_media' THEN 0.6 WHEN 'reference' THEN 0.7
       |      WHEN 'user_generated' THEN 0.3 WHEN 'commercial' THEN 0.4
       |      ELSE 0.5 END AS type_score,
       |    least(0.5 + $domainAdds + $citeAdds + $methAdds, 1.0)
       |      AS content_score,
       |    least(0.5 +
       |      (CASE WHEN author IS NOT NULL AND
       |        (${anyContains("lower(author)", Seq("dr.", "ph.d", "professor", "phd"))})
       |        THEN 0.2 ELSE 0.0 END) +
       |      (CASE WHEN publication IS NOT NULL AND
       |        (${anyContains("lower(publication)", Seq("journal", "review", "proceedings"))})
       |        THEN 0.1 ELSE 0.0 END) +
       |      (CASE WHEN institution IS NOT NULL THEN 0.1 ELSE 0.0 END) +
       |      (CASE WHEN peer_reviewed THEN 0.2 ELSE 0.0 END), 1.0)
       |      AS meta_score,
       |    (${anyContains("lower(source_identifier)", HighAuthority ++ MediumAuthority)})
       |      AS known_domain,
       |    CASE WHEN publication_date IS NULL THEN NULL
       |      WHEN date_diff('day', publication_date, DATE '2025-06-01') <= 30 THEN 1.0
       |      WHEN date_diff('day', publication_date, DATE '2025-06-01') <= 90 THEN 0.9
       |      WHEN date_diff('day', publication_date, DATE '2025-06-01') <= 180 THEN 0.7
       |      WHEN date_diff('day', publication_date, DATE '2025-06-01') <= 365 THEN 0.5
       |      WHEN date_diff('day', publication_date, DATE '2025-06-01') <= 730 THEN 0.3
       |      ELSE 0.1 END AS pub_f,
       |    CASE WHEN updated_at IS NULL THEN NULL
       |      WHEN date_diff('day', updated_at, DATE '2025-06-01') <= 7 THEN 1.0
       |      WHEN date_diff('day', updated_at, DATE '2025-06-01') <= 30 THEN 0.9
       |      WHEN date_diff('day', updated_at, DATE '2025-06-01') <= 90 THEN 0.7
       |      WHEN date_diff('day', updated_at, DATE '2025-06-01') <= 180 THEN 0.5
       |      ELSE 0.3 END AS upd_f,
       |    greatest(0.1, least(0.5 +
       |      (CASE WHEN (${cntHits("lower(text)", RecentIndicators)}) > 0
       |        THEN least((${cntHits("lower(text)", RecentIndicators)}) * 0.1, 0.3)
       |        ELSE 0.0 END) -
       |      (CASE WHEN (${cntHits("lower(text)", OutdatedIndicators)}) > 0
       |        THEN least((${cntHits("lower(text)", OutdatedIndicators)}) * 0.1, 0.3)
       |        ELSE 0.0 END), 1.0)) AS cont_f
       |  FROM counted),
       |metrics AS (
       |  SELECT doc_id, source_identifier, source_type, n_same_source,
       |    CASE WHEN db IS NULL THEN 0.3
       |      ELSE db * 0.4 + type_score * 0.2 + content_score * 0.2 +
       |        meta_score * 0.2 END AS a_s,
       |    CASE WHEN db IS NULL THEN 0.1
       |      ELSE least(0.5 + (CASE WHEN known_domain THEN 0.3 ELSE 0.0 END) +
       |        (CASE WHEN source_type IN ('academic', 'governmental')
       |          THEN 0.2 ELSE 0.0 END) + 0.2, 1.0) END AS a_c,
       |    CASE WHEN db IS NULL THEN 0.0 ELSE 0.3 END AS a_w,
       |    CASE WHEN n_same_source < 2 THEN 0.6
       |      ELSE (0.7 + 0.75 + 0.8) / 3 END AS c_s,
       |    CASE WHEN n_same_source < 2 THEN 0.3
       |      ELSE least(n_same_source / 10.0, 1.0) END AS c_c,
       |    (coalesce(pub_f, 0.0) + coalesce(upd_f, 0.0) + cont_f) /
       |      ((CASE WHEN pub_f IS NOT NULL THEN 1 ELSE 0 END) +
       |       (CASE WHEN upd_f IS NOT NULL THEN 1 ELSE 0 END) + 1) AS f_s,
       |    CASE WHEN (CASE WHEN pub_f IS NOT NULL THEN 1 ELSE 0 END) +
       |      (CASE WHEN upd_f IS NOT NULL THEN 1 ELSE 0 END) + 1 >= 2
       |      THEN 0.8 ELSE 0.5 END AS f_c
       |  FROM comps),
       |overall AS (
       |  SELECT *, greatest(0.0, least(
       |      (a_s * a_w * a_c + c_s * 0.2 * c_c + f_s * 0.15 * f_c) /
       |      (a_w * a_c + 0.2 * c_c + 0.15 * f_c), 1.0)) AS rel
       |  FROM metrics)
       |SELECT doc_id, source_identifier, source_type, n_same_source,
       |  round(a_s, 6) AS authority_score,
       |  round(a_c, 6) AS authority_confidence,
       |  round(c_s, 6) AS consistency_score,
       |  round(c_c, 6) AS consistency_confidence,
       |  round(f_s, 6) AS freshness_score,
       |  round(f_c, 6) AS freshness_confidence,
       |  round(rel, 6) AS reliability_score,
       |  CASE WHEN rel >= 0.9 THEN 'highly_reliable'
       |    WHEN rel >= 0.7 THEN 'reliable'
       |    WHEN rel >= 0.5 THEN 'moderately_reliable'
       |    WHEN rel >= 0.3 THEN 'questionable'
       |    ELSE 'unreliable' END AS reliability_level,
       |  round(least((a_c + c_c + f_c) / 3 + least(
       |    ((CASE WHEN a_c > 0.7 THEN 1 ELSE 0 END) +
       |     (CASE WHEN c_c > 0.7 THEN 1 ELSE 0 END) +
       |     (CASE WHEN f_c > 0.7 THEN 1 ELSE 0 END)) * 0.1, 0.2), 1.0), 6)
       |    AS assessment_confidence
       |FROM overall ORDER BY doc_id""".stripMargin
  }

  // -- q97: knowledge-gap detection (gap_detection.py:91-780) over a
  //         derived node/edge view: documents as nodes (domain=source),
  //         deterministic prior-doc edges with cycling relation types so
  //         the isolation / weak / hierarchical / connected-pair
  //         branches all fire.
  private def nodesView(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("d:"), col("doc_id").cast("string")).as("node_id"),
      col("doc_id").as("ord"), col("source").as("domain"),
      col("source").as("node_type"), col("text").as("content"))

  private def edgesView(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("doc_id") >= 20 && col("doc_id") % 4 =!= 0 &&
        col("doc_id") % 9 =!= 0)
      .select(concat(lit("d:"), col("doc_id").cast("string")).as("from_id"),
        concat(lit("d:"), (col("doc_id") - 20).cast("string")).as("to_id"),
        when(col("doc_id") % 5 === 0, "related_to")
          .when(col("doc_id") % 5 === 1, "part_of")
          .when(col("doc_id") % 5 === 2, "causes")
          .when(col("doc_id") % 5 === 3, "similar_to")
          .otherwise("instance_of").as("relation_type"))

  private val nodesViewSql =
    """nodes AS (
      |  SELECT 'd:' || doc_id AS node_id, doc_id AS ord, source AS domain,
      |    source AS node_type, text AS content FROM documents)""".stripMargin
  private val edgesViewSql =
    """edges AS (
      |  SELECT 'd:' || doc_id AS from_id, 'd:' || (doc_id - 20) AS to_id,
      |    CASE doc_id % 5 WHEN 0 THEN 'related_to' WHEN 1 THEN 'part_of'
      |      WHEN 2 THEN 'causes' WHEN 3 THEN 'similar_to'
      |      ELSE 'instance_of' END AS relation_type
      |  FROM documents
      |  WHERE doc_id >= 20 AND doc_id % 4 <> 0 AND doc_id % 9 <> 0)""".stripMargin

  private[queries] def q97(s: SparkSession, dir: String): DataFrame =
    graft.quality.GapDetection.detectGaps(nodesView(s, dir), edgesView(s, dir))
      .select(col("gap_id"), col("gap_type"), col("severity"),
        col("description"), col("affected_area"), col("missing_elements"),
        col("related_n"),
        round(col("confidence"), 6).as("confidence"),
        col("detection_method"),
        round(col("priority_score"), 6).as("priority_score"))
      .orderBy(col("gap_id"))

  private[queries] val q97Sql = {
    import graft.quality.GapDetection._
    def anyC(target: String, ws: Seq[String]): String =
      ws.map(w => s"contains($target, '$w')").mkString(" OR ")
    val hasCols = ContentExpectations.map { case (t, ws) =>
      s"(${anyC("lower(content)", ws)}) AS has_$t"
    }.mkString(",\n    ")
    val maxCols = ContentExpectations.map { case (t, _) =>
      s"max(has_$t) AS has_$t" }.mkString(", ")
    val completenessLegs = Seq(
      ("definition", "TRUE"), ("example", "TRUE"),
      ("process", "trig_process"),
      ("cause", "trig_cause"), ("effect", "trig_cause")).map { case (t, g) =>
      s"""  SELECT 'content_completeness_' || topic || '_$t' AS gap_id,
         |    'content_gap' AS gap_type,
         |    CASE WHEN '$t' = 'definition' AND n > 0 THEN 'critical'
         |      WHEN '$t' IN ('example', 'process') AND n >= 3 THEN 'high'
         |      WHEN '$t' IN ('cause', 'effect') AND n >= 2 THEN 'medium'
         |      ELSE 'low' END AS severity,
         |    'Missing $t information for ' || topic AS description,
         |    topic AS affected_area, '$t' AS missing_elements,
         |    n AS related_n, 0.7 AS confidence,
         |    'content_type_analysis' AS detection_method,
         |    ${PriorityBase(t)} * (0.7 + 0.3 * least(n / 5.0, 1.0))
         |      AS priority_score
         |  FROM groups WHERE $g AND NOT has_$t""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val incompleteWhere = (Seq(
      """regexp_matches(content, '\.\.\.')""",
      """regexp_matches(content, '\[?\?\]?')""",
      """regexp_matches(content, '(?i)\b(?:unclear|unknown|uncertain|incomplete|partial)\b')""",
      """regexp_matches(content, '(?i)\b(?:need more|requires additional|insufficient)\b')""",
      """regexp_matches(content, '(?i)\b(?:to be determined|TBD|TODO)\b')""") :+
      ("""(len(list_filter(string_split_regex(content, '[.!?]+'),""" +
        """ s -> length(trim(s)) > 10)) < 2 AND length(content) < 100)"""))
      .mkString("\n      OR ")
    s"""WITH $nodesViewSql,
       |$edgesViewSql,
       |base AS (
       |  SELECT *, coalesce(
       |    nullif(regexp_extract(array_to_string(list_slice(
       |      list_filter(string_split_regex(content, '\\s+'),
       |        w -> length(w) > 0), 1, 10), ' '),
       |      '\\b[A-Z][a-z]+\\b'), ''),
       |    node_type, 'general') AS topic,
       |    $hasCols,
       |    (${anyC("lower(content)", Seq("process", "method", "procedure"))})
       |      AS trig_process,
       |    (${anyC("lower(content)", Seq("cause", "effect", "result"))})
       |      AS trig_cause
       |  FROM nodes),
       |groups AS (
       |  SELECT domain, topic, CAST(count(*) AS BIGINT) AS n, $maxCols,
       |    max(trig_process) AS trig_process, max(trig_cause) AS trig_cause,
       |    max(${anyC("lower(content)", ExampleIndicators)}) AS any_ex
       |  FROM base GROUP BY domain, topic),
       |degrees AS (
       |  SELECT node_id, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT from_id AS node_id FROM edges
       |    UNION ALL SELECT to_id FROM edges) GROUP BY 1),
       |toks AS (
       |  SELECT node_id, ord, domain, lower(content) AS lc,
       |    list_distinct(list_filter(string_split_regex(lower(content),
       |      '\\s+'), w -> length(w) > 0)) AS w
       |  FROM nodes
       |  QUALIFY row_number() OVER (PARTITION BY domain ORDER BY ord)
       |    <= ${graft.quality.GapDetection.DefaultMaxPairPerDomain}),
       |gaps AS (
       |$completenessLegs
       |  UNION ALL
       |  SELECT 'essential_info_' || node_id, 'content_gap', 'medium',
       |    'Incomplete essential information in ' || node_id,
       |    coalesce(node_type, 'content'), 'complete_information',
       |    CAST(1 AS BIGINT), 0.6, 'incomplete_information_analysis', 0.6
       |  FROM base
       |  WHERE $incompleteWhere
       |  UNION ALL
       |  SELECT 'depth_gap_' || node_id, 'depth_gap', 'medium',
       |    'Insufficient detail in ' || node_id,
       |    coalesce(node_type, 'content'), 'detailed_information',
       |    CAST(1 AS BIGINT), 0.7, 'depth_analysis', 0.5 + ds * 0.3
       |  FROM (SELECT node_id, node_type, least(
       |      least(length(content) / 500.0, 1.0) * 0.3 +
       |      least((len(list_filter(string_split_regex(content, '\\s+'),
       |          x -> length(x) > 0)) * 1.0 /
       |        len(string_split_regex(content, '[.!?]+'))) / 15, 1.0) * 0.2 +
       |      least((${DetailIndicators.map(w =>
      s"(CASE WHEN contains(lower(content), '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")}) / 3.0, 1.0) * 0.2 +
       |      least((len(regexp_extract_all(content, '\\b[A-Z]{2,}\\b')) +
       |        len(regexp_extract_all(content, '\\d+(?:\\.\\d+)?')) +
       |        len(regexp_extract_all(content, '\\b\\w+ly\\b'))) / 10.0,
       |        1.0) * 0.3, 1.0) AS ds
       |    FROM base) WHERE ds < 0.4
       |  UNION ALL
       |  SELECT 'examples_gap_' || topic, 'content_gap', 'medium',
       |    'Missing examples for ' || topic, topic,
       |    'examples,illustrations', n, 0.8, 'example_analysis', 0.6
       |  FROM groups WHERE n >= 2 AND NOT any_ex
       |  UNION ALL
       |  SELECT CASE WHEN deg = 0 THEN 'isolation_gap_' || node_id
       |      ELSE 'weak_connectivity_' || node_id END,
       |    'relationship_gap',
       |    CASE WHEN deg = 0 THEN 'high' ELSE 'medium' END,
       |    CASE WHEN deg = 0
       |      THEN 'Isolated node with no relationships: ' || node_id
       |      ELSE 'Weakly connected node: ' || node_id END,
       |    'connectivity',
       |    CASE WHEN deg = 0 THEN 'relationships,connections'
       |      ELSE 'additional_relationships' END,
       |    CAST(1 AS BIGINT),
       |    CASE WHEN deg = 0 THEN 0.9 ELSE 0.7 END,
       |    CASE WHEN deg = 0 THEN 'isolation_analysis'
       |      ELSE 'weak_connectivity_analysis' END,
       |    CASE WHEN deg = 0 THEN 0.8 ELSE 0.6 END
       |  FROM (SELECT n.node_id, coalesce(d.deg, 0) AS deg
       |    FROM nodes n LEFT JOIN degrees d USING (node_id))
       |  WHERE deg <= 2
       |  UNION ALL
       |  SELECT 'logical_connection_' || a.node_id || '_' || b.node_id,
       |    'relationship_gap', 'medium',
       |    'Missing logical connection between ' || a.node_id || ' and ' ||
       |      b.node_id,
       |    'logical_connectivity',
       |    (CASE
       |      WHEN ${anyC("a.lc", Seq("part of", "component", "element"))}
       |        THEN 'part_of'
       |      WHEN ${anyC("b.lc", Seq("part of", "component", "element"))}
       |        THEN 'contains'
       |      WHEN ${anyC("a.lc", Seq("causes", "leads to", "results in"))}
       |        THEN 'causes'
       |      WHEN ${anyC("a.lc", Seq("similar", "like", "comparable"))}
       |        THEN 'similar_to'
       |      ELSE 'related_to' END) || '_relationship',
       |    CAST(2 AS BIGINT), 0.6, 'logical_connection_analysis', 0.5
       |  FROM toks a JOIN toks b ON a.domain = b.domain AND a.ord < b.ord
       |  LEFT JOIN (SELECT DISTINCT
       |      least(from_id, to_id) || '|' || greatest(from_id, to_id) AS pk
       |    FROM edges) e
       |    ON e.pk = least(a.node_id, b.node_id) || '|' ||
       |      greatest(a.node_id, b.node_id)
       |  WHERE len(a.w) > 0 AND len(b.w) > 0
       |    AND len(list_intersect(a.w, b.w)) * 1.0 /
       |      (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) > 0.3
       |    AND e.pk IS NULL
       |  UNION ALL
       |  SELECT 'hierarchy_gap_' || node_id, 'relationship_gap', 'medium',
       |    'Missing hierarchical relationships for ' || node_id,
       |    'hierarchy', 'hierarchical_relationships',
       |    CAST(1 AS BIGINT), 0.7, 'hierarchical_analysis', 0.6
       |  FROM nodes
       |  WHERE (${anyC("lower(content)", HierarchicalIndicators)})
       |    AND node_id NOT IN (
       |      SELECT from_id FROM edges WHERE relation_type IN
       |        (${HierarchicalRelTypes.map(t => s"'$t'").mkString(", ")})
       |      UNION SELECT to_id FROM edges WHERE relation_type IN
       |        (${HierarchicalRelTypes.map(t => s"'$t'").mkString(", ")})))
       |SELECT gap_id, gap_type, severity, description, affected_area,
       |  missing_elements, related_n, round(confidence, 6) AS confidence,
       |  detection_method, round(priority_score, 6) AS priority_score
       |FROM gaps ORDER BY gap_id""".stripMargin
  }

  // -- q98: typed contradiction detection + hybrid resolution
  //         (contradiction_resolution.py:110-700). Documents carry no
  //         contradicting claims, so each node's content appends a
  //         deterministic claim sentence chosen by doc_id%6 — the six
  //         claims pairwise exercise all four pattern axes plus
  //         non-matching pairs — and authority/ts/confidence node
  //         attributes are doc_id-derived so every hybrid leg (and the
  //         no-leg requires_review path) fires.
  private val Claims: Seq[String] = Seq(
    " the metric value is not stable after the change.",
    " it is true the old design stays stable definitely before rollout.",
    " it is clear throughput numbers increase more than before.",
    " it is clear throughput numbers decrease less than after, never a " +
      "beneficial change.",
    " the outcome is good today and numbers decrease slightly.",
    " the outcome is bad and harmful, absolutely false.")

  private def q98(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val claim = Claims.zipWithIndex.foldLeft(when(lit(false), "never")) {
      case (w, (c, i)) => w.when(id % 6 === i, c)
    }.otherwise("unreachable")
    val nodes = docs(s, dir).select(
      concat(lit("d:"), id.cast("string")).as("node_id"),
      id.as("ord"), col("source").as("domain"),
      concat(col("text"), claim).as("content"),
      ((id * 37) % 100 / lit(100.0)).as("authority"),
      when(id % 11 === 0, lit(null).cast("date"))
        .otherwise(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (id * 13 % 500).cast("int"))).as("ts"),
      ((id * 53) % 100 / lit(100.0)).as("confidence"))
    graft.quality.ContradictionResolution.resolve(nodes)
      .select(col("case_id"), col("node_1"), col("node_2"),
        col("contradiction_type"), col("severity"),
        round(col("confidence"), 6).as("confidence"),
        col("claim_1"), col("claim_2"), col("context"),
        col("resolution_status"), col("strategy_used"), col("action_type"),
        col("target_node"),
        round(col("resolution_confidence"), 6).as("resolution_confidence"),
        col("final_recommendation"))
      .orderBy(col("case_id"))
  }

  private val q98Sql = {
    import graft.quality.ContradictionResolution._
    val claimCase = Claims.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString("\n      ")
    val bestIdx = Patterns.zipWithIndex.map { case ((_, p, n), i) =>
      s"""WHEN (contains(lc1, '$p') AND contains(lc2, '$n'))
         |      OR (contains(lc1, '$n') AND contains(lc2, '$p')) THEN $i"""
        .stripMargin
    }.mkString("\n    ")
    def onIdx(f: ((String, String, String), Int) => String): String =
      "CASE best_idx " + Patterns.zipWithIndex.map { case (pat, i) =>
        s"WHEN $i THEN ${f(pat, i)}" }.mkString(" ") + " END"
    def claimSql(side: String, pos: String, neg: String): String =
      s"""coalesce(substring(trim(list_filter(
         |        string_split_regex($side, '[.!?]+'),
         |        s -> contains(lower(s), '$pos') OR
         |          contains(lower(s), '$neg'))[1]), 1, 200),
         |      substring($side, 1, 100) || '...')""".stripMargin
    val strong = StrongIndicators
      .map(w => s"contains(lc1, '$w') OR contains(lc2, '$w')")
      .mkString(" OR ")
    val negCnt = NegationIndicators
      .map(w => s"(CASE WHEN contains(lc1, '$w') OR contains(lc2, '$w') " +
        "THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH nodes AS (
       |  SELECT 'd:' || doc_id AS node_id, doc_id AS ord,
       |    source AS domain,
       |    text || CASE doc_id % 6
       |      $claimCase
       |      END AS content,
       |    ((doc_id * 37) % 100) / 100.0 AS authority,
       |    CASE WHEN doc_id % 11 = 0 THEN NULL
       |      ELSE DATE '2024-01-01' + CAST((doc_id * 13) % 500 AS INT)
       |      END AS ts,
       |    ((doc_id * 53) % 100) / 100.0 AS confidence
       |  FROM documents
       |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |    <= ${graft.quality.ContradictionResolution.DefaultMaxPerDomain}),
       |pairs AS (
       |  SELECT a.node_id AS a_id, b.node_id AS b_id,
       |    a.content AS a_c, b.content AS b_c,
       |    lower(a.content) AS lc1, lower(b.content) AS lc2,
       |    a.authority AS a_auth, b.authority AS b_auth,
       |    a.ts AS a_ts, b.ts AS b_ts,
       |    a.confidence AS a_conf, b.confidence AS b_conf
       |  FROM nodes a JOIN nodes b
       |    ON a.domain = b.domain AND a.ord < b.ord),
       |hits AS (
       |  SELECT * FROM (
       |    SELECT *, CASE
       |      $bestIdx
       |      ELSE -1 END AS best_idx
       |    FROM pairs) WHERE best_idx >= 0),
       |scored AS (
       |  SELECT *,
       |    ${onIdx((p, _) => s"'${p._1}'")} AS ctype,
       |    least(0.8 + (CASE WHEN $strong THEN 0.1 ELSE 0.0 END) +
       |      least(($negCnt) * 0.05, 0.2), 1.0) AS conf,
       |    ${onIdx((p, _) => claimSql("a_c", p._2, p._3))} AS claim_1,
       |    ${onIdx((p, _) => claimSql("b_c", p._2, p._3))} AS claim_2,
       |    ${onIdx((p, _) =>
      s"'${p._1} contradiction involving (''${p._2}'', ''${p._3}'')'")}
       |      AS context,
       |    greatest(a_auth, b_auth) > 0.7 AS auth_res,
       |    CASE WHEN b_auth > a_auth THEN b_id ELSE a_id END AS auth_win,
       |    greatest(a_auth, b_auth) * 0.4 AS auth_score,
       |    a_ts IS NOT NULL OR b_ts IS NOT NULL AS temp_res,
       |    CASE WHEN a_ts IS NULL AND b_ts IS NOT NULL THEN b_id
       |      WHEN b_ts IS NULL THEN a_id
       |      WHEN b_ts > a_ts THEN b_id ELSE a_id END AS temp_win,
       |    greatest(a_conf, b_conf) > 0.7 AS conf_res,
       |    CASE WHEN b_conf > a_conf THEN b_id ELSE a_id END AS conf_win,
       |    greatest(a_conf, b_conf) * 0.3 AS conf_score
       |  FROM hits),
       |resolved AS (
       |  SELECT *,
       |    ${onIdx((p, _) => TypeSeverity(p._1).toString)} + conf * 0.2 +
       |      least((length(a_c) + length(b_c)) / 1000.0 * 0.1, 0.2)
       |      AS sev_score,
       |    (CASE WHEN auth_res AND auth_win = a_id THEN auth_score
       |      ELSE 0.0 END) +
       |    (CASE WHEN temp_res AND temp_win = a_id THEN 0.7 * 0.3
       |      ELSE 0.0 END) +
       |    (CASE WHEN conf_res AND conf_win = a_id THEN conf_score
       |      ELSE 0.0 END) AS s1,
       |    (CASE WHEN auth_res AND auth_win = b_id THEN auth_score
       |      ELSE 0.0 END) +
       |    (CASE WHEN temp_res AND temp_win = b_id THEN 0.7 * 0.3
       |      ELSE 0.0 END) +
       |    (CASE WHEN conf_res AND conf_win = b_id THEN conf_score
       |      ELSE 0.0 END) AS s2,
       |    coalesce(CASE WHEN auth_res THEN auth_win END,
       |      CASE WHEN temp_res THEN temp_win END,
       |      CASE WHEN conf_res THEN conf_win END) AS first_win,
       |    auth_res OR temp_res OR conf_res AS any_res
       |  FROM scored),
       |finals AS (
       |  SELECT *,
       |    CASE WHEN NOT any_res THEN NULL
       |      WHEN s1 > s2 THEN a_id WHEN s2 > s1 THEN b_id
       |      ELSE first_win END AS target_node
       |  FROM resolved)
       |SELECT 'contradiction_' || a_id || '_' || b_id AS case_id,
       |  a_id AS node_1, b_id AS node_2,
       |  ctype AS contradiction_type,
       |  CASE WHEN sev_score >= 0.8 THEN 'critical'
       |    WHEN sev_score >= 0.6 THEN 'high'
       |    WHEN sev_score >= 0.4 THEN 'medium' ELSE 'low' END AS severity,
       |  round(conf, 6) AS confidence, claim_1, claim_2, context,
       |  CASE WHEN any_res THEN 'resolved'
       |    ELSE 'requires_review' END AS resolution_status,
       |  'hybrid_approach' AS strategy_used,
       |  CASE WHEN any_res THEN 'hybrid_resolution' END AS action_type,
       |  target_node,
       |  round(CASE WHEN any_res THEN least(greatest(s1, s2), 1.0)
       |    ELSE 0.0 END, 6) AS resolution_confidence,
       |  CASE WHEN any_res
       |    THEN 'Accept ' || target_node || ' based on hybrid analysis'
       |    ELSE 'Contradiction requires human expert review'
       |    END AS final_recommendation
       |FROM finals ORDER BY case_id""".stripMargin
  }

  // -- q99: cross-validation claims pipeline (cross_validation.py:98-780).
  //         Documents are unpunctuated word soup, so each node appends a
  //         deterministic claim sentence chosen by doc_id%8 (the q98
  //         idiom): the eight variants cover factual / numerical /
  //         temporal / relational claim patterns, all three confidence
  //         indicator tiers, and the evidence-side support /
  //         contradiction indicator arithmetic. Claims are extracted
  //         from the doc_id%5==0 subset (validate_node is per-node; the
  //         subset hits all 8 variants) and validated against the full
  //         same-domain corpus.
  private val CvSentences: Seq[String] = Seq(
    " The batch layer is confirmed and documented since 2019.",
    " The merge path is not stable and possibly broken currently.",
    " The shuffle stage can move over 100 blocks when tuned well, " +
      "it appears.",
    " The cache tier, part of the storage layer, mirrors the page pool.",
    " However the sort unit is unclear, but nevertheless it could " +
      "differ from the spec.",
    " The scan engine supports and confirms the plan, likewise the " +
      "codegen.",
    " The join core weighed 50kg under heavy load during 2021 tests.",
    " Development started before 2019 and accelerated recently, the " +
      "graph walk agrees.")

  private def cvNodes(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sentence = CvSentences.zipWithIndex
      .foldLeft(when(lit(false), "never")) { case (w, (c, i)) =>
        w.when(id % 8 === i, c)
      }.otherwise("unreachable")
    docs(s, dir).select(
      concat(lit("d:"), id.cast("string")).as("node_id"),
      id.as("ord"), col("source").as("domain"),
      concat(substring(col("text"), 1, 120), lit("."), sentence)
        .as("content"),
      ((id * 53) % 100 / lit(100.0)).as("conf_meta"))
  }

  private[queries] def q99(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.CrossValidation
    val corpus = cvNodes(s, dir)
    val claims = CrossValidation.extractClaims(
      corpus.filter(col("ord") % 5 === 0))
    val evidence = CrossValidation.collectEvidence(claims, corpus)
    CrossValidation.analyze(claims, evidence)
      .select(col("claim_id"), col("source_node_id"), col("claim_type"),
        col("claim_text"),
        round(col("claim_confidence"), 6).as("claim_confidence"),
        col("n_supporting"), col("n_contradicting"), col("n_neutral"),
        round(col("consensus_score"), 6).as("consensus_score"),
        col("validation_status"), col("confidence_level"),
        col("validation_summary"))
      .orderBy(col("claim_id"))
  }

  private[queries] val q99Sql = {
    import graft.quality.CrossValidation._
    val sentenceCase = CvSentences.zipWithIndex
      .map { case (c, i) => s"WHEN $i THEN '$c'" }.mkString("\n      ")
    val patternLegs = ClaimPatterns.zipWithIndex.map { case ((ct, pat), pi) =>
      s"""    SELECT node_id, ord, domain, content, conf_meta,
         |      '$ct' AS claim_type, $pi AS pi,
         |      unnest(regexp_extract_all(content, '(?i)$pat', 1)) AS raw
         |    FROM sel""".stripMargin
    }.mkString("\n    UNION ALL\n")
    def anyC(target: String, ws: Seq[String]): String =
      ws.map(w => s"contains($target, '$w')").mkString(" OR ")
    val wordsExpr = (t: String) =>
      s"len(list_filter(string_split_regex($t, '\\s+'), w -> length(w) > 0))"
    val cScoreSql = ContradictionIndicators
      .map(w => s"(CASE WHEN contains(ev_lc, '$w') THEN 0.2 ELSE 0.0 END)")
      .mkString(" + ") + " +\n      " +
      (1 to 3).map(i =>
        s"(CASE WHEN len(cw_ord) >= $i AND contains(ev_lc, 'not ' || " +
          s"cw_ord[$i]) THEN 0.3 ELSE 0.0 END)").mkString(" + ")
    val sScoreSql = SupportIndicators
      .map(w => s"(CASE WHEN contains(ev_lc, '$w') THEN 0.2 ELSE 0.0 END)")
      .mkString(" + ") +
      " + (CASE WHEN relevance > 0.6 THEN 0.3 ELSE 0.0 END)"
    s"""WITH corpus AS (
       |  SELECT 'd:' || doc_id AS node_id, doc_id AS ord,
       |    source AS domain,
       |    substring(text, 1, 120) || '.' || CASE doc_id % 8
       |      $sentenceCase
       |      END AS content,
       |    ((doc_id * 53) % 100) / 100.0 AS conf_meta
       |  FROM documents),
       |sel AS (SELECT * FROM corpus WHERE ord % 5 = 0),
       |claims_all AS (
       |  SELECT DISTINCT node_id, ord, domain, content, conf_meta,
       |    claim_type, pi, trim(raw) AS claim_text
       |  FROM (
       |$patternLegs
       |  ) WHERE length(trim(raw)) > 10),
       |claims_dedup AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY node_id, lower(claim_text)
       |      ORDER BY pi, claim_text) AS rn
       |    FROM claims_all)
       |  WHERE rn = 1 AND length(claim_text) > 15),
       |claims AS (
       |  SELECT node_id || '_' || claim_type || '_' || md5(claim_text)
       |      AS claim_id,
       |    node_id, ord, domain, claim_type, claim_text, conf
       |  FROM (
       |    SELECT *, greatest(0.1, least(0.5
       |      + (CASE WHEN ${anyC("lower(claim_text)", HighIndicators)}
       |          THEN 0.3 ELSE 0.0 END)
       |      + (CASE WHEN ${anyC("lower(claim_text)", MediumIndicators)}
       |          THEN 0.1 ELSE 0.0 END)
       |      - (CASE WHEN ${anyC("lower(claim_text)", LowIndicators)}
       |          THEN 0.2 ELSE 0.0 END)
       |      + (CASE WHEN regexp_matches(claim_text, '[0-9]')
       |          THEN 0.1 ELSE 0.0 END)
       |      + (CASE WHEN ${wordsExpr("claim_text")} > 8
       |          THEN 0.1 ELSE 0.0 END), 1.0)) AS conf
       |    FROM claims_dedup)
       |  WHERE conf >= 0.3 AND ${wordsExpr("claim_text")} >= 3),
       |ev_cap AS (
       |  SELECT domain, node_id AS ev_id, ord AS ev_ord,
       |    content AS ev_content, conf_meta AS ev_conf
       |  FROM corpus
       |  QUALIFY row_number() OVER (PARTITION BY domain ORDER BY ord)
       |    <= ${graft.quality.ContradictionResolution.DefaultMaxPerDomain}),
       |pairs AS (
       |  SELECT c.*, e.ev_id, e.ev_ord, e.ev_conf,
       |    lower(c.claim_text) AS claim_lc, lower(e.ev_content) AS ev_lc,
       |    list_distinct(list_filter(string_split_regex(
       |      lower(c.claim_text), '\\s+'), w -> length(w) > 0)) AS cw,
       |    list_filter(string_split_regex(lower(c.claim_text), '\\s+'),
       |      w -> length(w) > 0) AS cw_ord,
       |    list_distinct(list_filter(string_split_regex(
       |      lower(e.ev_content), '\\s+'), w -> length(w) > 0)) AS tw
       |  FROM claims c JOIN ev_cap e USING (domain)
       |  WHERE e.ev_id <> c.node_id),
       |rel AS (
       |  SELECT *, least(
       |      (CASE WHEN len(cw) = 0 OR len(tw) = 0 THEN 0.0
       |        ELSE len(list_intersect(cw, tw)) * 1.0 /
       |          (len(cw) + len(tw) - len(list_intersect(cw, tw))) END)
       |      + (CASE WHEN contains(ev_lc, claim_lc) THEN 0.3
       |        ELSE 0.0 END), 1.0) AS relevance
       |  FROM pairs),
       |typed AS (
       |  SELECT *,
       |    CASE WHEN c_score > s_score AND c_score > 0.3
       |        THEN 'contradicting'
       |      WHEN s_score > c_score AND s_score > 0.3 THEN 'supporting'
       |      ELSE 'neutral' END AS support_type,
       |    CASE WHEN c_score > s_score AND c_score > 0.3 THEN c_score
       |      WHEN s_score > c_score AND s_score > 0.3 THEN s_score
       |      ELSE greatest(c_score, s_score) END AS support_conf,
       |    greatest(0.1, least(0.5
       |      + (CASE WHEN ${anyC("lower(domain)",
              Seq("journal", "research", "academic"))} THEN 0.2
       |        WHEN ${anyC("lower(domain)", Seq("wiki", "blog", "forum"))}
       |          THEN -0.1 ELSE 0.0 END)
       |      + (ev_conf - 0.5) * 0.4, 1.0)) AS reliability
       |  FROM (
       |    SELECT *,
       |      $cScoreSql AS c_score,
       |      $sScoreSql AS s_score
       |    FROM rel WHERE relevance >= 0.3)),
       |evtop AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY claim_id
       |      ORDER BY relevance * reliability DESC, ev_ord) AS ern
       |    FROM typed)
       |  WHERE ern <= $MaxEvidencePerClaim),
       |agg AS (
       |  SELECT claim_id,
       |    CAST(count(*) AS BIGINT) AS n_ev,
       |    CAST(count(*) FILTER (WHERE support_type = 'supporting') AS BIGINT)
       |      AS n_sup,
       |    CAST(count(*) FILTER (WHERE support_type = 'contradicting') AS BIGINT)
       |      AS n_con,
       |    CAST(count(*) FILTER (WHERE support_type = 'neutral') AS BIGINT)
       |      AS n_neu,
       |    coalesce(sum(reliability * support_conf)
       |      FILTER (WHERE support_type = 'supporting'), 0.0) AS sw,
       |    coalesce(sum(reliability * support_conf)
       |      FILTER (WHERE support_type = 'contradicting'), 0.0) AS cww,
       |    count(*) FILTER (WHERE reliability > 0.6) AS hq,
       |    avg(reliability) AS ar, avg(support_conf) AS ac
       |  FROM evtop GROUP BY claim_id),
       |finals AS (
       |  SELECT c.claim_id, c.node_id, c.claim_type, c.claim_text, c.conf,
       |    coalesce(a.n_ev, 0) AS n_ev, coalesce(a.n_sup, 0) AS n_sup,
       |    coalesce(a.n_con, 0) AS n_con, coalesce(a.n_neu, 0) AS n_neu,
       |    a.hq, a.ar, a.ac,
       |    CASE WHEN coalesce(a.n_sup, 0) = 0 AND coalesce(a.n_con, 0) = 0
       |        THEN 0.5
       |      WHEN a.sw + a.cww = 0.0 THEN 0.5
       |      ELSE a.sw / (a.sw + a.cww) END AS consensus
       |  FROM claims c LEFT JOIN agg a USING (claim_id)),
       |labeled AS (
       |  SELECT *,
       |    CASE WHEN n_ev = 0 THEN 'insufficient'
       |      WHEN hq < 2 THEN 'insufficient'
       |      WHEN consensus >= 0.75 THEN 'validated'
       |      WHEN consensus <= 0.25 THEN 'conflicted'
       |      WHEN consensus >= 0.4 AND consensus <= 0.6 THEN 'conflicted'
       |      ELSE 'insufficient' END AS validation_status,
       |    CASE WHEN n_ev = 0 THEN 'very_low'
       |      WHEN (ar + ac) / 2 * 0.6 + abs(consensus - 0.5) * 2 * 0.4
       |        >= 0.85 THEN 'high'
       |      WHEN (ar + ac) / 2 * 0.6 + abs(consensus - 0.5) * 2 * 0.4
       |        >= 0.6 THEN 'medium'
       |      WHEN (ar + ac) / 2 * 0.6 + abs(consensus - 0.5) * 2 * 0.4
       |        >= 0.3 THEN 'low'
       |      ELSE 'very_low' END AS confidence_level
       |  FROM finals)
       |SELECT claim_id, node_id AS source_node_id, claim_type, claim_text,
       |  round(conf, 6) AS claim_confidence,
       |  n_sup AS n_supporting, n_con AS n_contradicting,
       |  n_neu AS n_neutral,
       |  round(consensus, 6) AS consensus_score,
       |  validation_status, confidence_level,
       |  'Validation of claim: ' || substring(claim_text, 1, 100) ||
       |    '...' || '. ' ||
       |  (CASE WHEN n_sup > 0 AND n_con > 0
       |      THEN 'Found ' || n_sup || ' supporting and ' || n_con ||
       |        ' contradicting sources'
       |    WHEN n_sup > 0 THEN 'Found ' || n_sup ||
       |      ' supporting sources with no contradictions'
       |    WHEN n_con > 0 THEN 'Found ' || n_con ||
       |      ' contradicting sources with no support'
       |    ELSE 'No clear supporting or contradicting evidence found'
       |    END) || '. ' ||
       |  (CASE WHEN consensus >= 0.75
       |      THEN 'Strong consensus supports the claim'
       |    WHEN consensus <= 0.25
       |      THEN 'Strong consensus contradicts the claim'
       |    ELSE 'Mixed or insufficient evidence for consensus'
       |    END) || '.' AS validation_summary
       |FROM labeled ORDER BY claim_id""".stripMargin
  }

  // -- q100/q102/q103: QualityEnhancementEngine orchestrator
  //    (quality_enhancement_engine.py:311-844) — composes the verified
  //    component frames (q93 content, q94-shaped structural over the
  //    document edge view, q95 temporal, q96 reliability, q99
  //    validation consensus) into the per-node combined QualityScore
  //    (q100), the prioritized enhancement actions (q102) and the
  //    one-row report aggregates (q103). Components enter the
  //    composition at their published 6-dp rounding (both engines
  //    verify those values independently, so the composed inputs are
  //    identical bit-for-bit).
  private def structEdges(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    docs(s, dir)
      .filter(id >= 20 && id % 4 =!= 0 && id % 9 =!= 0)
      .select(concat(lit("d:"), id.cast("string")).as("from_id"),
        concat(lit("d:"), (id - 20).cast("string")).as("to_id"),
        when(id % 5 === 0, "related_to").when(id % 5 === 1, "part_of")
          .when(id % 5 === 2, "causes").when(id % 5 === 3, "similar_to")
          .otherwise("instance_of").as("relation_type"),
        ((id * 29) % 100 / lit(100.0)).as("confidence"))
  }

  private[queries] def engineScores(s: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame) = df.select(
      (concat(lit("d:"), col("doc_id").cast("string")).as("node_id") +:
        df.columns.filter(_ != "doc_id").toIndexedSeq.map(col)): _*)
    val content = TextQueries.q93(s, dir)
      .select(col("doc_id"), col("overall_quality").as("content_score"))
    val structural = graft.graph.StructuralQuality.assess(structEdges(s, dir))
      .select(col("node_id"),
        round(col("overall_structural"), 6).as("structural_score"))
    val temporal = TextQueries.q95(s, dir)
      .select(col("doc_id"), col("temporal_score"))
    val reliability = q96(s, dir)
      .select(col("doc_id"), col("reliability_score"))
    val validation = q99(s, dir)
      .groupBy(col("source_node_id").as("node_id"))
      .agg(avg(col("consensus_score")).as("validation_score"))
    graft.quality.QualityEngine.scores(keyed(content), structural,
      keyed(temporal), keyed(reliability), validation)
  }

  private def q100(s: SparkSession, dir: String): DataFrame =
    engineScores(s, dir).select(col("node_id"), col("content_score"),
        col("structural_score"), col("temporal_score"),
        col("reliability_score"),
        round(col("validation_score"), 6).as("validation_score"),
        round(col("overall_score"), 6).as("overall_score"),
        col("quality_level"))
      .orderBy(col("node_id"))

  private def q102(s: SparkSession, dir: String): DataFrame =
    // persist() on the reliability input is a codegen isolation
    // boundary, not a perf cache: pruned and filter-pushed into the
    // recommendation union, q96's reliability/confidence expression
    // trees land 3x (pushed filter + two projections) in one generated
    // method and overflow Janino's 64 KB limit — an exchange alone
    // does not help because the pushed filter rides below it. The
    // InMemoryRelation stops pushdown, so q96 keeps its own verified
    // codegen-clean stage shape (PlanShapeSpec strict sweep pins it).
    // At cluster scale the same boundary is a write-then-read of the
    // reliability table, which a quality-report pass would do anyway.
    graft.quality.QualityEngine.recommendations(
        engineScores(s, dir),
        q99(s, dir), q97(s, dir), q96(s, dir).persist())
      .select(col("node_id"), col("action_type"), col("priority"),
        col("description"),
        round(col("expected_improvement"), 6).as("expected_improvement"),
        round(col("confidence"), 6).as("confidence"),
        col("estimated_effort"))

  private def q103(s: SparkSession, dir: String): DataFrame =
    graft.quality.QualityEngine.report(engineScores(s, dir), q99(s, dir))
      .select(col("total_nodes_analyzed"), col("n_excellent"),
        col("n_good"), col("n_fair"), col("n_poor"), col("n_critical"),
        col("conflict_count"), col("critical_issues"),
        col("overall_quality_trend"))

  /** Shared SQL prelude: the verified component queries as named CTEs
    * (their own WITHs are scoped inside each CTE body) plus the
    * composed per-node base. */
  private def engineBaseSql: String = {
    val relQ = """least(500 +
      |      CASE WHEN relation_type IN ('related_to', 'associated_with') THEN -200
      |           WHEN relation_type IN ('part_of', 'instance_of', 'causes', 'enables') THEN 300
      |           ELSE 0 END +
      |      CASE WHEN confidence IS NOT NULL AND confidence <> 0
      |           THEN CAST(round((confidence::DOUBLE) * 200) AS BIGINT) ELSE 0 END, 1000)""".stripMargin
    s"""c93 AS ($q93IndentedSql),
       |c95 AS ($q95IndentedSql),
       |c96 AS ($q96IndentedSql),
       |c99 AS ($q99IndentedSql),
       |sedges AS (
       |  SELECT 'd:' || doc_id AS from_id, 'd:' || (doc_id - 20) AS to_id,
       |    CASE doc_id % 5 WHEN 0 THEN 'related_to' WHEN 1 THEN 'part_of'
       |      WHEN 2 THEN 'causes' WHEN 3 THEN 'similar_to'
       |      ELSE 'instance_of' END AS relation_type,
       |    ((doc_id * 29) % 100) / 100.0 AS confidence
       |  FROM documents
       |  WHERE doc_id >= 20 AND doc_id % 4 <> 0 AND doc_id % 9 <> 0),
       |sinc AS (
       |  SELECT from_id AS node_id, 1 AS n_out, 0 AS n_in, relation_type,
       |    $relQ AS rel_q_milli
       |  FROM sedges
       |  UNION ALL
       |  SELECT to_id, 0, 1, relation_type, $relQ FROM sedges),
       |sagg AS (
       |  SELECT node_id, count(*) AS n_rels, sum(n_out) AS out_n,
       |    sum(n_in) AS in_n,
       |    CAST(sum(rel_q_milli) AS DOUBLE) / (count(*) * 1000) AS rel_quality,
       |    count(DISTINCT relation_type) AS n_types
       |  FROM sinc GROUP BY node_id),
       |cstruct AS (
       |  SELECT node_id, round((
       |    (CASE WHEN n_rels = 1 THEN 0.3 WHEN n_rels <= 3 THEN 0.6
       |       WHEN n_rels <= 7 THEN 0.9 ELSE 1.0 END) + rel_quality +
       |    ((CASE WHEN greatest(in_n, out_n) > 0
       |        THEN least(in_n, out_n) * 1.0 / greatest(in_n, out_n)
       |        ELSE 0.0 END) * 0.7 + least(n_rels / 10.0, 1.0) * 0.3) +
       |    (CASE WHEN n_types * 1.0 / n_rels >= 0.8 THEN 1.0
       |       WHEN n_types * 1.0 / n_rels >= 0.6 THEN 0.8
       |       WHEN n_types * 1.0 / n_rels >= 0.4 THEN 0.6
       |       WHEN n_types * 1.0 / n_rels >= 0.2 THEN 0.4
       |       ELSE 0.2 END)) / 4, 6) AS structural_score
       |  FROM sagg),
       |cval AS (
       |  SELECT source_node_id AS node_id,
       |    avg(consensus_score) AS validation_score
       |  FROM c99 GROUP BY 1),
       |ebase AS (
       |  SELECT 'd:' || doc_id AS node_id, doc_id,
       |    c93.overall_quality AS content_score,
       |    coalesce(cs.structural_score, 0.0) AS structural_score,
       |    c95.temporal_score, c96.reliability_score,
       |    coalesce(cv.validation_score, 0.5) AS validation_score
       |  FROM c93 JOIN c95 USING (doc_id) JOIN c96 USING (doc_id)
       |  LEFT JOIN cstruct cs ON cs.node_id = 'd:' || doc_id
       |  LEFT JOIN cval cv ON cv.node_id = 'd:' || doc_id),
       |escored AS (
       |  SELECT *,
       |    (content_score + structural_score + temporal_score +
       |      reliability_score + validation_score) / 5 AS overall_score
       |  FROM ebase)""".stripMargin
  }

  // the component SQLs indented as CTE bodies (pure cosmetics: their
  // internal WITHs are legal inside a parenthesized CTE)
  private def q93IndentedSql = TextQueries.q93Sql
  private def q95IndentedSql = TextQueries.q95Sql
  private def q96IndentedSql = q96Sql
  private def q99IndentedSql = q99Sql

  private def levelSql(x: String): String =
    s"""CASE WHEN $x >= 0.9 THEN 'excellent' WHEN $x >= 0.7 THEN 'good'
       |    WHEN $x >= 0.5 THEN 'fair' WHEN $x >= 0.3 THEN 'poor'
       |    ELSE 'critical' END""".stripMargin

  private val q100Sql =
    s"""WITH $engineBaseSql
       |SELECT node_id, content_score, structural_score, temporal_score,
       |  reliability_score,
       |  round(validation_score, 6) AS validation_score,
       |  round(overall_score, 6) AS overall_score,
       |  ${levelSql("overall_score")} AS quality_level
       |FROM escored ORDER BY node_id""".stripMargin

  private val q102Sql =
    s"""WITH $engineBaseSql,
       |c97 AS ($q97Sql),
       |legs AS (
       |  SELECT node_id, 'improve_content' AS action_type,
       |    CASE WHEN content_score < 0.4 THEN 'high' ELSE 'medium' END
       |      AS priority,
       |    'Improve content quality (current score: ' ||
       |      CAST(round(content_score, 2) AS VARCHAR) || ')' AS description,
       |    0.6 - content_score AS expected_improvement,
       |    0.8 AS confidence, 'medium' AS estimated_effort,
       |    0 AS leg, node_id AS sub_ord
       |  FROM escored WHERE content_score < 0.6
       |  UNION ALL
       |  SELECT source_node_id, 'resolve_contradiction', 'high',
       |    'Resolve validation conflicts', 0.3, 0.7, 'high', 1, claim_id
       |  FROM c99 WHERE validation_status = 'conflicted'
       |  UNION ALL
       |  SELECT 'general', 'fill_gap', 'high',
       |    'Fill knowledge gap: ' || description, 0.4, confidence,
       |    'high', 2, gap_id
       |  FROM c97 WHERE severity = 'critical'
       |  UNION ALL
       |  SELECT source_identifier, 'update_source', 'medium',
       |    'Improve source reliability (' || reliability_level || ')',
       |    0.3, assessment_confidence, 'medium', 3,
       |    lpad(CAST(doc_id AS VARCHAR), 12, '0')
       |  FROM c96 WHERE reliability_level IN ('questionable', 'unreliable'))
       |SELECT node_id, action_type, priority, description,
       |  round(expected_improvement, 6) AS expected_improvement,
       |  round(confidence, 6) AS confidence, estimated_effort
       |FROM legs
       |ORDER BY priority, expected_improvement DESC, leg, sub_ord
       |LIMIT 20""".stripMargin

  private val q103Sql =
    s"""WITH $engineBaseSql,
       |dist AS (
       |  SELECT CAST(count(*) AS BIGINT) AS total_nodes_analyzed,
       |    CAST(count(*) FILTER (WHERE ${levelSql("overall_score")} =
       |      'excellent') AS BIGINT) AS n_excellent,
       |    CAST(count(*) FILTER (WHERE ${levelSql("overall_score")} =
       |      'good') AS BIGINT) AS n_good,
       |    CAST(count(*) FILTER (WHERE ${levelSql("overall_score")} =
       |      'fair') AS BIGINT) AS n_fair,
       |    CAST(count(*) FILTER (WHERE ${levelSql("overall_score")} =
       |      'poor') AS BIGINT) AS n_poor,
       |    CAST(count(*) FILTER (WHERE ${levelSql("overall_score")} =
       |      'critical') AS BIGINT) AS n_critical
       |  FROM escored),
       |conf AS (
       |  SELECT CAST(count(*) FILTER (WHERE validation_status =
       |    'conflicted') AS BIGINT) AS conflict_count FROM c99)
       |SELECT total_nodes_analyzed, n_excellent, n_good, n_fair, n_poor,
       |  n_critical, conflict_count,
       |  concat_ws('; ',
       |    CASE WHEN n_critical > 0 THEN n_critical ||
       |      ' nodes have critical quality issues' END,
       |    CASE WHEN conflict_count > 0 THEN conflict_count ||
       |      ' validation conflicts detected' END) AS critical_issues,
       |  CASE WHEN n_excellent * 1.0 / total_nodes_analyzed > 0.5
       |      THEN 'stable'
       |    WHEN n_excellent * 1.0 / total_nodes_analyzed > 0.2
       |      THEN 'improving'
       |    ELSE 'declining' END AS overall_quality_trend
       |FROM dist, conf""".stripMargin

  // -- q105: quality-based result ranking (QualityRanker,
  //    quality_enhancement_engine.py:103-300) — the engine's weighted
  //    component score over the composed per-node frame plus the
  //    query-context relevance bonus, ranked descending.
  private val Q105Context = Seq("table", "scan", "merge", "batch",
    "performance")

  private def q105(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir).select(
      concat(lit("d:"), col("doc_id").cast("string")).as("node_id"),
      array_distinct(filter(split(lower(col("text")), """\s+"""),
        w => length(w) > 0)).as("content_words"))
    graft.quality.QualityEngine.rankByQuality(
        engineScores(s, dir).join(words, "node_id"), Some(Q105Context))
      .select(col("quality_rank"), col("node_id"),
        round(col("quality_score"), 6).as("quality_score"),
        round(col("context_bonus"), 6).as("context_bonus"),
        col("content_score"), col("structural_score"),
        col("temporal_score"), col("reliability_score"),
        round(col("validation_score"), 6).as("validation_score"),
        col("quality_ranked"))
      .orderBy(col("quality_rank"))
  }

  private val q105Sql = {
    val ctxList = Q105Context.map(w => s"'$w'").mkString("[", ", ", "]")
    val weighted = graft.quality.QualityEngine.RankingWeights
      .map { case (c, w) => s"$c * $w" }.mkString(" + ")
    s"""WITH $engineBaseSql,
       |wordsets AS (
       |  SELECT 'd:' || doc_id AS node_id,
       |    list_distinct(list_filter(string_split_regex(lower(text),
       |      '\\s+'), w -> length(w) > 0)) AS content_words
       |  FROM documents),
       |scored2 AS (
       |  SELECT e.*, least(0.1,
       |      (len(list_intersect(w.content_words, $ctxList)) / 5.0) * 0.2)
       |      AS context_bonus
       |  FROM escored e JOIN wordsets w USING (node_id)),
       |rankedq AS (
       |  SELECT *,
       |    least(1.0, $weighted + context_bonus) AS quality_score
       |  FROM scored2)
       |SELECT CAST(row_number() OVER (
       |    ORDER BY quality_score DESC, node_id) AS INT) AS quality_rank,
       |  node_id, round(quality_score, 6) AS quality_score,
       |  round(context_bonus, 6) AS context_bonus,
       |  content_score, structural_score, temporal_score,
       |  reliability_score,
       |  round(validation_score, 6) AS validation_score,
       |  TRUE AS quality_ranked
       |FROM rankedq ORDER BY quality_rank""".stripMargin
  }

  // -- q341: weak-supervision label model (Ratner et al. VLDB 2018
  //          "Snorkel", in its one-step majority-anchored form — one
  //          iteration of Dawid & Skene 1979): three labeling
  //          functions vote {−1, 0, +1} on document quality (length
  //          band, stopword-ratio band, language), the majority sign
  //          anchors per-LF accuracies (agreement where both LF and
  //          majority are non-abstain), and the accuracy-weighted
  //          revote is the denoised label — the cheap way to label a
  //          100 TB corpus with no gold data. Determinism: votes and
  //          agreements are exact integers; accuracies are micro6;
  //          the weighted score is an integer dot product; ratio
  //          compares are cross-multiplied (never float). Scale
  //          shape: one scan → per-doc votes; accuracies are one
  //          1-row cross; per-source rollup streams out of a keyed
  //          agg.
  private def q341(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val voted = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("CASE WHEN n_chars >= 200 THEN 1 " +
          "WHEN n_chars < 50 THEN -1 ELSE 0 END").as("v_len"),
        (when(TF.tokenCount(col("text")) === 0, 0L)
          .when(TF.countIn(TF.tokens(col("text")),
            TF.stopwords("en")).cast("long") * 100 >=
            TF.tokenCount(col("text")).cast("long") * 8, 1L)
          .when(TF.countIn(TF.tokens(col("text")),
            TF.stopwords("en")) === 0, -1L)
          .otherwise(0L)).as("v_stop"),
        expr("CASE WHEN lang = 'en' THEN 1 WHEN lang = 'zh' THEN -1 " +
          "ELSE 0 END").as("v_lang"))
      .withColumn("major", expr(
        "CASE WHEN v_len + v_stop + v_lang > 0 THEN 1 " +
          "WHEN v_len + v_stop + v_lang < 0 THEN -1 ELSE 0 END"))
    def acc(v: String) = graft.functions.ExactRound.micro6(
      coalesce(sum(when(col(v) =!= 0 && col("major") =!= 0 &&
        col(v) === col("major"), 1L)), lit(0L)),
      greatest(coalesce(sum(when(col(v) =!= 0 && col("major") =!= 0,
        1L)), lit(0L)), lit(1L)))
    val weights = voted.agg(acc("v_len").as("w_len"),
      acc("v_stop").as("w_stop"), acc("v_lang").as("w_lang"))
    voted.crossJoin(broadcast(weights))
      .withColumn("score", col("v_len") * col("w_len") +
        col("v_stop") * col("w_stop") + col("v_lang") * col("w_lang"))
      .withColumn("weighted", expr(
        "CASE WHEN score > 0 THEN 1 WHEN score < 0 THEN -1 " +
          "ELSE major END"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("major") === 1, 1L).otherwise(0L))
          .as("n_pos_major"),
        sum(when(col("weighted") === 1, 1L).otherwise(0L))
          .as("n_pos_weighted"),
        sum(when(col("weighted") =!= col("major"), 1L).otherwise(0L))
          .as("n_flips"),
        (max(col("w_len")) / 1e6).as("acc_len"),
        (max(col("w_stop")) / 1e6).as("acc_stop"),
        (max(col("w_lang")) / 1e6).as("acc_lang"))
      .orderBy(col("source"))
  }

  private val q341Sql = {
    import graft.text.{TextFunctions => TF}
    import graft.functions.{ExactRound => ER}
    val stops = TF.stopwords("en")
    val nStop = TF.sql.countIn(TF.sql.tokens("text"), stops)
    val nTok = TF.sql.tokenCount("text")
    def accSql(v: String) = "CAST(" + ER.sql.micro6(
      s"coalesce(sum(CASE WHEN $v <> 0 AND major <> 0 AND " +
        s"$v = major THEN 1 END), 0)",
      s"greatest(coalesce(sum(CASE WHEN $v <> 0 AND major <> 0 " +
        s"THEN 1 END), 0), 1)") + " AS BIGINT)"
    s"""WITH voted AS (
       |  SELECT doc_id, source,
       |    CASE WHEN n_chars >= 200 THEN 1 WHEN n_chars < 50 THEN -1
       |      ELSE 0 END AS v_len,
       |    CASE WHEN $nTok = 0 THEN 0
       |      WHEN $nStop * 100 >= $nTok * 8 THEN 1
       |      WHEN $nStop = 0 THEN -1 ELSE 0 END AS v_stop,
       |    CASE WHEN lang = 'en' THEN 1 WHEN lang = 'zh' THEN -1
       |      ELSE 0 END AS v_lang
       |  FROM documents),
       |majored AS (
       |  SELECT *, CASE WHEN v_len + v_stop + v_lang > 0 THEN 1
       |    WHEN v_len + v_stop + v_lang < 0 THEN -1 ELSE 0 END
       |    AS major
       |  FROM voted),
       |weights AS (
       |  SELECT ${accSql("v_len")} AS w_len,
       |    ${accSql("v_stop")} AS w_stop,
       |    ${accSql("v_lang")} AS w_lang
       |  FROM majored),
       |scored AS (
       |  SELECT m.*, w.w_len, w.w_stop, w.w_lang,
       |    m.v_len * w.w_len + m.v_stop * w.w_stop +
       |      m.v_lang * w.w_lang AS score
       |  FROM majored m CROSS JOIN weights w),
       |labeled AS (
       |  SELECT *, CASE WHEN score > 0 THEN 1 WHEN score < 0 THEN -1
       |    ELSE major END AS weighted
       |  FROM scored)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN major = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pos_major,
       |  CAST(sum(CASE WHEN weighted = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_pos_weighted,
       |  CAST(sum(CASE WHEN weighted <> major THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_flips,
       |  max(w_len) / 1e6 AS acc_len,
       |  max(w_stop) / 1e6 AS acc_stop,
       |  max(w_lang) / 1e6 AS acc_lang
       |FROM labeled GROUP BY source ORDER BY source""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q96_source_reliability", q96, Some(q96Sql)),
    Q("q97_gap_detection", q97, Some(q97Sql)),
    Q("q98_contradiction_resolution", q98, Some(q98Sql)),
    Q("q99_cross_validation", q99, Some(q99Sql)),
    Q("q100_quality_engine", q100, Some(q100Sql)),
    Q("q102_enhancement_actions", q102, Some(q102Sql)),
    Q("q103_quality_report", q103, Some(q103Sql)),
    Q("q105_quality_ranking", q105, Some(q105Sql)),
    Q("q341_label_model", q341, Some(q341Sql)))
}
