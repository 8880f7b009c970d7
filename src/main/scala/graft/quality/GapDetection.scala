package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.{TextFunctions => TF}

/** Knowledge-gap detection (quality/gap_detection.py:91-780): content
  * gaps (missing content types per topic group :195-300, incomplete
  * essential info :337-430, insufficient depth :396-465, missing
  * examples :466-520) and relationship gaps (isolated / weakly-connected
  * nodes :559-610, missing logical connections by content similarity
  * :612-680, hierarchical language without hierarchical relationships
  * :705-780), emitted as one typed gap frame.
  *
  * Inputs: `nodes(node_id, ord, domain, node_type, content)` — `ord` is
  * the reference's list position (pairwise analyses orient node1/node2
  * by it) and `domain` scopes the per-domain detector invocation
  * (the reference runs each detector on one domain's node list; here
  * all domains run in one pass, pairwise work equi-joined on domain) —
  * and `edges(from_id, to_id, relation_type)`.
  *
  * Scale shape: per-node legs are scan-local column arithmetic; degree
  * and topic aggregations are map-side-combinable groupBys; the
  * logical-connection leg is a within-domain self-join (blocked by the
  * domain key, codegen set-Jaccard per pair) anti-joined against the
  * normalized edge list — no cross-domain pair is ever generated.
  * BOUNDED-GROUP CONTRACT: the logical-connection leg (the only
  * pairwise leg) considers at most `maxPairPerDomain` nodes per domain
  * — the first N by `ord`, mirroring the reference's candidate slice
  * (enhanced_mcp_endpoint.py:612 `nodes[:100]`) — so one skewed domain
  * cannot go O(n²); all other legs stay linear and uncapped. Same
  * contract as the bounded-group analyses q62/q75.
  */
object GapDetection {

  /** Reference candidate bound (enhanced_mcp_endpoint.py:612). */
  val DefaultMaxPairPerDomain = 100

  /** Content-type indicator lists (:99-160), reference dict order. */
  val ContentExpectations: Seq[(String, Seq[String])] = Seq(
    "definition" -> Seq("what is", "definition", "meaning", "refers to",
      "describes", "characterize", "define", "explain"),
    "example" -> Seq("example", "instance", "case", "illustration",
      "demonstration", "sample", "for instance", "such as"),
    "cause" -> Seq("cause", "reason", "because", "due to", "results from",
      "stems from", "leads to", "triggers"),
    "effect" -> Seq("effect", "result", "consequence", "outcome", "impact",
      "leads to", "causes", "produces"),
    "process" -> Seq("process", "method", "procedure", "steps", "how to",
      "approach", "technique", "way to"),
    "comparison" -> Seq("compare", "contrast", "difference", "similar",
      "unlike", "versus", "compared to", "in contrast"))

  val PriorityBase: Map[String, Double] = Map("definition" -> 0.9,
    "example" -> 0.7, "process" -> 0.8, "cause" -> 0.6, "effect" -> 0.6,
    "comparison" -> 0.5)

  val DetailIndicators: Seq[String] = Seq("specifically", "detailed",
    "comprehensive", "thorough", "in particular", "furthermore",
    "moreover", "additionally")

  val ExampleIndicators: Seq[String] = Seq("example", "instance", "case",
    "illustration", "demonstration", "for example", "such as",
    "for instance", "e.g.", "like")

  val HierarchicalIndicators: Seq[String] = Seq("part of", "component of",
    "element of", "subset of", "category of", "type of", "kind of",
    "belongs to")

  val HierarchicalRelTypes: Seq[String] = Seq("part_of", "contains",
    "is_a", "instance_of", "subclass_of", "parent_of", "child_of",
    "belongs_to")

  val IncompletePatterns: Seq[String] = Seq("""\.\.\.""", """\[?\?\]?""",
    """(?i)\b(?:unclear|unknown|uncertain|incomplete|partial)\b""",
    """(?i)\b(?:need more|requires additional|insufficient)\b""",
    """(?i)\b(?:to be determined|TBD|TODO)\b""")

  private def anyContains(lowered: Column, words: Seq[String]): Column =
    words.map(lowered.contains(_)).reduce(_ || _)

  /** Main-topic extraction (:239-272): metadata topic (caller folds it
    * into `topicMeta`, null when absent) → first proper noun of the
    * first 10 words → node_type → "general". */
  def extractTopic(content: Column, topicMeta: Column,
      nodeType: Column): Column = {
    val first10 = array_join(
      slice(filter(split(content, """\s+"""), w => length(w) > 0), 1, 10), " ")
    val noun = regexp_extract(first10, """\b[A-Z][a-z]+\b""", 0)
    coalesce(topicMeta, when(noun =!= "", noun), nodeType, lit("general"))
  }

  /** Content-depth score (:422-465): length, sentence complexity, detail
    * indicators, technical density. */
  def depthScore(content: Column): Column = {
    val lowered = lower(content)
    val lenF = least(length(content) / lit(500.0), lit(1.0)) * 0.3
    // re.split keeps empty segments; str.split drops them
    val nSent = size(split(content, "[.!?]+"))
    val nWords = size(filter(split(content, """\s+"""), w => length(w) > 0))
    val complexity =
      least((nWords.cast("double") / nSent) / 15, lit(1.0)) * 0.2
    val detail = DetailIndicators
      .map(w => when(lowered.contains(w), 1).otherwise(0)).reduce(_ + _)
    val detailF = least(detail / lit(3.0), lit(1.0)) * 0.2
    val technical =
      size(regexp_extract_all(content, lit("""\b[A-Z]{2,}\b"""), lit(0))) +
        size(regexp_extract_all(content, lit("""\d+(?:\.\d+)?"""), lit(0))) +
        size(regexp_extract_all(content, lit("""\b\w+ly\b"""), lit(0)))
    val technicalF = least(technical / lit(10.0), lit(1.0)) * 0.3
    least(lenF + complexity + detailF + technicalF, lit(1.0))
  }

  /** Incomplete-information check (:370-394): uncertainty patterns or
    * very short content with <2 meaningful sentences. */
  def hasIncompleteInfo(content: Column): Column = {
    val patHit = IncompletePatterns.map(content.rlike(_)).reduce(_ || _)
    val meaningful = size(filter(
      transform(split(content, "[.!?]+"), s => trim(s)),
      s => length(s) > 10))
    patHit || (meaningful < 2 && length(content) < 100)
  }

  def hasExamples(content: Column): Column =
    anyContains(lower(content), ExampleIndicators)

  private val GapCols = Seq("gap_id", "gap_type", "severity", "description",
    "affected_area", "missing_elements", "related_n", "confidence",
    "detection_method", "priority_score")

  /** Detect all gap families over a node+edge frame; returns one row per
    * gap with the reference's id/type/severity/priority fields. */
  def detectGaps(nodes: DataFrame, edges: DataFrame,
      maxPairPerDomain: Int = DefaultMaxPairPerDomain): DataFrame = {
    val content = col("content")
    val lowered = lower(content)
    val base = nodes.select(col("node_id"), col("ord"), col("domain"),
      col("node_type"), content,
      extractTopic(content, lit(null).cast("string"), col("node_type"))
        .as("topic"))

    // ---- content completeness (:195-300): per (domain, topic) group,
    // expected-minus-present content types
    val typed = ContentExpectations.foldLeft(base) { case (df, (t, ws)) =>
      df.withColumn(s"has_$t", anyContains(lowered, ws))
    }
      .withColumn("trig_process",
        anyContains(lowered, Seq("process", "method", "procedure")))
      .withColumn("trig_cause",
        anyContains(lowered, Seq("cause", "effect", "result")))
    val groups = typed.groupBy(col("domain"), col("topic"))
      .agg(count(lit(1)).as("n"),
        (ContentExpectations.map { case (t, _) =>
          max(col(s"has_$t")).as(s"has_$t") } ++
          Seq(max(col("trig_process")).as("trig_process"),
            max(col("trig_cause")).as("trig_cause"))): _*)
    val candidates = Seq(
      ("definition", lit(true)), ("example", lit(true)),
      ("process", col("trig_process")),
      ("cause", col("trig_cause")), ("effect", col("trig_cause")))
    val completeness = groups.select(col("topic"), col("n"),
        explode(array(candidates.map { case (t, expected) =>
          struct(lit(t).as("t"), (expected && !col(s"has_$t")).as("missing"),
            lit(PriorityBase(t)).as("base"))
        }: _*)).as("m"))
      .filter(col("m.missing"))
      .select(
        concat(lit("content_completeness_"), col("topic"), lit("_"),
          col("m.t")).as("gap_id"),
        lit("content_gap").as("gap_type"),
        when(col("m.t") === "definition" && col("n") > 0, "critical")
          .when(col("m.t").isin("example", "process") && col("n") >= 3, "high")
          .when(col("m.t").isin("cause", "effect") && col("n") >= 2, "medium")
          .otherwise("low").as("severity"),
        concat(lit("Missing "), col("m.t"), lit(" information for "),
          col("topic")).as("description"),
        col("topic").as("affected_area"),
        col("m.t").as("missing_elements"),
        col("n").as("related_n"),
        lit(0.7).as("confidence"),
        lit("content_type_analysis").as("detection_method"),
        (col("m.base") *
          (lit(0.7) + lit(0.3) * least(col("n") / lit(5.0), lit(1.0))))
          .as("priority_score"))

    // ---- essential info (:337-394)
    val essential = base.filter(hasIncompleteInfo(content)).select(
      concat(lit("essential_info_"), col("node_id")).as("gap_id"),
      lit("content_gap").as("gap_type"), lit("medium").as("severity"),
      concat(lit("Incomplete essential information in "), col("node_id"))
        .as("description"),
      coalesce(col("node_type"), lit("content")).as("affected_area"),
      lit("complete_information").as("missing_elements"),
      lit(1L).as("related_n"), lit(0.6).as("confidence"),
      lit("incomplete_information_analysis").as("detection_method"),
      lit(0.6).as("priority_score"))

    // ---- depth (:396-465)
    val depth = base.withColumn("ds", depthScore(content))
      .filter(col("ds") < 0.4).select(
        concat(lit("depth_gap_"), col("node_id")).as("gap_id"),
        lit("depth_gap").as("gap_type"), lit("medium").as("severity"),
        concat(lit("Insufficient detail in "), col("node_id"))
          .as("description"),
        coalesce(col("node_type"), lit("content")).as("affected_area"),
        lit("detailed_information").as("missing_elements"),
        lit(1L).as("related_n"), lit(0.7).as("confidence"),
        lit("depth_analysis").as("detection_method"),
        (lit(0.5) + col("ds") * 0.3).as("priority_score"))

    // ---- missing examples (:466-520): topic groups of >=2 nodes where
    // no node has example indicators
    val examples = base.withColumn("hex", hasExamples(content))
      .groupBy(col("domain"), col("topic"))
      .agg(count(lit(1)).as("n"), max(col("hex")).as("any_ex"))
      .filter(col("n") >= 2 && !col("any_ex")).select(
        concat(lit("examples_gap_"), col("topic")).as("gap_id"),
        lit("content_gap").as("gap_type"), lit("medium").as("severity"),
        concat(lit("Missing examples for "), col("topic")).as("description"),
        col("topic").as("affected_area"),
        lit("examples,illustrations").as("missing_elements"),
        col("n").as("related_n"), lit(0.8).as("confidence"),
        lit("example_analysis").as("detection_method"),
        lit(0.6).as("priority_score"))

    // ---- isolation / weak connectivity (:559-610): degree counts both
    // edge directions (node.relationships = attached relationships)
    val degrees = edges.select(col("from_id").as("node_id"))
      .unionAll(edges.select(col("to_id").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("deg"))
    val withDeg = base.join(degrees, Seq("node_id"), "left")
      .withColumn("deg", coalesce(col("deg"), lit(0L)))
    val isolation = withDeg.filter(col("deg") <= 2).select(
      when(col("deg") === 0, concat(lit("isolation_gap_"), col("node_id")))
        .otherwise(concat(lit("weak_connectivity_"), col("node_id")))
        .as("gap_id"),
      lit("relationship_gap").as("gap_type"),
      when(col("deg") === 0, "high").otherwise("medium").as("severity"),
      when(col("deg") === 0,
        concat(lit("Isolated node with no relationships: "), col("node_id")))
        .otherwise(concat(lit("Weakly connected node: "), col("node_id")))
        .as("description"),
      lit("connectivity").as("affected_area"),
      when(col("deg") === 0, "relationships,connections")
        .otherwise("additional_relationships").as("missing_elements"),
      lit(1L).as("related_n"),
      when(col("deg") === 0, 0.9).otherwise(0.7).as("confidence"),
      when(col("deg") === 0, "isolation_analysis")
        .otherwise("weak_connectivity_analysis").as("detection_method"),
      when(col("deg") === 0, 0.8).otherwise(0.6).as("priority_score"))

    // ---- missing logical connections (:612-680): within-domain pairs
    // with word-set Jaccard > 0.3 that have no edge in either direction.
    // Candidate bound: first maxPairPerDomain per domain by ord (the
    // reference's slice) — the window shuffles on the same domain key
    // the pair join needs, so this adds no extra exchange.
    val pairCapped = {
      import org.apache.spark.sql.expressions.Window
      base.withColumn("__rn", row_number().over(
          Window.partitionBy(col("domain")).orderBy(col("ord"))))
        .filter(col("__rn") <= maxPairPerDomain).drop("__rn")
    }
    val toks = pairCapped.select(col("node_id"), col("ord"), col("domain"),
      lower(col("content")).as("lc"),
      array_distinct(filter(split(lower(col("content")), """\s+"""),
        w => length(w) > 0)).as("w"))
    val l = toks.select(col("domain"), col("node_id").as("a_id"),
      col("ord").as("a_ord"), col("lc").as("a_lc"), col("w").as("a_w"))
    val r = toks.select(col("domain"), col("node_id").as("b_id"),
      col("ord").as("b_ord"), col("lc").as("b_lc"), col("w").as("b_w"))
    val pairKey = concat(least(col("a_id"), col("b_id")), lit("|"),
      greatest(col("a_id"), col("b_id")))
    val edgeKeys = edges.select(concat(least(col("from_id"), col("to_id")),
      lit("|"), greatest(col("from_id"), col("to_id"))).as("pk")).distinct()
    val connType =
      when(anyContains(col("a_lc"), Seq("part of", "component", "element")),
        "part_of")
        .when(anyContains(col("b_lc"), Seq("part of", "component", "element")),
          "contains")
        .when(anyContains(col("a_lc"), Seq("causes", "leads to", "results in")),
          "causes")
        .when(anyContains(col("a_lc"), Seq("similar", "like", "comparable")),
          "similar_to")
        .otherwise("related_to")
    val logical = l.join(r, Seq("domain"))
      .filter(col("a_ord") < col("b_ord") &&
        size(col("a_w")) > 0 && size(col("b_w")) > 0 &&
        TF.jaccardSim(col("a_w"), col("b_w")) > 0.3)
      .withColumn("pk", pairKey)
      .join(edgeKeys, Seq("pk"), "left_anti")
      .select(
        concat(lit("logical_connection_"), col("a_id"), lit("_"),
          col("b_id")).as("gap_id"),
        lit("relationship_gap").as("gap_type"), lit("medium").as("severity"),
        concat(lit("Missing logical connection between "), col("a_id"),
          lit(" and "), col("b_id")).as("description"),
        lit("logical_connectivity").as("affected_area"),
        concat(connType, lit("_relationship")).as("missing_elements"),
        lit(2L).as("related_n"), lit(0.6).as("confidence"),
        lit("logical_connection_analysis").as("detection_method"),
        lit(0.5).as("priority_score"))

    // ---- hierarchy (:705-780): hierarchical language without a
    // hierarchical relationship attached in either direction
    val hierRels = edges
      .filter(col("relation_type").isin(HierarchicalRelTypes: _*))
      .select(col("from_id").as("node_id"))
      .unionAll(edges.filter(col("relation_type")
        .isin(HierarchicalRelTypes: _*)).select(col("to_id").as("node_id")))
      .distinct()
    val hierarchy = base
      .filter(anyContains(lowered, HierarchicalIndicators))
      .join(hierRels, Seq("node_id"), "left_anti")
      .select(
        concat(lit("hierarchy_gap_"), col("node_id")).as("gap_id"),
        lit("relationship_gap").as("gap_type"), lit("medium").as("severity"),
        concat(lit("Missing hierarchical relationships for "),
          col("node_id")).as("description"),
        lit("hierarchy").as("affected_area"),
        lit("hierarchical_relationships").as("missing_elements"),
        lit(1L).as("related_n"), lit(0.7).as("confidence"),
        lit("hierarchical_analysis").as("detection_method"),
        lit(0.6).as("priority_score"))

    Seq(completeness, essential, depth, examples, isolation, logical,
      hierarchy).map(_.select(GapCols.map(col): _*))
      .reduce(_ unionByName _)
  }
}
