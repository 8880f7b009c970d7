package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Import surface (reference migration/data_importer.py): read graph
  * data back from the interchange formats, with extension-based format
  * detection (:153-192) and structural validation (:24, required id
  * fields present).
  *
  * Tabular formats go through Spark's native readers (distributed,
  * schema-projected). The text interchange formats (GraphML, RDF
  * N-Triples, plain XML, Cypher, Gremlin) parse per line —
  * `spark.read.text` partitions the file, so parsing scales with the
  * input like any other scan; nothing is collected. Each parses exactly
  * the shape its `Exporters` counterpart emits (statement-per-line);
  * unmatched lines (headers, comments) are ignored. NetworkX interchange
  * is node-link JSON (`nodeLinkGraph`), matching `Exporters.nodeLinkJson`
  * — the reference's pickle form is Python-only (README divergences).
  */
object Importers {

  /** data_importer.py:153-192 — extension-based detection. `.nt` only
    * for RDF: a `.rdf` file is conventionally RDF/XML, which the
    * N-Triples line parser would silently read as zero rows; better to
    * refuse loudly. `.json` means a tabular edge list — the node-link
    * graph document goes through `nodeLinkGraph` explicitly. */
  def detectFormat(path: String): String = {
    val lower = path.toLowerCase
    if (lower.endsWith(".json")) "json"
    else if (lower.endsWith(".csv")) "csv"
    else if (lower.endsWith(".parquet")) "parquet"
    else if (lower.endsWith(".graphml")) "graphml"
    else if (lower.endsWith(".nt")) "rdf"
    else if (lower.endsWith(".xml")) "xml"
    else if (lower.endsWith(".cypher") || lower.endsWith(".cql")) "cypher"
    else if (lower.endsWith(".gremlin") || lower.endsWith(".groovy")) "gremlin"
    else sys.error(s"Unsupported import format for: $path " +
      "(supported: .json .csv .parquet .graphml .nt .xml .cypher .cql " +
      ".gremlin .groovy)")
  }

  /** Edge-list import from a tabular file (json/csv/parquet), validating
    * the required columns (from_id, to_id, relation_type) are present —
    * data_importer.py's validate_data contract. Projects to the required
    * trio; use `readEdgesFull` to keep extra columns. */
  def readEdges(spark: SparkSession, path: String,
      format: Option[String] = None): DataFrame =
    readEdgesFull(spark, path, format)
      .select(Seq("from_id", "to_id", "relation_type").map(col): _*)

  /** Same validation, but ALL columns survive (confidence, timestamps,
    * weights…) — the form migration must use. The graph text formats
    * only carry the trio. */
  def readEdgesFull(spark: SparkSession, path: String,
      format: Option[String] = None): DataFrame = {
    val df = format.getOrElse(detectFormat(path)) match {
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case "parquet" => spark.read.parquet(path)
      case "graphml" => return graphMlEdges(spark, path)
      case "rdf" => return rdfEdges(spark, path)
      case "xml" => return xmlEdges(spark, path)
      case "cypher" => return cypherEdges(spark, path)
      case "gremlin" => return gremlinEdges(spark, path)
      case other => sys.error(s"Unsupported edge format: $other")
    }
    val required = Seq("from_id", "to_id", "relation_type")
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"edge import missing columns: ${missing.mkString(", ")}")
    df
  }

  private def unescXml(c: org.apache.spark.sql.Column) =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#10;" -> "\n", "&#13;" -> "\r", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }

  /** Shape validation shared by every line-oriented importer: count the
    * lines that LOOK like an entry (`marker`) and the lines that fully
    * match the exporter's single-line pattern (`matched`); refuse unless
    * they agree. This catches both total mismatches (pretty-printed /
    * foreign dialects → zero parsed) and PARTIAL ones (a file where some
    * entries happen to be single-line and the rest would be silently
    * dropped — the worse failure, because it looks like success). One
    * extra cold-path pass over the lines. */
  private def validatedLines(spark: SparkSession, path: String,
      marker: org.apache.spark.sql.Column, pat: String,
      what: String): DataFrame = {
    val lines = spark.read.text(path)
    val s = lines.agg(
      sum(when(marker, 1L).otherwise(0L)).as("markers"),
      sum(when(col("value").rlike(pat), 1L).otherwise(0L)).as("matched"))
      .head()
    val (markers, matched) =
      (if (s.isNullAt(0)) 0L else s.getLong(0),
        if (s.isNullAt(1)) 0L else s.getLong(1))
    require(markers == matched,
      s"$path: $markers $what lines but only $matched parse as the " +
        "single-line attribute shape the matching Exporter emits; " +
        s"refusing to silently drop ${markers - matched} entries " +
        "(multi-line / foreign dialects are not supported)")
    lines
  }

  /** GraphML import (data_importer.py graphml path): parses the
    * `<edge source=".." target=".." label=".."/>` elements — the
    * one-edge-per-line attribute shape `Exporters.graphMlFragments`
    * emits. NOT a general GraphML reader: exports that nest attributes
    * in `<data>` children or pretty-print an element across lines (e.g.
    * the reference's ElementTree writer, data_exporter.py:370-470) fail
    * loudly (every `<edge` line must parse) instead of silently dropping
    * edges. Line-oriented → fully distributed. */
  def graphMlEdges(spark: SparkSession, path: String): DataFrame = {
    val pat = """<edge source="([^"]*)" target="([^"]*)" label="([^"]*)"/>"""
    validatedLines(spark, path, col("value").contains("<edge"), pat, "<edge>")
      .filter(col("value").rlike(pat)) // match-test, so empty ids survive
      .select(regexp_extract(col("value"), pat, 1).as("from_id"),
        regexp_extract(col("value"), pat, 2).as("to_id"),
        regexp_extract(col("value"), pat, 3).as("relation_type"))
      .select(unescXml(col("from_id")).as("from_id"),
        unescXml(col("to_id")).as("to_id"),
        unescXml(col("relation_type")).as("relation_type"))
  }

  /** GraphML node-id import (`<node id=".."/>` elements). */
  def graphMlNodes(spark: SparkSession, path: String): DataFrame = {
    val pat = """<node id="([^"]*)"/>"""
    validatedLines(spark, path, col("value").contains("<node"), pat, "<node>")
      .filter(col("value").rlike(pat))
      .select(regexp_extract(col("value"), pat, 1).as("node_id"))
      .select(unescXml(col("node_id")).as("node_id"))
  }

  /** Backend/format migration (migration/backend_migrator.py's
    * copy-everything contract, minus the zero-downtime dance a live
    * server needs): read the edge list from any supported format, write
    * it in the target tabular format. One distributed read + one
    * distributed write; formats with side-output shapes (graphml/rdf
    * text fragments) are produced by `Exporters` directly. */
  def migrateEdges(spark: SparkSession, srcPath: String, destPath: String,
      destFormat: String, srcFormat: Option[String] = None): Unit = {
    // full read: copy-everything means extra columns (confidence, ts…)
    // survive the migration, not just the required trio
    val edges = readEdgesFull(spark, srcPath, srcFormat)
    destFormat match {
      case "json" => Exporters.writeJson(edges, destPath)
      case "csv" => Exporters.writeCsv(edges, destPath)
      case "parquet" => Exporters.writeParquet(edges, destPath)
      case other => sys.error(s"Unsupported migration target: $other " +
        "(json/csv/parquet; graph text formats via Exporters)")
    }
  }

  /** RDF N-Triples import: inverse of `Exporters.rdfTriples` (urn:graft
    * namespace, percent-encoded local names). Percent-decoding runs as a
    * per-row expression (url_decode handles %XX byte escapes). */
  def rdfEdges(spark: SparkSession, path: String): DataFrame = {
    val pat = """<urn:graft:([^>]*)> <urn:graft:rel:([^>]*)> <urn:graft:([^>]*)> \."""
    validatedLines(spark, path, col("value").contains("<urn:graft:"), pat,
        "urn:graft triple")
      .filter(col("value").rlike(pat))
      .select(regexp_extract(col("value"), pat, 1).as("from_id"),
        regexp_extract(col("value"), pat, 2).as("relation_type"),
        regexp_extract(col("value"), pat, 3).as("to_id"))
      .select(url_decode(col("from_id")).as("from_id"),
        url_decode(col("to_id")).as("to_id"),
        url_decode(col("relation_type")).as("relation_type"))
  }

  /** Plain-XML import: inverse of `Exporters.xmlFragments` — one
    * `<relationship>` element per line, fields as nested elements. The
    * exporter XML-escapes field values (incl. newlines as `&#10;`), so
    * `[^<]*` captures each field exactly; any `<relationship` line that
    * does not parse (pretty-printed dialects) fails loudly. */
  def xmlEdges(spark: SparkSession, path: String): DataFrame = {
    val pat = """<relationship><from_id>([^<]*)</from_id>""" +
      """<to_id>([^<]*)</to_id>""" +
      """<relation_type>([^<]*)</relation_type></relationship>"""
    // marker must be the element itself: a collectXml document also has
    // '<relationships>' section tags and '<relationship_count>' metadata
    // lines, which must not count as droppable entries
    validatedLines(spark, path, col("value").contains("<relationship>"), pat,
        "<relationship>")
      .filter(col("value").rlike(pat))
      .select(regexp_extract(col("value"), pat, 1).as("from_id"),
        regexp_extract(col("value"), pat, 2).as("to_id"),
        regexp_extract(col("value"), pat, 3).as("relation_type"))
      .select(unescXml(col("from_id")).as("from_id"),
        unescXml(col("to_id")).as("to_id"),
        unescXml(col("relation_type")).as("relation_type"))
  }

  /** Plain-XML node import (`<node><node_id>..</node_id></node>`). */
  def xmlNodes(spark: SparkSession, path: String): DataFrame = {
    val pat = """<node><node_id>([^<]*)</node_id></node>"""
    validatedLines(spark, path, col("value").contains("<node>"), pat, "<node>")
      .filter(col("value").rlike(pat))
      .select(regexp_extract(col("value"), pat, 1).as("node_id"))
      .select(unescXml(col("node_id")).as("node_id"))
  }

  // -- statement formats (Cypher / Gremlin) ---------------------------
  // Inverse of Exporters.q: \n \r \' \\ escapes, processed left to right
  // so an escaped backslash never re-triggers on its successor.
  private def unq(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case other => sb.append(other) // \' and \\ (and pass-through)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // a single-quoted Cypher/Gremlin string literal: escaped char or
  // anything that isn't a quote/backslash
  private val Lit = """((?:\\.|[^'\\])*)"""

  private val CypherNode = s"""CREATE \\(:Node \\{id: '$Lit'\\}\\);""".r
  private val CypherEdge =
    (s"""MATCH \\(a:Node \\{id: '$Lit'\\}\\), \\(b:Node \\{id: '$Lit'\\}\\) """ +
      """CREATE \(a\)-\[:([A-Za-z_]+)\]->\(b\);""").r
  private val GremlinNode =
    s"""g\\.addV\\('node'\\)\\.property\\('node_id', '$Lit'\\)""".r
  private val GremlinEdge =
    (s"""g\\.V\\(\\)\\.has\\('node_id', '$Lit'\\)\\.addE\\('$Lit'\\)""" +
      s"""\\.to\\(__\\.V\\(\\)\\.has\\('node_id', '$Lit'\\)\\)""").r

  /** Statement-parser twin of `validatedLines`: every line that looks
    * like a statement of this kind must fully parse — a dump from a real
    * Neo4j/Gremlin server (different quoting, property maps) refuses
    * loudly instead of importing a silently-partial graph. */
  private def requireAllStatements(lines: org.apache.spark.sql.Dataset[String],
      isMarker: String => Boolean, parsed: DataFrame, path: String,
      what: String): DataFrame = {
    val markers = lines.filter(isMarker).count()
    val matched = parsed.count()
    require(markers == matched,
      s"$path: $markers $what statements but only $matched parse as the " +
        "statement-per-line shape the matching Exporter emits; refusing " +
        s"to silently drop ${markers - matched} entries")
    parsed
  }

  /** Cypher script import: inverse of `Exporters.cypherStatements`
    * (data_importer.py:54-71 routes Cypher through a live engine; a batch
    * engine parses the statements instead — same information, no server).
    * NOTE the export mangles relation types (uppercase, non-[A-Z_] → '_',
    * data_exporter.py Cypher impl), so a Cypher round-trip returns the
    * mangled type — ids round-trip exactly. Runs as a per-partition line
    * parse (cold path; statements-per-line, fully distributed). */
  def cypherEdges(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val parsed = lines.flatMap {
      case CypherEdge(f, t, r) => Some((unq(f), unq(t), r))
      case _ => None
    }.toDF("from_id", "to_id", "relation_type")
    requireAllStatements(lines, _.startsWith("MATCH "), parsed, path,
      "MATCH…CREATE edge")
  }

  /** Cypher node-id import (`CREATE (:Node {id: '..'});` statements). */
  def cypherNodes(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val parsed = lines.flatMap {
      case CypherNode(id) => Some(unq(id))
      case _ => None
    }.toDF("node_id")
    requireAllStatements(lines, _.startsWith("CREATE (:Node"), parsed, path,
      "CREATE node")
  }

  /** Gremlin script import: inverse of `Exporters.gremlinStatements`
    * (addV/addE with node_id property lookups, the JanusGraph writer
    * shape db/janusgraph_storage.py:116-178). Lossless round-trip. */
  def gremlinEdges(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val parsed = lines.flatMap {
      case GremlinEdge(f, r, t) => Some((unq(f), unq(t), unq(r)))
      case _ => None
    }.toDF("from_id", "to_id", "relation_type")
    requireAllStatements(lines, _.contains(".addE("), parsed, path,
      "addE edge")
  }

  /** Gremlin node-id import (`g.addV('node').property(..)` statements). */
  def gremlinNodes(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val parsed = lines.flatMap {
      case GremlinNode(id) => Some(unq(id))
      case _ => None
    }.toDF("node_id")
    requireAllStatements(lines, _.startsWith("g.addV("), parsed, path,
      "addV node")
  }

  /** NetworkX node-link JSON import: inverse of `Exporters.nodeLinkJson`
    * (the portable form of the reference's pickled DiGraph). The document
    * is one JSON value, so Spark's multiLine JSON reader parses it;
    * nodes/links explode into the standard frames. Returns
    * (nodes(node_id), edges(from_id, to_id, relation_type)). */
  def nodeLinkGraph(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val doc = spark.read.option("multiLine", "true").json(path)
    val nodes = doc.select(explode(col("nodes")).as("n"))
      .select(col("n.id").as("node_id"))
    val edges = doc.select(explode(col("links")).as("l"))
      .select(col("l.source").as("from_id"), col("l.target").as("to_id"),
        col("l.relation_type").as("relation_type"))
    (nodes, edges)
  }
}
