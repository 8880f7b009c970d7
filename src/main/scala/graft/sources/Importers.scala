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
  * N-Triples) parse per line with column expressions — `spark.read.text`
  * partitions the file, so parsing scales with the input like any other
  * scan; nothing is collected. Cypher/Gremlin/pickle imports are
  * intentionally out of scope (executable-statement formats; README
  * divergences) — the reference itself routes them through a live graph
  * engine, not a parser.
  */
object Importers {

  /** data_importer.py:153-192 — extension-based detection. `.nt` only
    * for RDF: a `.rdf` file is conventionally RDF/XML, which the
    * N-Triples line parser would silently read as zero rows; better to
    * refuse loudly. `.xml` is the document-shaped export — not an
    * importable edge list. */
  def detectFormat(path: String): String = {
    val lower = path.toLowerCase
    if (lower.endsWith(".json")) "json"
    else if (lower.endsWith(".csv")) "csv"
    else if (lower.endsWith(".parquet")) "parquet"
    else if (lower.endsWith(".graphml")) "graphml"
    else if (lower.endsWith(".nt")) "rdf"
    else sys.error(s"Unsupported import format for: $path " +
      "(supported: .json .csv .parquet .graphml .nt)")
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

  /** GraphML import (data_importer.py graphml path): parses the
    * `<edge source=".." target=".." label=".."/>` elements (the shape
    * `Exporters.graphMlFragments` emits and the reference writes,
    * data_exporter.py:370-470). Line-oriented → fully distributed. */
  def graphMlEdges(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val pat = """<edge source="([^"]*)" target="([^"]*)" label="([^"]*)"/>"""
    lines
      .select(regexp_extract(col("value"), pat, 1).as("from_id"),
        regexp_extract(col("value"), pat, 2).as("to_id"),
        regexp_extract(col("value"), pat, 3).as("relation_type"))
      .filter(col("from_id") =!= "")
      .select(unescXml(col("from_id")).as("from_id"),
        unescXml(col("to_id")).as("to_id"),
        unescXml(col("relation_type")).as("relation_type"))
  }

  /** GraphML node-id import (`<node id=".."/>` elements). */
  def graphMlNodes(spark: SparkSession, path: String): DataFrame = {
    val pat = """<node id="([^"]*)"/>"""
    spark.read.text(path)
      .select(regexp_extract(col("value"), pat, 1).as("node_id"))
      .filter(col("node_id") =!= "")
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
    spark.read.text(path)
      .select(regexp_extract(col("value"), pat, 1).as("from_id"),
        regexp_extract(col("value"), pat, 2).as("relation_type"),
        regexp_extract(col("value"), pat, 3).as("to_id"))
      .filter(col("from_id") =!= "")
      .select(url_decode(col("from_id")).as("from_id"),
        url_decode(col("to_id")).as("to_id"),
        url_decode(col("relation_type")).as("relation_type"))
  }
}
