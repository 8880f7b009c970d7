package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** Export sinks (reference migration/data_exporter.py:19-85 dispatch):
  * tabular formats go through Spark's native writers (distributed,
  * partitioned); graph interchange formats (GraphML, Cypher) are
  * per-partition serializations — each partition renders its fragment,
  * only the tiny header/footer is driver-side.
  */
object Exporters {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  // Newlines/CR escape as numeric character references so every element
  // stays on ONE text line — the line-oriented importers (Importers
  // .graphMlEdges) would otherwise silently drop any id containing \n.
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("\n", "&#10;").replace("\r", "&#13;")

  /** Single-quote escaper shared by the statement formats (Cypher,
    * Gremlin). Newlines become \n so one statement stays one line. */
  private def q(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")
      .replace("\n", "\\n").replace("\r", "\\r")

  /** GraphML export (data_exporter.py GraphML impl): nodes(node_id) +
    * edges(from_id, to_id, relation_type). Returns the serialized lines
    * as a Dataset so the write stays distributed (`.text(path)`); use
    * `collectGraphML` for the complete single document. */
  // graph exporters accept any id type — everything serializes as string
  private def nodeIds(nodes: DataFrame): Dataset[String] = {
    import nodes.sparkSession.implicits._
    nodes.selectExpr("cast(node_id as string)").as[String]
  }
  private def edgeTriples(edges: DataFrame): Dataset[(String, String, String)] = {
    import edges.sparkSession.implicits._
    edges.selectExpr("cast(from_id as string)", "cast(to_id as string)",
      "cast(relation_type as string)").as[(String, String, String)]
  }

  def graphMlFragments(nodes: DataFrame, edges: DataFrame): Dataset[String] = {
    import nodes.sparkSession.implicits._
    val nodeLines = nodeIds(nodes).map(id => s"""    <node id="${esc(id)}"/>""")
    val edgeLines = edgeTriples(edges)
      .map { case (f, t, r) =>
        s"""    <edge source="${esc(f)}" target="${esc(t)}" label="${esc(r)}"/>"""
      }
    nodeLines.union(edgeLines)
  }

  def collectGraphML(nodes: DataFrame, edges: DataFrame): String = {
    val body = graphMlFragments(nodes, edges).collect().mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
       |  <graph id="G" edgedefault="directed">
       |$body
       |  </graph>
       |</graphml>""".stripMargin
  }

  /** RDF N-Triples export (data_exporter.py RDF impl): each edge becomes
    * a triple under a urn: namespace. Escaping is per-UTF-8-byte percent
    * encoding over a [A-Za-z0-9_.-] safe set — ':' inside ids is escaped
    * too, so a node id can never collide with the rel: predicate space. */
  def rdfTriples(edges: DataFrame): Dataset[String] = {
    import edges.sparkSession.implicits._
    def enc(s: String): String =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).flatMap { b =>
        val c = b.toChar
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-')
          c.toString
        else f"%%${b & 0xff}%02X"
      }.mkString
    edgeTriples(edges)
      .map { case (f, t, r) =>
        s"<urn:graft:${enc(f)}> <urn:graft:rel:${enc(r)}> <urn:graft:${enc(t)}> ."
      }
  }

  /** Gremlin script export (data_exporter.py Gremlin impl): addV/addE
    * statements; the edge statements look vertices up by the node_id
    * property exactly as the reference's JanusGraph writer does
    * (db/janusgraph_storage.py:116-178). */
  def gremlinStatements(nodes: DataFrame, edges: DataFrame): Dataset[String] = {
    import nodes.sparkSession.implicits._
    val n = nodeIds(nodes)
      .map(id => s"g.addV('node').property('node_id', '${q(id)}')")
    val e = edgeTriples(edges)
      .map { case (f, t, r) =>
        s"g.V().has('node_id', '${q(f)}').addE('${q(r)}')" +
          s".to(__.V().has('node_id', '${q(t)}'))"
      }
    n.union(e)
  }

  /** Cypher statement export (data_exporter.py Cypher impl). */
  def cypherStatements(nodes: DataFrame, edges: DataFrame): Dataset[String] = {
    import nodes.sparkSession.implicits._
    val n = nodeIds(nodes).map(id => s"CREATE (:Node {id: '${q(id)}'});")
    val e = edgeTriples(edges)
      .map { case (f, t, r) =>
        s"MATCH (a:Node {id: '${q(f)}'}), (b:Node {id: '${q(t)}'}) " +
          s"CREATE (a)-[:${r.toUpperCase.replaceAll("[^A-Z_]", "_")}]->(b);"
      }
    n.union(e)
  }

  /** Plain-XML export (data_exporter.py:311-356 `_export_xml`:
    * `<knowledge_graph>` with a `<nodes>`/`<relationships>` section, one
    * element per field). Fragments render per partition; only the
    * document envelope (with the metadata counts, :315-319) is
    * driver-side, via `collectXml`. */
  private def xmlNodeLine(id: String): String =
    s"    <node><node_id>${esc(id)}</node_id></node>"
  private def xmlRelLine(f: String, t: String, r: String): String =
    s"    <relationship><from_id>${esc(f)}</from_id>" +
      s"<to_id>${esc(t)}</to_id>" +
      s"<relation_type>${esc(r)}</relation_type></relationship>"

  def xmlFragments(nodes: DataFrame, edges: DataFrame): Dataset[String] = {
    import nodes.sparkSession.implicits._
    val n = nodeIds(nodes).map(xmlNodeLine _)
    val e = edgeTriples(edges).map { case (f, t, r) => xmlRelLine(f, t, r) }
    n.union(e)
  }

  def collectXml(nodes: DataFrame, edges: DataFrame): String = {
    val nLines = nodeIds(nodes).collect().map(xmlNodeLine)
    val eLines = edgeTriples(edges).collect()
      .map { case (f, t, r) => xmlRelLine(f, t, r) }
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<knowledge_graph>
       |  <metadata>
       |    <node_count>${nLines.length}</node_count>
       |    <relationship_count>${eLines.length}</relationship_count>
       |  </metadata>
       |  <nodes>
       |${nLines.mkString("\n")}
       |  </nodes>
       |  <relationships>
       |${eLines.mkString("\n")}
       |  </relationships>
       |</knowledge_graph>""".stripMargin
  }

  /** NetworkX export (data_exporter.py `_export_networkx`). The
    * reference pickles an nx.DiGraph — a Python-only artifact; the
    * portable NetworkX interchange is node-link JSON
    * (`networkx.node_link_data` / loadable with `nx.node_link_graph`),
    * which is what this emits. One JSON document; node and link entries
    * are rendered distributed via Spark's JSON expression, the envelope
    * is driver-side. */
  def nodeLinkJson(nodes: DataFrame, edges: DataFrame): String = {
    import nodes.sparkSession.implicits._
    val n = nodeIds(nodes)
      .map(id => s"""{"id": ${jsonStr(id)}}""").collect()
    val l = edgeTriples(edges).map { case (f, t, r) =>
      s"""{"source": ${jsonStr(f)}, "target": ${jsonStr(t)}, """ +
        s""""relation_type": ${jsonStr(r)}}"""
    }.collect()
    s"""{"directed": true, "multigraph": false, "graph": {},
       | "nodes": [${n.mkString(", ")}],
       | "links": [${l.mkString(", ")}]}""".stripMargin
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
