package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Exporters, Importers}
import graft.versioning.Snapshots

/** Snapshot lifecycle (create / list / restore / verify / revert) and
  * export→import round-trips for the interchange formats. */
class SnapshotImportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodes = Seq("a", "b", "c&d").toDF("node_id")
  private lazy val edges = Seq(
    ("a", "b", "likes", 0.9), ("b", "c&d", "cites", 0.7))
    .toDF("from_id", "to_id", "relation_type", "confidence")

  test("snapshot create / list / restore / verify") {
    val dir = Files.createTempDirectory("graft-snap").toString
    Snapshots.create(nodes, edges, dir, "s1", timestamp = 100L)
    Snapshots.create(nodes.limit(2), edges.limit(1), dir, "s2", timestamp = 200L)

    val listed = Snapshots.list(spark, dir)
      .select("snapshot_id", "n_nodes", "n_edges")
      .as[(String, Long, Long)].collect().toSeq
    assert(listed == Seq(("s2", 2L, 1L), ("s1", 3L, 2L))) // newest first

    val (rn, re) = Snapshots.restore(spark, dir, "s1")
    assert(rn.as[String].collect().toSet == Set("a", "b", "c&d"))
    assert(re.count() == 2)
    assert(Snapshots.verify(spark, dir, "s1"))
    assert(Snapshots.verify(spark, dir, "s2"))
  }

  test("revertToPrevious takes the second-most-recent revision per object") {
    val revs = Seq(
      ("n1", 1L, 1L, 10.0), ("n1", 2L, 2L, 20.0), ("n1", 3L, 3L, 30.0),
      ("n2", 1L, 4L, 5.0)) // single revision — cannot revert
      .toDF("id", "ts", "seq", "value")
    val out = Snapshots.revertToPrevious(revs, "id", "ts", "seq", Seq("value"))
      .select("id", "cur_value", "reverted_value", "reverted")
      .as[(String, Double, Double, Boolean)].collect().toSet
    assert(out == Set(("n1", 30.0, 20.0, true), ("n2", 5.0, 5.0, false)))
  }

  test("GraphML export round-trips through the importer") {
    val dir = Files.createTempDirectory("graft-gml").toString + "/g.graphml"
    // the newline id exercises the &#10; escaping: unescaped it would
    // split the element across text lines and silently drop the edge
    val n = nodes.union(Seq("e\nf").toDF("node_id"))
    val e = edges.union(Seq(("a", "e\nf", "likes", 0.5))
      .toDF("from_id", "to_id", "relation_type", "confidence"))
    Exporters.graphMlFragments(n, e).write.text(dir)
    val back = Importers.graphMlEdges(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(back == Set(("a", "b", "likes"), ("b", "c&d", "cites"),
      ("a", "e\nf", "likes")))
    val backNodes = Importers.graphMlNodes(spark, dir).as[String].collect().toSet
    assert(backNodes == Set("a", "b", "c&d", "e\nf"))
  }

  test("RDF N-Triples export round-trips through the importer") {
    val dir = Files.createTempDirectory("graft-rdf").toString + "/g.nt"
    Exporters.rdfTriples(edges).write.text(dir)
    val back = Importers.rdfEdges(spark, dir)
      .select("from_id", "to_id", "relation_type")
      .as[(String, String, String)].collect().toSet
    assert(back == Set(("a", "b", "likes"), ("b", "c&d", "cites")))
  }

  test("tabular edge import validates required columns") {
    val dir = Files.createTempDirectory("graft-json").toString + "/edges.json"
    Exporters.writeJson(edges, dir)
    val back = Importers.readEdges(spark, dir, Some("json"))
    assert(back.columns.toSeq == Seq("from_id", "to_id", "relation_type"))
    assert(back.count() == 2)
    val bad = Files.createTempDirectory("graft-bad").toString + "/bad.json"
    Exporters.writeJson(edges.select(col("from_id")), bad)
    val err = intercept[IllegalArgumentException] {
      Importers.readEdges(spark, bad, Some("json"))
    }
    assert(err.getMessage.contains("to_id"))
  }

  test("migrateEdges copies an edge list across formats, keeping all columns") {
    val base = Files.createTempDirectory("graft-mig").toString
    Exporters.writeJson(edges, s"$base/src.json")
    Importers.migrateEdges(spark, s"$base/src.json", s"$base/dest.parquet",
      "parquet", Some("json"))
    val back = spark.read.parquet(s"$base/dest.parquet")
    // copy-everything: the confidence column survives the migration
    assert(back.columns.toSet ==
      Set("from_id", "to_id", "relation_type", "confidence"))
    assert(back.select("from_id", "to_id", "relation_type", "confidence")
      .as[(String, String, String, Double)].collect().toSet ==
      Set(("a", "b", "likes", 0.9), ("b", "c&d", "cites", 0.7)))
  }

  test("snapshot list on an empty snapshot dir returns an empty manifest frame") {
    val dir = Files.createTempDirectory("graft-snap-empty").toString
    val listed = Snapshots.list(spark, dir)
    assert(listed.count() == 0)
    assert(listed.columns.toSeq == Seq("snapshot_id", "timestamp", "n_nodes",
      "n_edges", "nodes_checksum", "edges_checksum"))
  }

  test("GraphML import refuses a multi-line <edge> dialect instead of dropping it") {
    val dir = Files.createTempDirectory("graft-gml-bad").toString + "/bad.graphml"
    // the pretty-printed ElementTree shape the reference writes: the edge
    // attributes are split across lines, so the line pattern can't match
    Seq("<edge source=\"a\"", "      target=\"b\" label=\"likes\"/>")
      .toDF("value").coalesce(1).write.text(dir)
    val err = intercept[IllegalArgumentException] {
      Importers.graphMlEdges(spark, dir)
    }
    assert(err.getMessage.contains("single-line attribute shape"))
  }

  test("GraphML import refuses a PARTIALLY parseable file (no silent drops)") {
    val dir = Files.createTempDirectory("graft-gml-part").toString + "/part.graphml"
    // one well-formed single-line edge plus one split across lines: the
    // old any-parse guard would pass and silently drop the second edge
    Seq("""    <edge source="a" target="b" label="likes"/>""",
      "<edge source=\"c\"", "      target=\"d\" label=\"cites\"/>")
      .toDF("value").coalesce(1).write.text(dir)
    val err = intercept[IllegalArgumentException] {
      Importers.graphMlEdges(spark, dir)
    }
    assert(err.getMessage.contains("refusing to silently drop 1"))
  }

  test("Cypher export round-trips ids (relation types are export-mangled)") {
    val dir = Files.createTempDirectory("graft-cy").toString + "/g.cypher"
    val n = nodes.union(Seq("it's\nodd\\id").toDF("node_id"))
    val e = edges.union(Seq(("a", "it's\nodd\\id", "re-lates", 0.5))
      .toDF("from_id", "to_id", "relation_type", "confidence"))
    Exporters.cypherStatements(n, e).write.text(dir)
    assert(Importers.cypherNodes(spark, dir).as[String].collect().toSet ==
      Set("a", "b", "c&d", "it's\nodd\\id"))
    val back = Importers.cypherEdges(spark, dir)
      .as[(String, String, String)].collect().toSet
    // uppercase + non-[A-Z_] → '_' is the exporter's documented mangling
    assert(back == Set(("a", "b", "LIKES"), ("b", "c&d", "CITES"),
      ("a", "it's\nodd\\id", "RE_LATES")))
  }

  test("Gremlin export round-trips losslessly through the importer") {
    val dir = Files.createTempDirectory("graft-gr").toString + "/g.gremlin"
    val n = nodes.union(Seq("it's\nodd\\id").toDF("node_id"))
    val e = edges.union(Seq(("a", "it's\nodd\\id", "re-lates", 0.5))
      .toDF("from_id", "to_id", "relation_type", "confidence"))
    Exporters.gremlinStatements(n, e).write.text(dir)
    assert(Importers.gremlinNodes(spark, dir).as[String].collect().toSet ==
      Set("a", "b", "c&d", "it's\nodd\\id"))
    val back = Importers.gremlinEdges(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(back == Set(("a", "b", "likes"), ("b", "c&d", "cites"),
      ("a", "it's\nodd\\id", "re-lates")))
  }

  test("plain-XML fragments round-trip through the importer") {
    val dir = Files.createTempDirectory("graft-xml").toString + "/g.xml"
    val n = nodes.union(Seq("e\nf").toDF("node_id"))
    val e = edges.union(Seq(("a", "e\nf", "likes", 0.5))
      .toDF("from_id", "to_id", "relation_type", "confidence"))
    Exporters.xmlFragments(n, e).write.text(dir)
    assert(Importers.xmlNodes(spark, dir).as[String].collect().toSet ==
      Set("a", "b", "c&d", "e\nf"))
    val back = Importers.xmlEdges(spark, dir)
      .as[(String, String, String)].collect().toSet
    assert(back == Set(("a", "b", "likes"), ("b", "c&d", "cites"),
      ("a", "e\nf", "likes")))
  }

  test("full collectXml document round-trips through the importer") {
    // the document form adds <relationships>/<relationship_count> lines
    // that contain "<relationship" — the marker must not count them
    val base = Files.createTempDirectory("graft-xmldoc").toString
    val path = s"$base/g.xml"
    Files.writeString(java.nio.file.Path.of(path),
      Exporters.collectXml(nodes, edges))
    assert(Importers.xmlNodes(spark, path).as[String].collect().toSet ==
      Set("a", "b", "c&d"))
    assert(Importers.xmlEdges(spark, path)
      .as[(String, String, String)].collect().toSet ==
      Set(("a", "b", "likes"), ("b", "c&d", "cites")))
  }

  test("node-link JSON round-trips through nodeLinkGraph") {
    val base = Files.createTempDirectory("graft-nl").toString
    val path = s"$base/g.json"
    val n = nodes.union(Seq("e\"f").toDF("node_id"))
    val e = edges.union(Seq(("a", "e\"f", "likes", 0.5))
      .toDF("from_id", "to_id", "relation_type", "confidence"))
    Files.writeString(java.nio.file.Path.of(path), Exporters.nodeLinkJson(n, e))
    val (bn, be) = Importers.nodeLinkGraph(spark, path)
    assert(bn.as[String].collect().toSet == Set("a", "b", "c&d", "e\"f"))
    assert(be.as[(String, String, String)].collect().toSet ==
      Set(("a", "b", "likes"), ("b", "c&d", "cites"), ("a", "e\"f", "likes")))
  }

  test("extension detection routes xml/cypher/gremlin through readEdges") {
    val base = Files.createTempDirectory("graft-det").toString
    Exporters.xmlFragments(nodes, edges).write.text(s"$base/g.xml")
    Exporters.cypherStatements(nodes, edges).write.text(s"$base/g.cypher")
    Exporters.gremlinStatements(nodes, edges).write.text(s"$base/g.gremlin")
    assert(Importers.readEdges(spark, s"$base/g.xml").count() == 2)
    assert(Importers.readEdges(spark, s"$base/g.cypher").count() == 2)
    assert(Importers.readEdges(spark, s"$base/g.gremlin").count() == 2)
  }

  test("XML and node-link JSON envelopes carry counts and entries") {
    val xml = Exporters.collectXml(nodes, edges)
    assert(xml.contains("<node_count>3</node_count>"))
    assert(xml.contains("<relationship_count>2</relationship_count>"))
    assert(xml.contains("<to_id>c&amp;d</to_id>")) // escaping
    val json = Exporters.nodeLinkJson(nodes, edges)
    assert(json.contains(""""directed": true"""))
    assert(json.contains(""""source": "a", "target": "b""""))
  }
}
