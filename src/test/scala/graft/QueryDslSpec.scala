package graft

import org.apache.spark.sql.functions._
import graft.query.{NaturalLanguage, QuerySpec, RequestNormalizer}
import graft.pipeline.Ingestion
import graft.sources.Exporters

class QueryDslSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodes = Seq(
    ("n1", "alpha beta", "s1", 0.9),
    ("n2", "beta gamma", "s1", 0.4),
    ("n3", "gamma delta", "s2", 0.7),
    ("n4", "ALPHA loud", "s2", 0.5))
    .toDF("node_id", "content", "source", "rating")

  test("DSL: filter + sort + project") {
    val spec = QuerySpec.builder()
      .where("rating", "gte", 0.5)
      .orderBy("rating", ascending = false)
      .select("node_id", "rating")
      .build()
    val got = QuerySpec.run(nodes, spec).as[(String, Double)].collect().toSeq
    assert(got == Seq(("n1", 0.9), ("n3", 0.7), ("n4", 0.5)))
  }

  test("DSL: contains is case-insensitive in the structured dialect") {
    val spec = QuerySpec.builder().where("content", "contains", "alpha").build()
    val got = QuerySpec.run(nodes, spec).select("node_id")
      .as[String].collect().toSet
    assert(got == Set("n1", "n4"))
  }

  test("DSL: uppercase dialect spelling resolves, not unknown-op pass-through") {
    val spec = QuerySpec.builder().where("content", "CONTAINS", "alpha").build()
    val got = QuerySpec.run(nodes, spec).select("node_id")
      .as[String].collect().toSet
    assert(got === Set("n1", "n4")) // would be all 4 if CONTAINS fell through
  }

  test("NL: contractions don't open quoted-entity spans") {
    val p = NaturalLanguage.parse("what's similar to 'hash join'")
    assert(p.entities === Seq("hash join"))
  }

  test("DSL: aggregation with default alias and empty-avg=0") {
    val spec = QuerySpec.builder()
      .where("source", "eq", "s1")
      .groupBy("source")
      .aggregate("count", "*", "n")
      .aggregate("avg", "rating")
      .build()
    val row = QuerySpec.run(nodes, spec).collect()(0)
    assert(row.getAs[Long]("n") == 2L)
    assert(math.abs(row.getAs[Double]("avg_rating") - 0.65) < 1e-9)
    val empty = QuerySpec.builder().where("source", "eq", "nope")
      .aggregate("avg", "rating").build()
    assert(QuerySpec.run(nodes, empty).collect()(0).getAs[Double]("avg_rating") == 0.0)
  }

  test("DSL: offset pagination") {
    val spec = QuerySpec.builder().orderBy("node_id").offset(1).limit(2)
      .select("node_id").build()
    assert(QuerySpec.run(nodes, spec).as[String].collect().toSeq == Seq("n2", "n3"))
  }

  test("DSL validator collects every error, mirrors the reference checks") {
    import QuerySpec.Validator
    // valid spec → no errors (test_query_language.py test_valid_node_query)
    val ok = QuerySpec.builder().where("content", "contains", "x")
      .select("id", "content").limit(10).build()
    assert(Validator.validate(ok, "nodes").isEmpty)
    // each invalid facet produces its own error string, all collected
    val bad = QuerySpec.builder()
      .where("content", "frobnicate", "x")  // invalid operator
      .where("nope", "eq", "x")             // invalid field for nodes
      .select("also_nope")                  // invalid projection field
      .aggregate("median", "rating")        // invalid aggregation
      .limit(-1)                            // negative limit
      .build()
    val errs = Validator.validate(bad, "nodes")
    assert(errs.exists(_.contains("Invalid filter operator: frobnicate")))
    assert(errs.exists(_.contains("Invalid field 'nope'")))
    assert(errs.exists(_.contains("Invalid projection field 'also_nope'")))
    assert(errs.exists(_.contains("Invalid aggregation operation: median")))
    assert(errs.contains("Limit must be non-negative"))
    assert(errs.size === 5)
    // invalid query type; field checks skipped for types with no universe
    assert(Validator.validate(ok, "bogus")
      .contains("Invalid query type: bogus"))
    assert(Validator.validate(ok, "search")
      .isEmpty) // search has no field universe → only structural checks
  }

  test("NL classification rules") {
    import NaturalLanguage._
    assert(classify("how many nodes are about x") == CountAggregation)
    assert(classify("what is related to y") == FindRelationships)
    assert(classify("find documents similar to z") == SimilaritySearch)
    assert(classify("show the path through a and b") == ComplexPattern)
    assert(classify("tell me about spark") == FindNodes)
    val p = parse("""find docs similar to "hash join" please""")
    assert(p.intent == SimilaritySearch && p.entities == Seq("hash join"))
    assert(p.semanticThreshold == 0.75)
    assert(p.filters.head.value == "hash join")
  }

  test("request normalization clamps") {
    assert(RequestNormalizer.clampThreshold(0.3) == 0.6)
    assert(RequestNormalizer.clampThreshold(0.99) == 0.85)
    assert(RequestNormalizer.clampThreshold(0.7) == 0.7)
    assert(RequestNormalizer.clampDepth(5, None) == 3)
    assert(RequestNormalizer.clampDepth(5, Some(10)) == 5)
  }

  test("ingestion pipeline: extract, merge, embed, discover") {
    val docs = Seq(
      (1L, "alpha beta gamma. delta epsilon", "s1"),
      (2L, "gamma beta alpha. unrelated words here", "s1"),
      (3L, "totally different content", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Ingestion.ingest(spark, docs, jaccardThreshold = 0.5)
    val n = r.nodes.collect()
    // "alpha beta gamma" and "gamma beta alpha" merge (same token set)
    assert(n.exists(_.getAs[Long]("merged_from") == 2L))
    assert(r.embeddings.count() == r.nodes.count())
    val dim = r.embeddings.select("embedding").as[Seq[Float]].collect()
    assert(dim.forall(_.length == 64))
    // SAME_SOURCE edges exist within s1
    assert(r.edges.filter(col("relation_type") === "SAME_SOURCE").count() > 0)
    assert(r.revisions.count() == r.nodes.count())
  }

  test("ingestion: null text skipped; merged nodes still pair by origin source") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "gamma beta alpha", "s2"),        // merges with doc 1 → sources s1; s2
      (3L, "separate content entirely", "s1"),
      (4L, null.asInstanceOf[String], "s1")) // must not NPE the job
      .toDF("doc_id", "text", "source")
    val r = Ingestion.ingest(spark, docs)
    assert(r.nodes.count() === 2) // merged pair + doc 3; null row dropped
    val merged = r.nodes.filter(col("merged_from") === 2).collect()(0)
    assert(merged.getAs[String]("source") === "s1; s2")
    // the merged node came from s1 too → SAME_SOURCE with doc 3's node
    val ss = r.edges.filter(col("relation_type") === "SAME_SOURCE").count()
    assert(ss === 1)
    // exporters compose directly with ingestion output (long ids cast)
    assert(Exporters.rdfTriples(r.edges).count() === r.edges.count())
  }

  test("exporters: graphml + cypher serialize the graph") {
    val ns = Seq("a", "b").toDF("node_id")
    val es = Seq(("a", "b", "rel_type")).toDF("from_id", "to_id", "relation_type")
    val xml = Exporters.collectGraphML(ns, es)
    assert(xml.contains("""<node id="a"/>"""))
    assert(xml.contains("""<edge source="a" target="b" label="rel_type"/>"""))
    val cy = Exporters.cypherStatements(ns, es).collect().toSet
    assert(cy.exists(_.startsWith("CREATE (:Node {id: 'a'})")))
    assert(cy.exists(_.contains("[:REL_TYPE]")))
    val rdf = Exporters.rdfTriples(es).collect()
    assert(rdf === Array("<urn:graft:a> <urn:graft:rel:rel_type> <urn:graft:b> ."))
    val gr = Exporters.gremlinStatements(ns, es).collect().toSet
    assert(gr.contains("g.addV('node').property('node_id', 'a')"))
    assert(gr.exists(_.contains(".addE('rel_type')")))
  }

  test("json export/import roundtrip preserves the graph tables") {
    val es = Seq(("a", "b", "t", 0.9), ("b", "c", "u", 0.8))
      .toDF("from_id", "to_id", "relation_type", "confidence")
    val dir = java.nio.file.Files.createTempDirectory("jsonrt").toString
    Exporters.writeJson(es, dir)
    val back = spark.read.json(dir)
      .select("from_id", "to_id", "relation_type", "confidence")
      .as[(String, String, String, Double)].collect().toSet
    assert(back === Set(("a", "b", "t", 0.9), ("b", "c", "u", 0.8)))
  }

  test("SQL function registration (cosine_sim via extensions)") {
    GraftExtensions.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vv")
    val got = spark.sql("SELECT cosine_sim(a, b) AS c, vec_dot(a, b) AS d FROM vv")
      .collect()(0)
    assert(got.getDouble(0) == 1.0 && got.getDouble(1) == 1.0)
  }

  test("SQL function registration (set_overlap + cdc_cuts)") {
    GraftExtensions.register(spark)
    Seq((Seq("a", "b", "c"), Seq("b", "c", "d"), "abcdefgh"))
      .toDF("x", "y", "t").createOrReplaceTempView("ov")
    val got = spark.sql(
      "SELECT set_overlap(x, y) AS o, size(cdc_cuts(t)) AS nc FROM ov")
      .collect()(0)
    assert(got.getLong(0) == 2L && got.getInt(1) >= 0)
  }
}
