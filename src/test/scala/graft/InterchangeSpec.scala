package graft

import org.apache.spark.sql.functions._
import graft.model.Interchange
import graft.semantic.VectorSearch

/** Standardized interchange (data_formats.py): identifier string
  * render/parse and the StandardizedKnowledge JSON envelope, plus the
  * AUTO index-selection policy. */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  test("identifier render/parse round-trips all four format variants") {
    // (namespace, module, type, id, version) — the reference's optional
    // prefix/suffix combinations (data_formats.py:101-138)
    val rows = Seq(
      (None, "core", "knowledge_node", "n1", None),
      (Some("prod"), "core", "knowledge_node", "n2", None),
      (None, "ing", "relationship", "e3", Some("2")),
      (Some("stage"), "q", "query", "q4", Some("10")))
      .toDF("ns", "module", "etype", "eid", "ver")
    val rendered = rows.select(Interchange.renderId(col("module"),
      col("etype"), col("eid"), col("ns"), col("ver")).as("s"), col("ns"),
      col("module"), col("etype"), col("eid"), col("ver"))
    // exact string forms the reference produces
    assert(rendered.select("s").as[String].collect().toSet === Set(
      "core:knowledge_node:n1", "prod:core:knowledge_node:n2",
      "ing:relationship:e3:v2", "stage:q:query:q4:v10"))
    val back = rendered.select(Interchange.parseId(col("s")).as("p"),
      col("ns"), col("module"), col("etype"), col("eid"), col("ver"))
    back.collect().foreach { r =>
      val p = r.getStruct(0)
      assert(p.getAs[String]("namespace") === r.getAs[String]("ns"))
      assert(p.getAs[String]("module") === r.getAs[String]("module"))
      assert(p.getAs[String]("entity_type") === r.getAs[String]("etype"))
      assert(p.getAs[String]("entity_id") === r.getAs[String]("eid"))
      assert(p.getAs[String]("version") === r.getAs[String]("ver"))
    }
  }

  test("malformed identifiers parse to NULL instead of wrong fields") {
    val got = Seq("onlyone", "two:parts").toDF("s")
      .select(Interchange.parseId(col("s")).as("p")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("StandardizedKnowledge JSON envelope round-trips node columns") {
    val nodes = Seq(
      ("n1", "some content", "src_a", Seq("t1", "t2"), 1700000000.5),
      ("n2", "other \"quoted\" content", "src_b", Seq.empty[String], 1700000001.0))
      .toDF("node_id", "content", "source", "tags", "creation_timestamp")
    val json = Interchange.knowledgeJson(nodes, moduleId = "graft")
    assert(json.as[String].collect()
      .forall(_.contains(""""entity_type":"knowledge_node"""")))
    val back = Interchange.fromKnowledgeJson(json)
      .as[(String, String, String, Seq[String], Double)].collect().toSet
    assert(back === Set(
      ("n1", "some content", "src_a", Seq("t1", "t2"), 1700000000.5),
      ("n2", "other \"quoted\" content", "src_b", Seq.empty[String], 1700000001.0)))
  }

  test("AUTO index policy picks the documented family per corpus size") {
    assert(VectorSearch.autoIndex(1000L) === "FLAT")
    assert(VectorSearch.autoIndex(1000000L) === "IVF_FLAT")
    assert(VectorSearch.autoIndex(500000000L) === "IVF_SQ8")
    assert(VectorSearch.autoIndex(1000L, storageBound = true) === "IVF_PQ")
  }

  test("AUTO gates PQ on codebook size: small books fall back to SQ8") {
    // measured: 10-codeword books give recall@10 = 0.16 (docs/TUNING.md)
    // — AUTO must not hand that out even when storage dominates
    assert(VectorSearch.autoIndex(1000L, storageBound = true,
      codebookSize = 10) === "IVF_SQ8")
    assert(VectorSearch.autoIndex(1000L, storageBound = true,
      codebookSize = VectorSearch.MinPqCodebookSize) === "IVF_PQ")
    // the gate only applies to the storage-bound branch
    assert(VectorSearch.autoIndex(1000L, codebookSize = 10) === "FLAT")
  }
}
