package graft

import graft.pipeline.Merging

/** Deep metadata merge — the exact assertions of the reference's
  * tests/test_merging.py:24-110 (test_deep_merge_dicts and the
  * extra_metadata case of test_merge_node_data). */
class MergingSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): Map[String, Any] = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.readValue(s, classOf[Map[String, Any]])
  }

  test("simple merge: b wins on conflicts, union of keys") {
    val got = parse(Merging.deepMergeJson(
      """{"a": 1, "b": 2}""", """{"b": 3, "c": 4}"""))
    assert(got === Map("a" -> 1, "b" -> 3, "c" -> 4))
  }

  test("nested dicts merge recursively") {
    val got = parse(Merging.deepMergeJson(
      """{"a": {"x": 1, "y": 2}, "b": 3}""",
      """{"a": {"y": 3, "z": 4}, "c": 5}"""))
    assert(got === Map("a" -> Map("x" -> 1, "y" -> 3, "z" -> 4),
      "b" -> 3, "c" -> 5))
  }

  test("b takes precedence for non-dict values (incl. dict vs scalar)") {
    val got = parse(Merging.deepMergeJson(
      """{"a": {"x": 1}, "b": [1, 2, 3]}""",
      """{"a": {"x": 2}, "b": "overridden"}"""))
    assert(got === Map("a" -> Map("x" -> 2), "b" -> "overridden"))
  }

  test("extra_metadata merge keeps existing keys, new precedence, additions") {
    // test_merge_node_data's metadata case
    val got = parse(Merging.deepMergeJson(
      """{"domain": "computer science", "importance": 0.7}""",
      """{"domain": "artificial intelligence", "language": "english"}"""))
    assert(got("domain") === "artificial intelligence") // new precedence
    assert(got("importance") === 0.7)                   // kept from existing
    assert(got("language") === "english")               // added from new
  }

  test("mergeGroupMetadata folds per group in order, later wins") {
    val df = Seq(
      ("k1", 1L, """{"domain": "cs", "importance": 0.7}"""),
      ("k1", 2L, """{"domain": "ai", "language": "en"}"""),
      ("k2", 1L, """{"solo": true}"""))
      .toDF("key", "ts", "meta")
    val got = Merging.mergeGroupMetadata(df, "key", "ts", "meta")
      .as[(String, String)].collect().toMap
    val k1 = parse(got("k1"))
    assert(k1("domain") === "ai" && k1("importance") === 0.7 &&
      k1("language") === "en")
    assert(parse(got("k2")) === Map("solo" -> true))
  }
}
