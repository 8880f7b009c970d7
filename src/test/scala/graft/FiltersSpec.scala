package graft

import org.apache.spark.sql.functions._
import graft.operators.Filters
import graft.operators.Filters.{Cond, NullMode}

/** Operator-semantics tests for the 21-operator filter family, mirroring
  * the reference's tiny-fixture style (tests/test_advanced_query_engine
  * .py:288-377). */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("node1", "First test result", 0.8, "tech", 5, Seq("a", "b")),
    ("node2", "Second entry", 0.5, "science", 3, Seq("b")),
    ("node3", "third RESULT", 0.9, null.asInstanceOf[String], 7, Seq[String]()))
    .toDF("node_id", "content", "rating", "domain", "cnt", "tags")

  private def ids(c: Cond*): Set[String] =
    df.filter(Filters.all(c)).select("node_id").as[String].collect().toSet

  test("comparison operators") {
    assert(ids(Cond("rating", "eq", 0.8)) == Set("node1"))
    assert(ids(Cond("rating", "ne", 0.8)) == Set("node2", "node3"))
    assert(ids(Cond("rating", "gt", 0.5)) == Set("node1", "node3"))
    assert(ids(Cond("rating", "gte", 0.8)) == Set("node1", "node3"))
    assert(ids(Cond("cnt", "lt", 5)) == Set("node2"))
    assert(ids(Cond("cnt", "lte", 5)) == Set("node1", "node2"))
    assert(ids(Cond("rating", "between", 0.6, 0.85)) == Set("node1"))
    // date_range: typed-domain between (the reference's 6-format datetime
    // parse collapses onto the column's native ordering)
    assert(ids(Cond("rating", "date_range", 0.6, 0.85)) == Set("node1"))
  }

  test("set membership") {
    assert(ids(Cond("domain", "in", Seq("tech", "science"))) == Set("node1", "node2"))
    assert(ids(Cond("domain", "not_in", Seq("tech"))) == Set("node2"))
  }

  test("string operators") {
    assert(ids(Cond("content", "contains", "test")) == Set("node1"))
    assert(ids(Cond("content", "not_contains", "test")) == Set("node2", "node3"))
    assert(ids(Cond("content", "starts_with", "First")) == Set("node1"))
    assert(ids(Cond("content", "ends_with", "result")) == Set("node1"))
    assert(ids(Cond("content", "regex", "^[Ft]")) == Set("node1", "node3"))
    // case-insensitive compare lowers both sides (filter_processor.py:171-175)
    assert(ids(Cond("content", "contains", "RESULT", caseSensitive = false)) ==
      Set("node1", "node3"))
  }

  test("null and empty operators") {
    assert(ids(Cond("domain", "exists")) == Set("node1", "node2"))
    assert(ids(Cond("domain", "not_exists")) == Set("node3"))
    assert(ids(Cond("domain", "empty")) == Set("node3"))
    assert(ids(Cond("domain", "not_empty")) == Set("node1", "node2"))
  }

  test("array operators") {
    assert(ids(Cond("tags", "array_contains", "a")) == Set("node1"))
    assert(ids(Cond("tags", "array_length", 1)) == Set("node2"))
  }

  test("null modes: exclude fails nulls, include passes them") {
    assert(ids(Cond("domain", "eq", "tech")) == Set("node1"))
    assert(ids(Cond("domain", "eq", "tech", nullMode = NullMode.Include)) ==
      Set("node1", "node3"))
  }

  test("null mode as_value: null == null matches, null != value fails") {
    assert(ids(Cond("domain", "eq", null, nullMode = NullMode.AsValue)) ==
      Set("node3"))
    assert(ids(Cond("domain", "eq", "tech", nullMode = NullMode.AsValue)) ==
      Set("node1"))
    // ne treats null as a value: null != "tech" holds
    assert(ids(Cond("domain", "ne", "tech", nullMode = NullMode.AsValue)) ==
      Set("node2", "node3"))
    // in/not_in with a null element
    assert(ids(Cond("domain", "in", Seq("tech", null), nullMode = NullMode.AsValue)) ==
      Set("node1", "node3"))
    assert(ids(Cond("domain", "not_in", Seq("tech", null), nullMode = NullMode.AsValue)) ==
      Set("node2"))
  }

  test("empty/not_empty recognize empty arrays (schema-aware allFor)") {
    def idsFor(conds: Cond*) =
      df.filter(Filters.allFor(df, conds)).select("node_id")
        .as[String].collect().toSet
    assert(idsFor(Cond("tags", "empty")) == Set("node3"))
    assert(idsFor(Cond("tags", "not_empty")) == Set("node1", "node2"))
  }

  test("unknown operator passes rows through (filter_processor.py:160-163)") {
    assert(ids(Cond("rating", "no_such_op", 1)) == Set("node1", "node2", "node3"))
  }

  test("AND-fold across conditions") {
    assert(ids(Cond("rating", "gt", 0.4), Cond("cnt", "lt", 6)) ==
      Set("node1", "node2"))
  }

  test("boolean word coercion") {
    val b = Seq(("x", "true"), ("y", "0"), ("z", "yes")).toDF("id", "flag")
    val got = b.filter(Filters.boolWords(col("flag"))).select("id")
      .as[String].collect().toSet
    assert(got == Set("x", "z"))
  }
}
