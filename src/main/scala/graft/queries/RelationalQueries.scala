package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Filters
import graft.operators.Filters.Cond

/** Scans, projections, the 21-operator filter family, aggregations,
  * multi-criteria sort + pagination — SURVEY.md §2.1/§2.2/§2.4/§2.5.
  *
  * All filters/projections are plain Column expressions so Catalyst pushes
  * them into the parquet scan; aggregations get partial (map-side) combine
  * from Spark's hash aggregate automatically — at 100 TB these are
  * scan-dominated with no extra shuffle beyond the one groupBy exchange.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // -- q01: flagship pricing-summary aggregation (count/sum/avg over groups)
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 4) AS sum_qty,
      |  round(sum(l_extendedprice), 4) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- q02: scan + projection + numeric/date predicates (pushdown demo)
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(Filters.all(Seq(
        Cond("l_quantity", "between", 10.0, 40.0),
        Cond("l_discount", "gt", 0.02),
        Cond("l_returnflag", "ne", "R"))))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(500)

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10.0 AND 40.0 AND l_discount > 0.02
      |  AND l_returnflag <> 'R'
      |ORDER BY l_orderkey, l_linenumber
      |LIMIT 500""".stripMargin

  // -- q03: comparison + set-membership filter operators (eq/gt/lte/in/not_in)
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(Filters.all(Seq(
        Cond("o_orderstatus", "in", Seq("O", "F")),
        Cond("o_orderpriority", "not_in", Seq("1-URGENT")),
        Cond("o_totalprice", "gte", 50000.0),
        Cond("o_totalprice", "lt", 200000.0))))
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  private val q03Sql =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('O','F')
      |  AND o_orderpriority NOT IN ('1-URGENT')
      |  AND o_totalprice >= 50000.0 AND o_totalprice < 200000.0
      |ORDER BY o_orderkey""".stripMargin

  // -- q04: string filter operators (contains / starts/ends_with / regex /
  //         case-insensitive eq) — filter_processor.py:283-424
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(Filters.all(Seq(
        Cond("p_name", "contains", "e"),
        Cond("p_name", "not_contains", "widget"),
        Cond("p_type", "regex", "^(ECONOMY|STANDARD|PROMO)$"),
        Cond("p_brand", "starts_with", "Brand#1"))))
      .filter(Filters.toColumn(Cond("p_name", "ends_with", "R", caseSensitive = false)))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  private val q04Sql =
    """SELECT p_partkey, p_name, p_brand, p_type
      |FROM part
      |WHERE contains(p_name, 'e') AND NOT contains(p_name, 'widget')
      |  AND regexp_matches(p_type, '^(ECONOMY|STANDARD|PROMO)$')
      |  AND starts_with(p_brand, 'Brand#1')
      |  AND ends_with(lower(p_name), lower('R'))
      |ORDER BY p_partkey""".stripMargin

  // -- q05: null/empty/array operators over synthesized nulls + token arrays
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("nonEn", nullif(col("lang"), lit("en")))
      .withColumn("tokens", split(col("text"), " "))
      .filter(Filters.all(Seq(
        Cond("nonEn", "not_exists"),
        Cond("text", "not_empty"))))
      .filter(array_contains(col("tokens"), "spark"))
      .select(col("doc_id"), size(col("tokens")).as("n_tokens"))
      .filter(col("n_tokens") > 20)
      .orderBy(col("doc_id"))

  private val q05Sql =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      |FROM documents
      |WHERE nullif(lang, 'en') IS NULL
      |  AND text IS NOT NULL AND len(text) > 0
      |  AND list_contains(string_split(text, ' '), 'spark')
      |  AND len(string_split(text, ' ')) > 20
      |ORDER BY doc_id""".stripMargin

  // -- q06: multi-criteria sort + offset/limit pagination
  //         query_language.py:590-626; pagination query_engine.py:196-198.
  //         Native offset+limit after orderBy compiles to
  //         TakeOrderedAndProject (per-partition heaps, no global sort, no
  //         single-partition window); row numbers are then assigned on the
  //         50 surviving rows only.
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val page = t(s, dir, "orders")
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
      .offset(100).limit(50)
    val w = Window.orderBy(col("o_orderpriority").asc_nulls_first,
      col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
    page
      .withColumn("rn", row_number().over(w) + 100) // window over 50 rows
      .select(col("rn"), col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("rn"))
  }

  private val q06Sql =
    """SELECT rn, o_orderkey, o_orderpriority, o_totalprice FROM (
      |  SELECT row_number() OVER (ORDER BY o_orderpriority ASC NULLS FIRST,
      |    o_totalprice DESC NULLS LAST, o_orderkey ASC) AS rn,
      |    o_orderkey, o_orderpriority, o_totalprice
      |  FROM orders) x
      |WHERE rn > 100 AND rn <= 150
      |ORDER BY rn""".stripMargin

  // -- q07: multi-field group_by with null→'null' and '|'-joined display key
  //         (filter_processor.py:584-616 semantics)
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket",
        when(col("k").isNull, lit(null)).otherwise((col("k") % 3).cast("string")))
      .groupBy(col("event_type"), col("k_bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .withColumn("group_key",
        concat_ws("|", coalesce(col("event_type"), lit("null")),
          coalesce(col("k_bucket"), lit("null"))))
      .select(col("group_key"), col("cnt"), col("sum_value"))
      .orderBy(col("group_key"))

  private val q07Sql =
    """SELECT coalesce(event_type, 'null') || '|' ||
      |    coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT) % 3, 'null')
      |    AS group_key,
      |  count(*) AS cnt, round(sum(value), 4) AS sum_value
      |FROM events
      |GROUP BY 1
      |ORDER BY group_key""".stripMargin

  // -- q08: distinct (dropDuplicates semantics)
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q08Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- q09: reference "having" = pre-aggregation row filter
  //         (filter_processor.py:474-479 — NOT SQL HAVING)
  private def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_acctbal") > 0)                 // the "having" row filter
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("c_acctbal")), 6).as("avg_bal"),
        round(min(col("c_acctbal")), 4).as("min_bal"),
        round(max(col("c_acctbal")), 4).as("max_bal"),
        round(sum(col("c_acctbal")), 4).as("sum_bal"))
      .orderBy(col("c_mktsegment"))

  private val q09Sql =
    """SELECT c_mktsegment, count(*) AS cnt,
      |  round(avg(c_acctbal), 6) AS avg_bal,
      |  round(min(c_acctbal), 4) AS min_bal,
      |  round(max(c_acctbal), 4) AS max_bal,
      |  round(sum(c_acctbal), 4) AS sum_bal
      |FROM customer WHERE c_acctbal > 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -- q10: avg-of-empty-group = 0 semantics (filter_processor.py:502-540)
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "customer").filter(col("c_acctbal") > 9999999),
        col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(coalesce(round(avg(col("c_acctbal")), 6), lit(0.0)).as("avg_bal"),
        count(col("c_custkey")).as("cnt"))
      .orderBy(col("n_name"))

  private val q10Sql =
    """SELECT n_name,
      |  coalesce(round(avg(c_acctbal), 6), 0.0) AS avg_bal,
      |  count(c_custkey) AS cnt
      |FROM nation LEFT JOIN customer
      |  ON n_nationkey = c_nationkey AND c_acctbal > 9999999
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql), headline = true),
    Q("q02_scan_filter_project", q02, Some(q02Sql), headline = true),
    Q("q03_filter_compare_in", q03, Some(q03Sql)),
    Q("q04_filter_strings", q04, Some(q04Sql)),
    Q("q05_filter_null_array", q05, Some(q05Sql)),
    Q("q06_sort_pagination", q06, Some(q06Sql)),
    Q("q07_groupby_multi_null", q07, Some(q07Sql)),
    Q("q08_distinct", q08, Some(q08Sql)),
    Q("q09_having_preagg", q09, Some(q09Sql)),
    Q("q10_avg_empty_group", q10, Some(q10Sql)))
}
