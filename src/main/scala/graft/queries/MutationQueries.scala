package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.text.{TextFunctions => TF}

/** Mutation / maintenance operators (SURVEY.md §2.9) in their
  * batch-analytical form: merge rules, clamped rating updates, revision
  * last-prior-state lookup, merge-or-create dedup upsert. On a Delta
  * lake these become MERGE INTO; the expressions below are exactly the
  * merge/update rules, verified against the oracle.
  */
object MutationQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Normalized content key shared by the dedup/merge queries. */
  private def normKey = md5(array_join(array_sort(TF.distinctTokens(col("text"))), " "))
  private val normKeySql =
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"

  // -- q52: node-data merge rules (merging.py:114-204): ratings → max,
  //         tags → sorted set union, sources → '; '-joined set union
  private def q52(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("key", normKey)
      .withColumn("q", TF.qualityScore(col("text"), col("n_chars")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_merged"),
        min(col("doc_id")).as("keep_id"),
        round(max(col("q")), 6).as("rating_max"),
        array_join(array_sort(collect_set(col("source"))), "; ").as("source_details"),
        array_join(array_sort(array_distinct(flatten(
          collect_list(TF.distinctTokens(col("text")))))), ",").as("tags"))
      .filter(col("n_merged") > 1)
      .orderBy(col("key"))

  private val q52Sql =
    s"""WITH d AS (SELECT doc_id, source, text,
       |  $normKeySql AS key,
       |  ${TF.sql.qualityScore("text", "n_chars")} AS q
       |  FROM documents)
       |SELECT key, count(*) AS n_merged, min(doc_id) AS keep_id,
       |  round(max(q), 6) AS rating_max,
       |  array_to_string(list_sort(list_distinct(list(source))), '; ') AS source_details,
       |  array_to_string(list_sort(list_distinct(flatten(
       |    list(list_distinct(string_split(text, ' ')))))), ',') AS tags
       |FROM d GROUP BY key HAVING count(*) > 1
       |ORDER BY key""".stripMargin

  // -- q53: rating update with clamp (rating_system.py:62-130):
  //         truthfulness += 0.2·confirmation − 0.2·contradiction, [0,1]
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val toks = TF.distinctTokens(col("text"))
    docs(s, dir)
      .withColumn("rating", TF.qualityScore(col("text"), col("n_chars")))
      .withColumn("confirms", when(array_contains(toks, "fast"), 1).otherwise(0))
      .withColumn("contradicts", when(array_contains(toks, "slow"), 1).otherwise(0))
      .withColumn("updated", least(greatest(
        col("rating") + lit(0.2) * col("confirms") - lit(0.2) * col("contradicts"),
        lit(0.0)), lit(1.0)))
      .select(col("doc_id"), round(col("rating"), 6).as("rating"),
        col("confirms"), col("contradicts"), round(col("updated"), 6).as("updated"))
      .orderBy(col("doc_id"))
  }

  private val q53Sql =
    s"""WITH d AS (SELECT doc_id,
       |  ${TF.sql.qualityScore("text", "n_chars")} AS rating,
       |  CASE WHEN list_contains(list_distinct(string_split(text,' ')), 'fast') THEN 1 ELSE 0 END AS confirms,
       |  CASE WHEN list_contains(list_distinct(string_split(text,' ')), 'slow') THEN 1 ELSE 0 END AS contradicts
       |  FROM documents)
       |SELECT doc_id, round(rating, 6) AS rating, confirms, contradicts,
       |  round(least(greatest(rating + 0.2 * confirms - 0.2 * contradicts, 0.0), 1.0), 6) AS updated
       |FROM d ORDER BY doc_id""".stripMargin

  // -- q54: revision log last-prior-state lookup (revision_manager
  //         .py:322-400 revert): latest change + its predecessor per object
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec").desc, col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_event_id", lead(col("event_id"), 1).over(w))
      .withColumn("prev_value", lead(col("value"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("prev_event_id"), round(col("prev_value"), 6).as("prev_value"))
      .orderBy(col("user_id"))
  }

  private val q54Sql =
    """SELECT user_id, event_id AS last_event_id, prev_event_id,
      |  round(prev_value, 6) AS prev_value
      |FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER w AS rn,
      |    lead(event_id, 1) OVER w AS prev_event_id,
      |    lead(value, 1) OVER w AS prev_value
      |  FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY sec DESC, event_id DESC)) x
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // -- q55: merge-or-create dedup upsert (merging.py:17-111): incoming
  //         batch matched against existing corpus on the normalized key —
  //         match ⇒ merge into keep_id, else create
  private def q55(s: SparkSession, dir: String): DataFrame = {
    val all = docs(s, dir).withColumn("key", normKey)
    val incoming = all.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("in_id"), col("key"))
    val existing = all.filter(col("doc_id") % 7 =!= 0)
      .groupBy(col("key")).agg(min(col("doc_id")).as("keep_id"))
    incoming.join(existing, Seq("key"), "left")
      .withColumn("action",
        when(col("keep_id").isNotNull, lit("merge")).otherwise(lit("create")))
      .select(col("in_id"), col("action"), col("keep_id"))
      .orderBy(col("in_id"))
  }

  private val q55Sql =
    s"""WITH all_d AS (SELECT doc_id, $normKeySql AS key FROM documents),
       |incoming AS (SELECT doc_id AS in_id, key FROM all_d WHERE doc_id % 7 = 0),
       |existing AS (SELECT key, min(doc_id) AS keep_id FROM all_d
       |             WHERE doc_id % 7 <> 0 GROUP BY key)
       |SELECT in_id,
       |  CASE WHEN keep_id IS NOT NULL THEN 'merge' ELSE 'create' END AS action,
       |  keep_id
       |FROM incoming LEFT JOIN existing USING (key)
       |ORDER BY in_id""".stripMargin

  // -- q69: merge-two-nodes graph contraction (sqlite_storage.py:798-840,
  //         janusgraph_storage.py:454-514): odd customers merge into their
  //         even predecessor; all edges are redirected through the mapping,
  //         self-loops dropped, result summarized per relation type
  private def q69(s: SparkSession, dir: String): DataFrame = {
    val e = graft.graph.KGraph.materialized(s, dir)
    def contract(c: org.apache.spark.sql.Column) = {
      val key = substring_index(c, ":", -1).cast("long")
      when(c.startsWith("c:") && key % 2 === 1,
        concat(lit("c:"), (key - 1).cast("string"))).otherwise(c)
    }
    e.withColumn("f2", contract(col("from_id")))
      .withColumn("t2", contract(col("to_id")))
      .filter(col("f2") =!= col("t2")) // skip self-loops, as the reference does
      .groupBy(col("relation_type"))
      .agg(count(lit(1)).as("n_edges"),
        countDistinct(col("f2")).as("n_from"),
        countDistinct(col("t2")).as("n_to"))
      .orderBy(col("relation_type"))
  }

  private val q69Sql = {
    def contract(c: String) =
      s"""CASE WHEN $c LIKE 'c:%' AND CAST(string_split($c, ':')[2] AS BIGINT) % 2 = 1
         |  THEN 'c:' || (CAST(string_split($c, ':')[2] AS BIGINT) - 1)
         |  ELSE $c END""".stripMargin
    s"""WITH ${graft.graph.KGraph.edgesSql},
       |m AS (SELECT ${contract("from_id")} AS f2, ${contract("to_id")} AS t2,
       |             relation_type
       |      FROM edges)
       |SELECT relation_type, count(*) AS n_edges,
       |  count(DISTINCT f2) AS n_from, count(DISTINCT t2) AS n_to
       |FROM m WHERE f2 <> t2
       |GROUP BY relation_type ORDER BY relation_type""".stripMargin
  }

  // -- q327: type-2 slowly-changing-dimension build (Kimball's SCD2;
  //          the warehouse op behind every "effective-dated" dimension)
  //          from the event stream treated as a change log: per user,
  //          consecutive runs of the same event_type collapse into one
  //          VERSION with [valid_from, valid_to) second bounds —
  //          valid_to = the next version's start, the current
  //          version's horizon = the user's last observed event.
  //          Complements q54 (last-prior revision VALUE) with the full
  //          validity-interval construction. Determinism: second-
  //          truncated epochs, (sec, event_id) total order, integer
  //          durations. Scale shape: lag/lead windows partitioned per
  //          user (the natural SCD grain — a hot key bounds the
  //          partition; the q141 two-level decomposition is the
  //          documented fallback for a pathological single key), then
  //          one keyed agg; #users rows out.
  private def q327(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("CAST(ts AS LONG)").as("sec"), col("event_type"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val changes = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("horizon", max(col("sec")).over(
        Window.partitionBy(col("user_id"))))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    val versions = changes
      .withColumn("valid_to",
        coalesce(lead(col("sec"), 1).over(byUser), col("horizon")))
      .withColumn("dur", col("valid_to") - col("sec"))
    versions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_versions"),
        min(col("sec")).as("first_sec"),
        max(col("horizon")).as("horizon_sec"),
        max(struct(col("sec"), col("event_type"))).as("cur"),
        max(col("dur")).as("longest_version_sec"))
      .select(col("user_id"), col("n_versions"), col("first_sec"),
        col("horizon_sec"), col("cur.event_type").as("current_type"),
        col("cur.sec").as("current_since_sec"),
        col("longest_version_sec"))
      .orderBy(col("user_id"))
  }

  private val q327Sql =
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type
       |  FROM events),
       |lagd AS (
       |  SELECT *,
       |    lag(event_type) OVER w AS prev_type,
       |    max(sec) OVER (PARTITION BY user_id) AS horizon
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       |changes AS (
       |  SELECT * FROM lagd
       |  WHERE prev_type IS NULL OR prev_type <> event_type),
       |versions AS (
       |  SELECT user_id, sec, event_type, horizon,
       |    coalesce(lead(sec) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id), horizon) - sec AS dur,
       |    coalesce(lead(sec) OVER (PARTITION BY user_id
       |      ORDER BY sec, event_id), horizon) AS valid_to
       |  FROM changes)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions,
       |  min(sec) AS first_sec, max(horizon) AS horizon_sec,
       |  max(struct_pack(sec := sec, event_type := event_type))
       |    .event_type AS current_type,
       |  max(struct_pack(sec := sec, event_type := event_type))
       |    .sec AS current_since_sec,
       |  max(dur) AS longest_version_sec
       |FROM versions GROUP BY user_id ORDER BY user_id""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q52_merge_rules", q52, Some(q52Sql)),
    Q("q53_rating_update", q53, Some(q53Sql)),
    Q("q54_revision_lastprior", q54, Some(q54Sql)),
    Q("q55_merge_or_create", q55, Some(q55Sql)),
    Q("q69_node_contraction", q69, Some(q69Sql)),
    Q("q327_scd2_history", q327, Some(q327Sql)))
}
