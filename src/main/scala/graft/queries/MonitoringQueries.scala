package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.monitoring.PerfMonitor

/** Monitoring family (performance_monitor.py MetricsAggregator +
  * PerformanceMonitor): windowed query statistics, per-type breakdown,
  * threshold alerts, optimization recommendations.
  *
  * The events feed stands in for the reference's QueryMetrics stream
  * (performance_monitor.py:22-32) under a fixed mapping: exec_ms := value,
  * query_type := event_type, error := event_type = 'error', cache_hit :=
  * user_id % 3 = 0 (a deterministic ~1/3 hit rate), result_count :=
  * props.k, query_id := event_id. The oracle applies the identical
  * mapping, so the gate checks the aggregator arithmetic, not the
  * mapping. Hourly windows rather than the reference's 5-minute default
  * (window_size_minutes is a constructor arg) so windows hold enough
  * samples to exercise the n > 10 interpolated-p95 branch.
  */
object MonitoringQueries {

  private def metrics(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("ts"),
        col("value").as("exec_ms"),
        col("event_type").as("query_type"),
        (col("event_type") === "error").cast("int").as("is_error"),
        (col("user_id") % 3 === 0).cast("int").as("cache_hit"),
        get_json_object(col("props"), "$.k").cast("long").as("result_count"),
        col("event_id").as("query_id"))

  private val metricsSql =
    """m AS (
      |  SELECT ts, value AS exec_ms, event_type AS query_type,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_error,
      |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS cache_hit,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS result_count,
      |    event_id AS query_id
      |  FROM events)""".stripMargin

  // DuckDB mirror of the exclusive-p95 / median index arithmetic
  // (PerfMonitor.medianOfSorted / p95OfSorted scaladoc has the derivation).
  private val statsSql =
    s"""WITH $metricsSql,
       |a AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    count(*) AS n, list(exec_ms ORDER BY exec_ms) AS l,
       |    avg(exec_ms) AS avg_raw, max(exec_ms) AS max_raw,
       |    avg(result_count * 1.0) AS rc_raw,
       |    sum(cache_hit) AS hits, sum(is_error) AS errs
       |  FROM m GROUP BY 1),
       |j AS (
       |  SELECT *, greatest(1, least((19 * (n + 1)) // 20, n - 1)) AS j95
       |  FROM a)
       |SELECT window_start, n AS total_queries,
       |  round(avg_raw, 6) AS avg_time_ms,
       |  round(CASE WHEN n % 2 = 1 THEN l[CAST((n + 1) // 2 AS INT)]
       |        ELSE (l[CAST(n // 2 AS INT)] + l[CAST(n // 2 + 1 AS INT)]) / 2
       |        END, 6) AS median_time_ms,
       |  round(CASE WHEN n > 10 THEN
       |      (l[CAST(j95 AS INT)] * (20 - (19 * (n + 1) - 20 * j95))
       |       + l[CAST(j95 AS INT) + 1] * (19 * (n + 1) - 20 * j95)) / 20
       |    ELSE l[CAST(n AS INT)] END, 6) AS p95_time_ms,
       |  round(max_raw, 6) AS max_time_ms,
       |  round(rc_raw, 6) AS avg_result_count,
       |  round(hits * 1.0 / n, 6) AS cache_hit_rate,
       |  round(errs * 1.0 / n, 6) AS error_rate,
       |  round(n * 1.0 / 3600, 6) AS qps
       |FROM j ORDER BY window_start""".stripMargin

  // -- q106: windowed query statistics (get_query_statistics,
  //          performance_monitor.py:118-157; median/p95 per
  //          statistics.median / quantiles n=20 exclusive [18])
  private def q106(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.queryStats(metrics(s, dir), 3600L)
      .orderBy(col("window_start"))

  // -- q107: by_query_type breakdown (performance_monitor.py:144-156)
  private def q107(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.byTypeStats(metrics(s, dir), 3600L)
      .orderBy(col("window_start"), col("query_type"))

  private val q107Sql =
    s"""WITH $metricsSql
       |SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |  query_type, count(*) AS cnt,
       |  round(avg(exec_ms), 6) AS avg_time_ms,
       |  round(max(exec_ms), 6) AS max_time_ms
       |FROM m GROUP BY 1, 2 ORDER BY window_start, query_type""".stripMargin

  // -- q108: threshold alerts — per-metric slow queries (warning) +
  //          per-window error rate with critical escalation above 0.1
  //          (_check_query_alerts :411-424, _check_aggregated_alerts
  //          :465-480). slowMs 300 stands in for the configurable
  //          query_avg_time_ms threshold (ctor arg :248-254) at this
  //          feed's latency scale.
  private def q108(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.alerts(metrics(s, dir), 3600L, slowMs = 300.0)
      .orderBy(col("metric_type"), col("ref_id"))

  private val q108Sql =
    s"""WITH $metricsSql,
       |slow AS (
       |  SELECT 'query_performance' AS metric_type, 'warning' AS severity,
       |    round(exec_ms, 6) AS value, 300.0 AS threshold,
       |    CAST(query_id AS VARCHAR) AS ref_id
       |  FROM m WHERE exec_ms > 300.0 AND is_error = 0),
       |er AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    sum(is_error) * 1.0 / count(*) AS er
       |  FROM m GROUP BY 1),
       |agg AS (
       |  SELECT 'query_error_rate' AS metric_type,
       |    CASE WHEN er > 0.1 THEN 'critical' ELSE 'warning' END AS severity,
       |    round(er, 6) AS value, 0.05 AS threshold,
       |    CAST(window_start AS VARCHAR) AS ref_id
       |  FROM er WHERE er > 0.05)
       |SELECT * FROM slow UNION ALL SELECT * FROM agg
       |ORDER BY metric_type, ref_id""".stripMargin

  // -- q109: optimization recommendations per window
  //          (get_performance_recommendations :542-575 rule constants)
  private def q109(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.recommendations(PerfMonitor.queryStats(metrics(s, dir), 3600L))
      .orderBy(col("window_start"), col("code"))

  private val q109Sql =
    s"""WITH $metricsSql,
       |a AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    count(*) AS n, avg(exec_ms) AS avg_raw,
       |    sum(cache_hit) AS hits, sum(is_error) AS errs
       |  FROM m GROUP BY 1),
       |s AS (
       |  SELECT window_start,
       |    round(avg_raw, 6) AS avg_time_ms,
       |    round(hits * 1.0 / n, 6) AS cache_hit_rate,
       |    round(errs * 1.0 / n, 6) AS error_rate
       |  FROM a)
       |SELECT window_start, code FROM (
       |  SELECT window_start, 'optimize_query_caching' AS code FROM s
       |    WHERE cache_hit_rate < 0.3
       |  UNION ALL
       |  SELECT window_start, 'optimize_query_patterns' AS code FROM s
       |    WHERE avg_time_ms > 1000.0
       |  UNION ALL
       |  SELECT window_start, 'review_error_handling' AS code FROM s
       |    WHERE error_rate > 0.01)
       |ORDER BY window_start, code""".stripMargin

  // -- q110: windowed ingestion statistics (get_ingestion_statistics,
  //          performance_monitor.py:158-191; throughput derived as
  //          items / (ms/1000) with the proc_ms > 0 guard, exactly as
  //          record_ingestion_performance :327-341 computes it; note
  //          error_rate here is over ITEMS, not operations). Events
  //          stand in as ingestion operations: items := props.k,
  //          proc_ms := value, one error per 'error'-typed event.
  private def ingestion(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("items"),
        col("value").as("proc_ms"),
        (col("event_type") === "error").cast("long").as("err_count"))
      .withColumn("throughput",
        when(col("proc_ms") > 0, col("items") / (col("proc_ms") / 1000.0))
          .otherwise(0.0))

  private def q110(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.ingestionStats(ingestion(s, dir), 3600L)
      .orderBy(col("window_start"))

  private val q110Sql =
    """WITH i AS (
      |  SELECT ts,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS items,
      |    value AS proc_ms,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err_count,
      |    CASE WHEN value > 0
      |      THEN CAST(json_extract_string(props, '$.k') AS BIGINT) / (value / 1000.0)
      |      ELSE 0.0 END AS throughput
      |  FROM events),
      |a AS (
      |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
      |    count(*) AS total_operations,
      |    CAST(sum(items) AS BIGINT) AS total_items,
      |    round(avg(throughput), 6) AS avg_throughput,
      |    round(max(throughput), 6) AS peak_throughput,
      |    round(avg(proc_ms), 6) AS avg_processing_ms,
      |    CAST(sum(err_count) AS BIGINT) AS total_errors
      |  FROM i GROUP BY 1)
      |SELECT *, CASE WHEN total_items > 0
      |    THEN round(total_errors * 1.0 / total_items, 6) ELSE 0.0
      |  END AS error_rate
      |FROM a ORDER BY window_start""".stripMargin

  // -- q113: windowed resource statistics (get_resource_statistics,
  //          performance_monitor.py:192-221) — completes the
  //          MetricsAggregator trio. Events stand in as resource
  //          samples: cpu_percent := value mod 100,
  //          memory_percent := props.k (0..99), memory_used_mb :=
  //          value * 10; same p95 arithmetic as q106.
  private def resource(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("ts"),
        pmod(col("value"), lit(100.0)).as("cpu_percent"),
        get_json_object(col("props"), "$.k").cast("double")
          .as("memory_percent"),
        (col("value") * 10).as("memory_used_mb"))

  private def q113(s: SparkSession, dir: String): DataFrame =
    PerfMonitor.resourceStats(resource(s, dir), 3600L)
      .orderBy(col("window_start"))

  private val q113Sql =
    """WITH r AS (
      |  SELECT ts, fmod(value, 100.0) AS cpu_percent,
      |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS memory_percent,
      |    value * 10 AS memory_used_mb
      |  FROM events),
      |a AS (
      |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
      |    count(*) AS sample_count,
      |    round(avg(cpu_percent), 6) AS cpu_avg,
      |    round(max(cpu_percent), 6) AS cpu_max,
      |    list(cpu_percent ORDER BY cpu_percent) AS l, count(*) AS n,
      |    round(avg(memory_percent), 6) AS mem_avg_percent,
      |    round(max(memory_percent), 6) AS mem_max_percent,
      |    round(avg(memory_used_mb), 6) AS mem_avg_used_mb,
      |    round(max(memory_used_mb), 6) AS mem_max_used_mb
      |  FROM r GROUP BY 1),
      |j AS (
      |  SELECT *, greatest(1, least((19 * (n + 1)) // 20, n - 1)) AS j95
      |  FROM a)
      |SELECT window_start, sample_count, cpu_avg, cpu_max,
      |  mem_avg_percent, mem_max_percent, mem_avg_used_mb, mem_max_used_mb,
      |  round(CASE WHEN n > 10 THEN
      |      (l[CAST(j95 AS INT)] * (20 - (19 * (n + 1) - 20 * j95))
      |       + l[CAST(j95 AS INT) + 1] * (19 * (n + 1) - 20 * j95)) / 20
      |    ELSE l[CAST(n AS INT)] END, 6) AS cpu_p95
      |FROM j ORDER BY window_start""".stripMargin

  // -- q114: default alert rules evaluated per window
  //          (alert_config.py:120-300 rule table + :321-389 evaluation;
  //          each window is one metrics snapshot). Long-format metrics
  //          from the three aggregator legs; cooldown throttling is the
  //          stateful half, pinned in AlertRulesSpec.
  // one row per (window, metric) WITHOUT re-running the stats aggregate
  // per metric: a union of selects over the same frame re-aggregates once
  // per branch (no CSE across union legs) — explode a struct array instead
  private def unpivot(df: DataFrame, cols: (String, String)*): DataFrame =
    df.select(col("window_start"), explode(array(cols.map { case (m, c) =>
        struct(lit(m).as("metric_type"), col(c).as("value")) }: _*)).as("kv"))
      .select(col("window_start"), col("kv.metric_type").as("metric_type"),
        col("kv.value").as("value"))

  private def q114(s: SparkSession, dir: String): DataFrame = {
    val q = PerfMonitor.queryStats(metrics(s, dir), 3600L)
    val i = PerfMonitor.ingestionStats(ingestion(s, dir), 3600L)
    val r = PerfMonitor.resourceStats(resource(s, dir), 3600L)
    val long = unpivot(q, "query_avg_time_ms" -> "avg_time_ms",
        "query_error_rate" -> "error_rate",
        "cache_hit_rate" -> "cache_hit_rate")
      .unionByName(unpivot(i, "ingestion_error_rate" -> "error_rate"))
      .unionByName(unpivot(r, "cpu_percent" -> "cpu_avg",
        "memory_percent" -> "mem_avg_percent"))
    graft.monitoring.AlertRules.evaluate(long)
      .select(col("window_start"), col("rule_name"), col("metric_type"),
        col("severity"), col("value"), col("threshold"))
      .orderBy(col("window_start"), col("rule_name"))
  }

  private val q114Sql =
    s"""WITH $metricsSql,
       |q AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    round(avg(exec_ms), 6) AS avg_time_ms,
       |    round(sum(is_error) * 1.0 / count(*), 6) AS error_rate,
       |    round(sum(cache_hit) * 1.0 / count(*), 6) AS cache_hit_rate
       |  FROM m GROUP BY 1),
       |ing AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    CASE WHEN sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) > 0
       |      THEN round(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
       |        / sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)), 6)
       |      ELSE 0.0 END AS ing_error_rate
       |  FROM events GROUP BY 1),
       |res AS (
       |  SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
       |    round(avg(fmod(value, 100.0)), 6) AS cpu_avg,
       |    round(avg(CAST(json_extract_string(props, '$$.k') AS DOUBLE)), 6) AS mem_avg
       |  FROM events GROUP BY 1),
       |long AS (
       |  SELECT window_start, 'query_avg_time_ms' AS metric_type, avg_time_ms AS value FROM q
       |  UNION ALL SELECT window_start, 'query_error_rate', error_rate FROM q
       |  UNION ALL SELECT window_start, 'cache_hit_rate', cache_hit_rate FROM q
       |  UNION ALL SELECT window_start, 'ingestion_error_rate', ing_error_rate FROM ing
       |  UNION ALL SELECT window_start, 'cpu_percent', cpu_avg FROM res
       |  UNION ALL SELECT window_start, 'memory_percent', mem_avg FROM res),
       |rules(rule_name, metric_type, condition, threshold, severity) AS (VALUES
       |  ('high_cpu_utilization', 'cpu_percent', 'gt', 85.0, 'warning'),
       |  ('critical_cpu_utilization', 'cpu_percent', 'gt', 95.0, 'critical'),
       |  ('high_memory_utilization', 'memory_percent', 'gt', 80.0, 'warning'),
       |  ('critical_memory_utilization', 'memory_percent', 'gt', 95.0, 'critical'),
       |  ('slow_query_performance', 'query_avg_time_ms', 'gt', 5000.0, 'warning'),
       |  ('very_slow_query_performance', 'query_avg_time_ms', 'gt', 15000.0, 'critical'),
       |  ('high_query_error_rate', 'query_error_rate', 'gt', 0.05, 'warning'),
       |  ('critical_query_error_rate', 'query_error_rate', 'gt', 0.15, 'critical'),
       |  ('low_cache_hit_rate', 'cache_hit_rate', 'lt', 0.3, 'warning'),
       |  ('high_ingestion_error_rate', 'ingestion_error_rate', 'gt', 0.02, 'warning'),
       |  ('critical_ingestion_error_rate', 'ingestion_error_rate', 'gt', 0.10, 'critical'))
       |SELECT window_start, rule_name, metric_type, severity, value, threshold
       |FROM long JOIN rules USING (metric_type)
       |WHERE CASE WHEN condition = 'gt' THEN value > threshold
       |           WHEN condition = 'lt' THEN value < threshold
       |           WHEN condition = 'eq' THEN value = threshold
       |           WHEN condition = 'gte' THEN value >= threshold
       |           WHEN condition = 'lte' THEN value <= threshold
       |           ELSE FALSE END
       |ORDER BY window_start, rule_name""".stripMargin

  // -- q131: query-cache hit analysis (query_cache.py) — TTL hit/miss/
  //          expiry outcome per request as ONE window expression (last
  //          cacheable same-key request before this one), grouped into
  //          the reference's CacheStatistics per request type. TTL 600 s
  //          sits inside the event stream's inter-arrival distribution
  //          so all three outcomes occur; the skip-fast-responses rule
  //          (value < 10 ms never cached) is what distinguishes this
  //          from a plain self-lag — a hit needs a CACHEABLE put.
  private def q131(s: SparkSession, dir: String): DataFrame =
    graft.engine.CacheAnalysis
      .statistics(Tables.load(s, dir, "events"), ttlSeconds = 600L)
      .orderBy(col("event_type"))

  private val q131Sql =
    """WITH keyed AS (
      |  SELECT event_id, ts, event_type,
      |    lower(trim(event_type)) || ':' || json_extract_string(props, '$.k')
      |      AS cache_key,
      |    value >= 10.0 AS cacheable
      |  FROM events),
      |o AS (
      |  SELECT event_type, cache_key,
      |    epoch_us(ts) - max(CASE WHEN cacheable THEN epoch_us(ts) END)
      |      OVER (PARTITION BY cache_key ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS gap_us
      |  FROM keyed)
      |SELECT event_type,
      |  count(*) AS requests,
      |  count(CASE WHEN gap_us <= 600 * 1000000 THEN 1 END) AS hits,
      |  count(CASE WHEN gap_us > 600 * 1000000 THEN 1 END) AS expired_misses,
      |  count(CASE WHEN gap_us IS NULL THEN 1 END) AS cold_misses,
      |  round(count(CASE WHEN gap_us <= 600 * 1000000 THEN 1 END) * 1.0
      |    / count(*), 6) AS hit_rate,
      |  count(DISTINCT cache_key) AS distinct_keys
      |FROM o GROUP BY event_type ORDER BY event_type""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q106_perf_window_stats", q106, Some(statsSql), headline = true),
    Q("q107_metrics_by_type", q107, Some(q107Sql)),
    Q("q108_perf_alerts", q108, Some(q108Sql)),
    Q("q109_perf_recommendations", q109, Some(q109Sql)),
    Q("q110_ingestion_stats", q110, Some(q110Sql)),
    Q("q113_resource_stats", q113, Some(q113Sql)),
    Q("q114_alert_rules", q114, Some(q114Sql)),
    Q("q131_cache_hit_analysis", q131, Some(q131Sql)))
}
