package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Performance-metrics aggregation + threshold alerting — the batch form
  * of the reference's monitoring subsystem
  * (memory_core/monitoring/performance_monitor.py).
  *
  * The reference keeps a 5-minute in-memory deque per metric stream and
  * re-aggregates on demand (`MetricsAggregator`, performance_monitor.py:74-118);
  * the batch analog is an epoch-aligned tumbling window over a metrics
  * table — same statistics per window, every window at once. Percentile
  * semantics follow the reference exactly: `statistics.median` (mean of
  * the two middle order statistics for even n) and
  * `statistics.quantiles(times, n=20)[18]` with the EXCLUSIVE method —
  * only used when n > 10, else max (performance_monitor.py:118-143).
  *
  * Scale contract: the per-window sorted array (`sort_array(collect_list)`)
  * is bounded by the event rate within one window — the same bound as the
  * reference's in-memory deque. Windows are independent groups, so the
  * aggregation is a single shuffle on window_start and parallelizes across
  * windows; for windows too dense for one task, `queryStatsRanked` is the
  * array-free form of the same arithmetic (row_number/count window
  * functions + conditional pivot), equality-pinned in PerfMonitorSpec.
  */
object PerfMonitor {

  /** Epoch-aligned tumbling window start (seconds), as Structured
    * Streaming's `window()` would bucket it. */
  def windowStart(ts: Column, windowSec: Long): Column =
    (floor(unix_timestamp(ts) / windowSec) * windowSec).cast("long")

  // -- order statistics over a SORTED array column ----------------------
  // Integer index arithmetic uses (x - pmod(x, k)) / k, which divides an
  // exactly-divisible double — exact for any realistic window population,
  // and bit-identical to the oracle's integer `//`.

  /** `statistics.median`: x[(n+1)/2] for odd n, mean of the two middle
    * elements for even n (1-based indexing into the sorted array). */
  def medianOfSorted(arr: Column): Column = {
    val n = size(arr).cast("long")
    val half = (((n + 1) - pmod(n + 1, lit(2L))) / 2).cast("int")
    when(pmod(n, lit(2L)) === 1, element_at(arr, half))
      .otherwise((element_at(arr, (n / 2).cast("int")) +
        element_at(arr, (n / 2).cast("int") + 1)) / 2)
  }

  /** `statistics.quantiles(data, n=20, method='exclusive')[18]` — the
    * reference's p95 (performance_monitor.py:139-143): with m = n+1,
    * j = clamp(19m/20, 1, n-1), delta = 19m − 20j (recomputed AFTER the
    * clamp, matching CPython), interpolate between x[j] and x[j+1].
    * Applied only when n > 10, else the max — same guard as the
    * reference. */
  def p95OfSorted(arr: Column): Column = {
    val n = size(arr).cast("long")
    val scaled = lit(19L) * (n + 1)
    val j = greatest(lit(1L),
      least(((scaled - pmod(scaled, lit(20L))) / 20).cast("long"), n - 1))
    val delta = (scaled - j * 20).cast("double")
    val interp = (element_at(arr, j.cast("int")) * (lit(20.0) - delta) +
      element_at(arr, j.cast("int") + 1) * delta) / 20
    when(n > 10, interp).otherwise(element_at(arr, n.cast("int")))
  }

  /** Windowed query statistics (`get_query_statistics`,
    * performance_monitor.py:118-157): count, mean/median/p95/max latency,
    * mean result count, cache-hit rate, error rate, queries-per-second
    * (count over the window length, as the reference divides by its
    * window size). Input columns: ts, exec_ms, result_count, cache_hit
    * (0/1), is_error (0/1). */
  def queryStats(metrics: DataFrame, windowSec: Long): DataFrame =
    metrics
      .groupBy(windowStart(col("ts"), windowSec).as("window_start"))
      .agg(
        count(lit(1)).as("total_queries"),
        avg(col("exec_ms")).as("avg_raw"),
        sort_array(collect_list(col("exec_ms"))).as("sorted_ms"),
        max(col("exec_ms")).as("max_raw"),
        avg(col("result_count").cast("double")).as("rc_raw"),
        sum(col("cache_hit")).as("hits"),
        sum(col("is_error")).as("errs"))
      .select(
        col("window_start"),
        col("total_queries"),
        round(col("avg_raw"), 6).as("avg_time_ms"),
        round(medianOfSorted(col("sorted_ms")), 6).as("median_time_ms"),
        round(p95OfSorted(col("sorted_ms")), 6).as("p95_time_ms"),
        round(col("max_raw"), 6).as("max_time_ms"),
        round(col("rc_raw"), 6).as("avg_result_count"),
        round(col("hits").cast("double") / col("total_queries"), 6)
          .as("cache_hit_rate"),
        round(col("errs").cast("double") / col("total_queries"), 6)
          .as("error_rate"),
        round(col("total_queries").cast("double") / windowSec, 6).as("qps"))

  /** `queryStats` without the per-window array — the two-pass rank form
    * for windows too dense to collect: row_number + count window
    * functions pick out exactly the order statistics the median/p95
    * arithmetic needs, and a conditional aggregate pivots them into one
    * row per window. Same output, bit-for-bit index arithmetic; the
    * cost is a window sort instead of per-group array memory, which is
    * the right trade once a window holds millions of samples. */
  def queryStatsRanked(metrics: DataFrame, windowSec: Long): DataFrame = {
    val byW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
    val ranked = metrics
      .withColumn("window_start", windowStart(col("ts"), windowSec))
      .withColumn("rn", row_number().over(byW.orderBy(col("exec_ms"))))
      .withColumn("n", count(lit(1)).over(byW).cast("long"))
    // same index arithmetic as medianOfSorted / p95OfSorted, evaluated
    // per row against that row's rank
    val n = col("n")
    val medLo = (((n + 1) - pmod(n + 1, lit(2L))) / 2).cast("long")
    val scaled = lit(19L) * (n + 1)
    val j = greatest(lit(1L),
      least(((scaled - pmod(scaled, lit(20L))) / 20).cast("long"), n - 1))
    val v = col("exec_ms")
    val agg = ranked.groupBy(col("window_start")).agg(
      count(lit(1)).as("total_queries"),
      avg(v).as("avg_raw"),
      max(v).as("max_raw"),
      avg(col("result_count").cast("double")).as("rc_raw"),
      sum(col("cache_hit")).as("hits"),
      sum(col("is_error")).as("errs"),
      max(when(pmod(n, lit(2L)) === 1 && col("rn") === medLo, v)).as("med_odd"),
      max(when(pmod(n, lit(2L)) === 0 && col("rn") === medLo, v)).as("med_lo"),
      max(when(pmod(n, lit(2L)) === 0 && col("rn") === medLo + 1, v)).as("med_hi"),
      max(when(col("rn") === j, v)).as("v_j"),
      max(when(col("rn") === j + 1, v)).as("v_j1"))
    val na = col("total_queries").cast("long")
    val scaledA = lit(19L) * (na + 1)
    val jA = greatest(lit(1L),
      least(((scaledA - pmod(scaledA, lit(20L))) / 20).cast("long"), na - 1))
    val deltaA = (scaledA - jA * 20).cast("double")
    agg.select(
      col("window_start"),
      col("total_queries"),
      round(col("avg_raw"), 6).as("avg_time_ms"),
      round(coalesce(col("med_odd"),
        (col("med_lo") + col("med_hi")) / 2), 6).as("median_time_ms"),
      round(when(na > 10,
          (col("v_j") * (lit(20.0) - deltaA) + col("v_j1") * deltaA) / 20)
        .otherwise(col("max_raw")), 6).as("p95_time_ms"),
      round(col("max_raw"), 6).as("max_time_ms"),
      round(col("rc_raw"), 6).as("avg_result_count"),
      round(col("hits").cast("double") / col("total_queries"), 6)
        .as("cache_hit_rate"),
      round(col("errs").cast("double") / col("total_queries"), 6)
        .as("error_rate"),
      round(col("total_queries").cast("double") / windowSec, 6).as("qps"))
  }

  /** Windowed ingestion statistics (`get_ingestion_statistics`,
    * performance_monitor.py:158-191): operation count, total items,
    * mean/peak throughput, mean processing time, total errors, and error
    * rate over ITEMS (total_errors / total_items — not over operations,
    * unlike the query-side error_rate). Input columns: ts, items,
    * proc_ms, throughput, err_count. */
  def ingestionStats(metrics: DataFrame, windowSec: Long): DataFrame =
    metrics
      .groupBy(windowStart(col("ts"), windowSec).as("window_start"))
      .agg(
        count(lit(1)).as("total_operations"),
        sum(col("items")).as("total_items"),
        round(avg(col("throughput")), 6).as("avg_throughput"),
        round(max(col("throughput")), 6).as("peak_throughput"),
        round(avg(col("proc_ms")), 6).as("avg_processing_ms"),
        sum(col("err_count")).as("total_errors"))
      .withColumn("error_rate",
        when(col("total_items") > 0,
          round(col("total_errors").cast("double") / col("total_items"), 6))
          .otherwise(0.0))

  /** `by_query_type` breakdown inside `get_query_statistics`
    * (performance_monitor.py:144-156): per (window, type) count, mean
    * and max latency. */
  def byTypeStats(metrics: DataFrame, windowSec: Long): DataFrame =
    metrics
      .groupBy(windowStart(col("ts"), windowSec).as("window_start"),
        col("query_type"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col("exec_ms")), 6).as("avg_time_ms"),
        round(max(col("exec_ms")), 6).as("max_time_ms"))

  /** Windowed resource statistics (`get_resource_statistics`,
    * performance_monitor.py:192-221): sample count, cpu avg/max/p95
    * (p95 under the same n > 10 guard), memory avg/max percent and
    * avg/max used MB. Input columns: ts, cpu_percent, memory_percent,
    * memory_used_mb. */
  def resourceStats(metrics: DataFrame, windowSec: Long): DataFrame =
    metrics
      .groupBy(windowStart(col("ts"), windowSec).as("window_start"))
      .agg(
        count(lit(1)).as("sample_count"),
        round(avg(col("cpu_percent")), 6).as("cpu_avg"),
        round(max(col("cpu_percent")), 6).as("cpu_max"),
        sort_array(collect_list(col("cpu_percent"))).as("cpu_sorted"),
        round(avg(col("memory_percent")), 6).as("mem_avg_percent"),
        round(max(col("memory_percent")), 6).as("mem_max_percent"),
        round(avg(col("memory_used_mb")), 6).as("mem_avg_used_mb"),
        round(max(col("memory_used_mb")), 6).as("mem_max_used_mb"))
      .withColumn("cpu_p95", round(p95OfSorted(col("cpu_sorted")), 6))
      .drop("cpu_sorted")

  /** Threshold alerts, both reference forms (performance_monitor.py:411-480):
    *   - per-metric slow-query alerts — exec_ms above `slowMs` and not an
    *     error row → warning (`_check_query_alerts`);
    *   - per-window aggregated error-rate alerts — error rate above
    *     `errRate` → critical when above 0.1, else warning
    *     (`_check_aggregated_alerts`).
    * Resource (cpu/memory) alerts have no column source in the metrics
    * feed — `_check_resource_alerts` reads psutil, host-side state with
    * no batch analog. Output schema mirrors PerformanceAlert
    * (performance_monitor.py:62-71) with ref_id standing in for the
    * timestamped alert_id. */
  def alerts(metrics: DataFrame, windowSec: Long, slowMs: Double = 5000.0,
      errRate: Double = 0.05): DataFrame = {
    val slow = metrics
      .filter(col("exec_ms") > slowMs && col("is_error") === 0)
      .select(lit("query_performance").as("metric_type"),
        lit("warning").as("severity"),
        round(col("exec_ms"), 6).as("value"),
        lit(slowMs).as("threshold"),
        col("query_id").cast("string").as("ref_id"))
    val windowed = metrics
      .groupBy(windowStart(col("ts"), windowSec).as("window_start"))
      .agg((sum(col("is_error")).cast("double") / count(lit(1))).as("er"))
      .filter(col("er") > errRate)
      .select(lit("query_error_rate").as("metric_type"),
        when(col("er") > 0.1, "critical").otherwise("warning").as("severity"),
        round(col("er"), 6).as("value"),
        lit(errRate).as("threshold"),
        col("window_start").cast("string").as("ref_id"))
    slow.unionByName(windowed)
  }

  /** `get_performance_recommendations` (performance_monitor.py:542-575),
    * one row per triggered rule per window: cache hit rate under 0.3,
    * mean latency over 1000 ms, error rate over 0.01 — the reference's
    * hardcoded rule constants. The cpu/memory rules need resource
    * statistics (psutil) and have no batch analog. Input: the
    * `queryStats` output. */
  def recommendations(stats: DataFrame): DataFrame = {
    // single pass: a union of filters would re-run the stats aggregation
    // once per rule (no CSE across union branches) — build the code array
    // per row and explode instead
    val codes = array(
      when(col("cache_hit_rate") < 0.3, "optimize_query_caching"),
      when(col("avg_time_ms") > 1000.0, "optimize_query_patterns"),
      when(col("error_rate") > 0.01, "review_error_handling"))
    stats.select(col("window_start"),
      explode(filter(codes, c => c.isNotNull)).as("code"))
  }
}
