package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Configurable alert rules + cooldown throttling — the reference's
  * AlertManager (monitoring/alert_config.py:44-120 rule model,
  * :321-389 evaluation and cooldown).
  *
  * Split along state: rule EVALUATION is stateless per metrics snapshot
  * (here: per window, the batch tick) — a broadcast join of a small rule
  * table against long-format metrics with the five-way condition
  * arithmetic (`_evaluate_condition`, :375-389). Cooldown THROTTLING is
  * inherently sequential per rule (an alert suppresses followers within
  * the cooldown of the last EMITTED one, :344-349 — `recent_alerts`
  * updates only on emission), so it runs as a per-rule sorted fold in
  * `flatMapGroups`; per-group state is one timestamp, groups are rule
  * names — bounded and tiny, whatever the metrics volume. */
object AlertRules {

  /** AlertRule (alert_config.py:44-59). Cooldown in seconds (the
    * reference's cooldown_minutes * 60). */
  final case class Rule(name: String, metricType: String, condition: String,
      threshold: Double, severity: String, cooldownSec: Long = 300L)

  /** The default rule set (_get_default_alert_rules, :120-300). The
    * three component_health rules (janusgraph/milvus/gemini `eq 0`) are
    * service-liveness probes with no batch metric source — omitted, as
    * with the psutil legs elsewhere in this package. */
  val defaults: Seq[Rule] = Seq(
    Rule("high_cpu_utilization", "cpu_percent", "gt", 85.0, "warning"),
    Rule("critical_cpu_utilization", "cpu_percent", "gt", 95.0, "critical"),
    Rule("high_memory_utilization", "memory_percent", "gt", 80.0, "warning"),
    Rule("critical_memory_utilization", "memory_percent", "gt", 95.0, "critical"),
    Rule("slow_query_performance", "query_avg_time_ms", "gt", 5000.0, "warning"),
    Rule("very_slow_query_performance", "query_avg_time_ms", "gt", 15000.0, "critical"),
    Rule("high_query_error_rate", "query_error_rate", "gt", 0.05, "warning"),
    Rule("critical_query_error_rate", "query_error_rate", "gt", 0.15, "critical"),
    Rule("low_cache_hit_rate", "cache_hit_rate", "lt", 0.3, "warning"),
    Rule("high_ingestion_error_rate", "ingestion_error_rate", "gt", 0.02, "warning"),
    Rule("critical_ingestion_error_rate", "ingestion_error_rate", "gt", 0.10, "critical"))

  /** `_evaluate_condition` (:375-389): five comparators; unknown
    * conditions never fire (the reference logs and returns False). */
  def conditionMet(value: Column, condition: Column, threshold: Column): Column =
    when(condition === "gt", value > threshold)
      .when(condition === "lt", value < threshold)
      .when(condition === "eq", value === threshold)
      .when(condition === "gte", value >= threshold)
      .when(condition === "lte", value <= threshold)
      .otherwise(lit(false))

  /** Evaluate rules against long-format metrics (ts, metric_type,
    * value): broadcast the rule table, keep rows whose condition fires
    * (`evaluate_metrics` :321-372, before cooldown). */
  def evaluate(metrics: DataFrame, rules: Seq[Rule] = defaults): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._
    val ruleDf = rules.toDF("rule_name", "metric_type", "condition",
      "threshold", "severity", "cooldown_sec")
    metrics.join(broadcast(ruleDf), Seq("metric_type"))
      .filter(conditionMet(col("value"), col("condition"), col("threshold")))
      .drop("condition", "cooldown_sec")
  }

  final case class Triggered(rule_name: String, ts: Long, severity: String,
      value: Double, threshold: Double)

  /** Cooldown throttle (:344-349): per rule, in time order, emit an
    * alert only when the LAST EMITTED alert of that rule is at least
    * `cooldownSec` old — the greedy chain the reference's
    * `recent_alerts` map produces. Input columns: rule_name, ts,
    * severity, value, threshold. */
  def throttle(triggered: DataFrame, cooldownSec: Long): DataFrame = {
    val spark = triggered.sparkSession
    import spark.implicits._
    val ds: Dataset[Triggered] = triggered
      .select(col("rule_name"), col("ts").cast("long"),
        col("severity"), col("value").cast("double"),
        col("threshold").cast("double")).as[Triggered]
    ds.groupByKey(_.rule_name)
      .flatMapGroups { (_, it) =>
        // alerts per rule are bounded (one per tick at most), sort in memory
        val sorted = it.toSeq.sortBy(t => (t.ts, t.value))
        var lastEmitted = Long.MinValue
        sorted.iterator.filter { t =>
          val emit = lastEmitted == Long.MinValue ||
            t.ts - lastEmitted >= cooldownSec
          if (emit) lastEmitted = t.ts
          emit
        }
      }
      .toDF()
  }
}
