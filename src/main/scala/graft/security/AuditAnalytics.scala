package graft.security

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Audit-log analytics: the reference's AuditLogger keeps events in an
  * in-process deque and answers summary / pattern questions by looping
  * over it (`memory_core/security/audit.py:111-624`). Here the audit
  * log is a table and each analysis is one windowed/grouped pass, so
  * the same questions run over an unbounded retained log.
  *
  * Expected columns on the enriched log: user_id, event_id, ts,
  * category, level, success, risk_score, ip_address.
  */
object AuditAnalytics {

  /** Security summary over a trailing window (audit.py:561-623
    * get_security_summary): long-form (stat, key, value) rows so the
    * by-level and by-category breakdowns ride the same schema as the
    * scalar counters. `now` anchors the days_back cutoff — the caller
    * passes a data-derived anchor so results are deterministic. */
  def securitySummary(audit: DataFrame, now: Column,
      daysBack: Int = 7): DataFrame = {
    val recent = audit.filter(
      col("ts") >= now - expr(s"INTERVAL $daysBack DAYS"))
    val scalar = recent.agg(
      count(lit(1)).as("total_events"),
      sum(when(col("category") === "authentication" && !col("success"), 1L)
        .otherwise(0L)).as("failed_authentications"),
      sum(when(col("category") === "authorization" && !col("success"), 1L)
        .otherwise(0L)).as("unauthorized_access_attempts"),
      sum(when(col("risk_score") >= 0.7, 1L).otherwise(0L))
        .as("high_risk_events"),
      sum(when(col("category") === "security_incident", 1L).otherwise(0L))
        .as("security_incidents"),
      countDistinct(col("user_id")).as("unique_users"),
      countDistinct(col("ip_address")).as("unique_ips"))
    val scalarLong = scalar.select(explode(array(
      Seq("total_events", "failed_authentications",
        "unauthorized_access_attempts", "high_risk_events",
        "security_incidents", "unique_users", "unique_ips").map(c =>
        struct(lit(c).as("stat"), lit("").as("key"),
          col(c).cast("long").as("value"))): _*)).as("kv"))
      .select(col("kv.stat").as("stat"), col("kv.key").as("key"),
        col("kv.value").as("value"))
    val byLevel = recent.groupBy(col("level").as("key"))
      .agg(count(lit(1)).as("value"))
      .select(lit("events_by_level").as("stat"), col("key"), col("value"))
    val byCategory = recent.groupBy(col("category").as("key"))
      .agg(count(lit(1)).as("value"))
      .select(lit("events_by_category").as("stat"), col("key"),
        col("value"))
    scalarLong.unionByName(byLevel).unionByName(byCategory)
  }

  /** Brute-force detection (audit.py:263-294): for each FAILED
    * authentication event, count failures by the same user inside the
    * trailing window; at or past the threshold the event escalates to
    * an incident carrying the count. The reference re-queries the log
    * per event with a 15-minute window; here it is one range-frame
    * window over the failure slice, partitioned per user. Defaults
    * mirror the reference (900 s, 5); test-scale callers pass a wider
    * window because the synthetic log is sparser than a login service.
    */
  def bruteForce(authFailures: DataFrame, windowSec: Long = 900L,
      threshold: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-windowSec * 1000000L, Window.currentRow)
    authFailures
      .withColumn("failed_attempts_count", count(lit(1)).over(w))
      .filter(col("failed_attempts_count") >= threshold)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("failed_attempts_count"), lit(0.8).as("risk_score"))
  }

  /** The audit.py:325-492 log_* helpers stamp each category with fixed
    * compliance tags; this is that convention as a column. */
  def complianceTags(category: Column): Column =
    when(category === "authentication",
        array(lit("authentication"), lit("access_control")))
      .when(category === "authorization",
        array(lit("authorization"), lit("access_control")))
      .when(category === "knowledge_access",
        array(lit("data_access"), lit("knowledge_management")))
      .when(category === "knowledge_modification",
        array(lit("data_modification"), lit("knowledge_management")))
      .otherwise(array(lit("security_incident"), lit("threat_detection")))

  /** Compliance report (audit.py:625-679 get_compliance_report):
    * events carrying ANY of the requested tags inside the trailing
    * window, broken down by tag (exploded — an event counts once per
    * matching tag), user, action, and the fixed 0.3/0.7 risk tiers.
    * Long-form (stat, key, value) like [[securitySummary]]. Expects
    * `compliance_tags` and `action` columns on the frame. */
  def complianceReport(audit: DataFrame, tags: Seq[String], now: Column,
      daysBack: Int = 30): DataFrame = {
    val scope = audit.filter(
      arrays_overlap(col("compliance_tags"), lit(tags.toArray)) &&
        col("ts") >= now - expr(s"INTERVAL $daysBack DAYS"))
    def leg(stat: String, key: Column, src: DataFrame = scope) =
      src.groupBy(key.as("key")).agg(count(lit(1)).as("value"))
        .select(lit(stat).as("stat"), col("key"), col("value"))
    val total = scope.agg(count(lit(1)).as("value"))
      .select(lit("total_events").as("stat"), lit("").as("key"),
        col("value"))
    val byTag = leg("events_by_tag", col("tag"),
      scope.select(explode(col("compliance_tags")).as("tag"))
        .filter(col("tag").isin(tags: _*)))
    val byUser = leg("events_by_user", col("user_id").cast("string"))
    val byAction = leg("events_by_action", col("action"))
    val risk = leg("risk_distribution",
      when(col("risk_score") < 0.3, "low")
        .when(col("risk_score") < 0.7, "medium").otherwise("high"))
    total.unionByName(byTag).unionByName(byUser).unionByName(byAction)
      .unionByName(risk)
  }

  final case class AuthFail(user_id: Long, event_id: Long, us: Long)
  final case class Incident(user_id: Long, event_id: Long, ts_us: Long,
      failed_attempts_count: Long, risk_score: Double)
  private final case class BfState(times: List[Long])

  /** Streaming twin of [[bruteForce]] — the reference's pattern
    * analyzer runs ONLINE, per incoming event (audit.py:263-294), so
    * the stateful path is the faithful deployment shape; the batch
    * window above is the oracle-checkable twin. Per-user state holds
    * only the failure timestamps inside the trailing window (pruned on
    * every event — bounded by window x failure rate, not history), and
    * an idle-group timeout at 2x the window removes departed users from
    * the state store. Within a micro-batch, events at the SAME
    * timestamp are folded as one run so each emits the full tie count —
    * the RANGE-frame semantics of the batch twin; exact parity assumes
    * an event-time-ordered feed, like the sessionization twin. */
  def bruteForceStream(fails: Dataset[AuthFail], windowSec: Long = 900L,
      threshold: Int = 5): Dataset[Incident] = {
    import fails.sparkSession.implicits._
    val wUs = windowSec * 1000000L
    fails.groupByKey(_.user_id)
      .flatMapGroupsWithState[BfState, Incident](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, evs: Iterator[AuthFail], state: GroupState[BfState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id)).toList
            var times = state.getOption.map(_.times).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[Incident]
            var rest = sorted
            while (rest.nonEmpty) {
              val us = rest.head.us
              val (run, tail) = rest.span(_.us == us)
              rest = tail
              times = (times ::: run.map(_.us)).dropWhile(_ < us - wUs)
              val n = times.length.toLong
              if (n >= threshold)
                run.foreach(e =>
                  out += Incident(user, e.event_id, e.us, n, 0.8))
            }
            state.update(BfState(times))
            state.setTimeoutDuration(windowSec * 2 * 1000L)
            out.iterator
          }
      }
  }

  /** New-IP access anomaly (audit.py:297-324): an access event from an
    * address outside the user's known set of the trailing
    * `lookbackDays` (the reference's days_back=30 recent_access query),
    * provided that set is non-empty. One per-user RANGE-preceding
    * window; the known set is the frame's collected IPs.
    *
    * Documented divergence: the reference appends the event to the log
    * BEFORE analyzing it (audit.py:244,260), so its own IP is already
    * in known_ips and the check as written can never fire — dead code.
    * This implements the documented intent (membership against PRIOR
    * accesses), which is also what its risk model describes. */
  def newIpAccess(access: DataFrame, lookbackDays: Int = 30): DataFrame = {
    val prior = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-lookbackDays * 86400L * 1000000L, -1L)
    access
      .withColumn("prior_ips", collect_list(col("ip_address")).over(prior))
      .filter(size(col("prior_ips")) > 0 &&
        !array_contains(col("prior_ips"), col("ip_address")))
      .select(col("user_id"), col("event_id"), col("ip_address"),
        size(array_distinct(col("prior_ips"))).as("n_known_ips"),
        lit(0.4).as("risk_score"))
  }
}
