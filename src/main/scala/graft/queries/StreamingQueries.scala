package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStream

/** Streaming-semantics family (SURVEY.md §2.8) in oracle-checkable batch
  * form: tumbling windows, sliding windows, sessionization. The true
  * readStream/watermark/flatMapGroupsWithState paths live in
  * graft.streaming.EventStream and are exercised by the ScalaTest suite
  * (memory sink) — these queries pin the window semantics themselves.
  */
object StreamingQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  // -- q57: tumbling 1 h windows (epoch-aligned, as Structured Streaming
  //         window() produces)
  private def q57(s: SparkSession, dir: String): DataFrame =
    EventStream.tumblingBatch(events(s, dir), 3600L)
      .orderBy(col("window_start"), col("event_type"))

  private val q57Sql =
    """SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS window_start,
      |  event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  // -- q58: sliding windows (1 h window, 30 min slide — every event in 2)
  private def q58(s: SparkSession, dir: String): DataFrame =
    EventStream.slidingBatch(events(s, dir), 3600L, 1800L)
      .orderBy(col("window_start"), col("event_type"))

  private val q58Sql =
    """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |w AS (
      |  SELECT event_type, sec,
      |    CAST(floor(sec / 1800) * 1800 - k * 1800 AS BIGINT) AS window_start
      |  FROM e, range(0, 2) t(k))
      |SELECT window_start, event_type, count(*) AS cnt
      |FROM w WHERE window_start + 3600 > sec
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // -- q59: sessionization (30 min gap) — lag boundary + running count;
  //         twin of the flatMapGroupsWithState streaming path
  private def q59(s: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeBatch(events(s, dir), 1800L)
      .orderBy(col("user_id"), col("session_id"))

  private val q59Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |b AS (
      |  SELECT user_id, event_id, sec,
      |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
      |      THEN 1 ELSE 0 END AS boundary
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
      |sess AS (
      |  SELECT user_id, sec,
      |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY sec, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM b)
      |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin

  // -- q90: event-bus priority lanes + batching thresholds
  //         (event_system.py EventPriority :79-85, EventBatchProcessor
  //         :305-352): batches of ≤10 events per priority lane, no batch
  //         spanning a 1 h flush-interval bucket, highest priority first
  private def q90(s: SparkSession, dir: String): DataFrame =
    EventStream.eventBatches(events(s, dir), batchSize = 10,
        flushIntervalSec = 3600L)
      .orderBy(col("priority").desc, col("interval_bucket"), col("batch_seq"))

  private val q90Sql =
    """WITH e AS (
      |  SELECT event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CASE WHEN event_type = 'error' THEN 4
      |         WHEN event_type IN ('purchase', 'signup') THEN 3
      |         WHEN event_type IN ('click', 'view') THEN 2
      |         ELSE 1 END AS priority
      |  FROM events),
      |b AS (
      |  SELECT priority, sec, value,
      |    CAST(floor(sec / 3600) AS BIGINT) AS interval_bucket,
      |    row_number() OVER (
      |      PARTITION BY priority, CAST(floor(sec / 3600) AS BIGINT)
      |      ORDER BY sec, event_id) AS rn
      |  FROM e)
      |SELECT priority, interval_bucket,
      |  CAST(floor((rn - 1) / 10) AS BIGINT) AS batch_seq,
      |  count(*) AS n_events,
      |  min(sec) AS batch_start_sec, max(sec) AS batch_end_sec,
      |  round(sum(value), 4) AS sum_value
      |FROM b GROUP BY 1, 2, 3
      |ORDER BY priority DESC, interval_bucket, batch_seq""".stripMargin

  // -- q236: bot-rate session screen — users with machine-speed
  //          sessions: a session is "fast" when its mean inter-event
  //          gap is ≤ 60 s (duration ≤ 60·(n−1), pure integer compare —
  //          no division), over the exact q59 sessionization. Bot
  //          traffic poisons behavioral training data; this is the
  //          feed-hygiene screen run before q213/q214/q224 analytics.
  //          Scale shape: the q59 user-keyed windows + one per-user
  //          rollup; output bounded by flagged users.
  private val FastGapSec = 60L

  private def q236(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val fast = col("n_events") >= 2 &&
      col("duration_sec") <= (col("n_events") - 1) * FastGapSec
    EventStream.sessionizeBatch(events(s, dir), 1800L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(fast, 1L).otherwise(0L)).as("n_fast"),
        sum(when(fast, col("n_events")).otherwise(0L)).as("n_fast_events"))
      .filter(col("n_fast") > 0)
      .select(col("user_id"), col("n_sessions"), col("n_fast"),
        col("n_fast_events"),
        ExactRound.ratio6(col("n_fast"), col("n_sessions"))
          .as("fast_share"))
      .orderBy(col("user_id"))
  }

  private val q236Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |  FROM events),
       |b AS (
       |  SELECT user_id, event_id, sec,
       |    CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 1800
       |      THEN 1 ELSE 0 END AS boundary
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       |sess AS (
       |  SELECT user_id, sec,
       |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_id
       |  FROM b),
       |g AS (
       |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
       |    CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
       |  FROM sess GROUP BY 1, 2),
       |u AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       |    CAST(sum(CASE WHEN n_events >= 2
       |      AND duration_sec <= (n_events - 1) * $FastGapSec
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
       |    CAST(sum(CASE WHEN n_events >= 2
       |      AND duration_sec <= (n_events - 1) * $FastGapSec
       |      THEN n_events ELSE 0 END) AS BIGINT) AS n_fast_events
       |  FROM g GROUP BY 1)
       |SELECT user_id, n_sessions, n_fast, n_fast_events,
       |  ${graft.functions.ExactRound.sql.ratio6("n_fast", "n_sessions")}
       |    AS fast_share
       |FROM u WHERE n_fast > 0
       |ORDER BY user_id""".stripMargin

  // -- q262: watermark-lateness audit — the measurement that SIZES
  //          `withWatermark` before anyone runs the stream: replaying
  //          the event log in arrival order (event_id), an event's
  //          lateness is how far its event-time sits behind the
  //          high-water mark seen so far; for each candidate watermark
  //          {0 s, 60 s, 300 s, 3600 s} the audit counts the events a
  //          stream with that delay threshold would drop. Exactness:
  //          all integer seconds. Scale shape: the running max uses the
  //          two-level decomposition (q141's pattern) — per-1000-id
  //          bucket maxima, a prefix-max over the BUCKET frame (row
  //          count = ids/1000, metadata-scale), and a bucket-local
  //          running max — never a global unpartitioned window over
  //          data rows; the oracle uses the direct global window,
  //          proving the decomposition equal.
  private val LateWm = Seq(0L, 60L, 300L, 3600L)
  private val LateBucket = 1000L

  private def q262(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.ExactRound
    val e = events(s, dir)
      .select(col("event_id"), expr("unix_timestamp(ts)").as("sec"),
        expr(s"event_id div $LateBucket").as("bk"))
    val bmax = e.groupBy(col("bk")).agg(max(col("sec")).as("bmax"))
      .withColumn("prior",
        max(col("bmax")).over(Window.orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    val wIn = Window.partitionBy(col("bk")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = e.join(bmax.select(col("bk"), col("prior")), Seq("bk"))
      .withColumn("hwm", greatest(
        coalesce(max(col("sec")).over(wIn), lit(Long.MinValue / 4)),
        coalesce(col("prior"), lit(Long.MinValue / 4))))
      .withColumn("lateness", greatest(lit(0L), col("hwm") - col("sec")))
    val tot = late.agg(count(lit(1)).as("total"))
    late.select(explode(typedLit(LateWm)).as("watermark_sec"),
        col("lateness"))
      .groupBy(col("watermark_sec"))
      .agg(sum(when(col("lateness") > col("watermark_sec"), 1L)
        .otherwise(0L)).as("n_dropped"),
        max(col("lateness")).as("max_lateness_sec"))
      .crossJoin(broadcast(tot))
      .select(col("watermark_sec"), col("n_dropped"),
        ExactRound.ratio6(col("n_dropped"), col("total")).as("drop_share"),
        col("max_lateness_sec"))
      .orderBy(col("watermark_sec"))
  }

  private lazy val q262Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH e AS (
       |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |  FROM events),
       |hw AS (
       |  SELECT event_id, sec,
       |    max(sec) OVER (ORDER BY event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
       |  FROM e),
       |late AS (
       |  SELECT greatest(0, coalesce(hwm - sec, 0)) AS lateness FROM hw),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM late)
       |SELECT w.watermark_sec,
       |  CAST(sum(CASE WHEN l.lateness > w.watermark_sec THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_dropped,
       |  ${ER.sql.ratio6(
      "sum(CASE WHEN l.lateness > w.watermark_sec THEN 1 ELSE 0 END)",
      "max(t.total)")} AS drop_share,
       |  max(l.lateness) AS max_lateness_sec
       |FROM late l
       |CROSS JOIN (VALUES (0::BIGINT), (60::BIGINT), (300::BIGINT),
       |  (3600::BIGINT)) w(watermark_sec)
       |CROSS JOIN tot t
       |GROUP BY w.watermark_sec
       |ORDER BY w.watermark_sec""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q57_window_tumbling", q57, Some(q57Sql), headline = true),
    Q("q58_window_sliding", q58, Some(q58Sql)),
    Q("q59_sessionize", q59, Some(q59Sql)),
    Q("q90_event_bus_batches", q90, Some(q90Sql), headline = true),
    Q("q236_bot_sessions", q236, Some(q236Sql)),
    Q("q262_lateness_audit", q262, Some(q262Sql)))
}
