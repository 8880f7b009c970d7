package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semantics (SURVEY.md §2.8). The reference only has an event
  * bus + async queues (orchestrator/event_system.py); here the event feed
  * is a first-class Structured Streaming source with watermarked windowed
  * aggregation and stateful sessionization — plus the batch-equivalent
  * forms used by the correctness gate (identical expressions, same
  * results on a bounded input).
  */
object EventStream {

  /** Watermarked tumbling/sliding window aggregation over a stream.
    * `slide == window` gives tumbling. */
  def windowedCounts(events: DataFrame, window: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Batch-equivalent tumbling window (same epoch-aligned buckets
    * Structured Streaming produces). */
  def tumblingBatch(events: DataFrame, windowSec: Long): DataFrame =
    events
      .groupBy((floor(unix_timestamp(col("ts")) / windowSec) * windowSec)
        .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))

  /** Batch-equivalent sliding window: each event belongs to up to
    * ceil(window/slide) overlapping windows — enumerate them (explode),
    * then aggregate. This is exactly what Spark's `window(ts, w, s)`
    * does; the exact-membership filter prunes the enumeration's tail for
    * non-divisible window/slide and for slide > window (sampling). */
  def slidingBatch(events: DataFrame, windowSec: Long, slideSec: Long): DataFrame = {
    val k = ((windowSec + slideSec - 1) / slideSec).toInt.max(1)
    events
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("base", floor(col("sec") / slideSec) * slideSec)
      .withColumn("k", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("window_start", col("base") - col("k").cast("long") * slideSec)
      .filter(col("window_start") + windowSec > col("sec"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Batch sessionization: session boundary when the gap to the previous
    * event of the same user exceeds `gapSec`; session id = running count
    * of boundaries (lag + cumulative sum windows). */
  def sessionizeBatch(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    events
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > gapSec, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("duration_sec"))
  }

  final case class Ev(user_id: Long, event_id: Long, sec: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      duration_sec: Long)
  private final case class SessState(start: Long, last: Long, n: Long, emitted: Long)

  /** Streaming sessionization via flatMapGroupsWithState — the stateful
    * path a live feed would use. An idle-group processing-time timeout
    * (2× the session gap) closes the trailing open session and REMOVES
    * the group's state, so the state store does not grow with every
    * user ever seen. The batch form above is the oracle-checkable twin. */
  def sessionizeStream(events: org.apache.spark.sql.Dataset[Ev], gapSec: Long)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // idle group: flush the trailing open session, free the state
            val st = state.get
            state.remove()
            if (st.n > 0)
              Iterator(SessionOut(user, st.emitted + 1, st.n, st.last - st.start))
            else Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.sec, e.event_id))
            var st = state.getOption.getOrElse(SessState(-1, Long.MinValue / 4, 0, 0))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              if (e.sec - st.last > gapSec) {
                if (st.n > 0)
                  out += SessionOut(user, st.emitted + 1, st.n, st.last - st.start)
                st = SessState(e.sec, e.sec, 1,
                  st.emitted + (if (st.n > 0) 1 else 0))
              } else st = st.copy(last = e.sec, n = st.n + 1)
            }
            state.update(st)
            state.setTimeoutDuration(gapSec * 2 * 1000L)
            out.iterator
          }
      }
  }
}
