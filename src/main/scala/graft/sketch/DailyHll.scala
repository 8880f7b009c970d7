package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.HyperBall

/** Daily HLL register tables for distinct-user rollups (q344) — the
  * max-monoid state a streaming ingest appends: per (day, register)
  * the max rank seen. Merging appended per-batch partials with
  * register max reproduces the one-pass table exactly for ANY batch
  * decomposition (max is commutative/associative/idempotent), which
  * is what makes sketch-backed dashboards incrementally maintainable
  * — pinned through a real Structured Streaming run in
  * DailyHllStreamSpec. Register recipe = HyperBall's (m = 16,
  * md5-bucketed, bit-20-anchored rank).
  */
object DailyHll {

  /** Per-(day, j) max-rank register rows for one (micro-)batch of raw
    * events. */
  def dailyRegisters(events: DataFrame): DataFrame = {
    val h = graft.text.TextFunctions.md5Long(
      col("user_id").cast("string"))
    events
      .select(expr("CAST(ts AS LONG) div 86400").as("day"),
        pmod(h, lit(16L)).as("j"),
        (pmod(floor(h / lit(16.0)).cast("long"), lit(1048576L)) +
          lit(1048576L)).as("w"))
      .selectExpr("day", "j", s"${HyperBall.rhoSql("w")} AS r")
      .groupBy(col("day"), col("j")).agg(max(col("r")).as("r"))
  }

  /** Monoid merge: appended partial tables → one row per (day, j). */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy(col("day"), col("j"))
      .agg(max(col("r")).as("r"))
}
