package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.engine.CacheAnalysis

/** Pins the TTL cache-outcome window against the reference QueryCache
  * state machine on a hand-traced request log. */
class CacheAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, typ: String, ms: Double, k: Int) =
    (id, new Timestamp(sec * 1000L), 1L, typ, ms, s"""{"k": $k}""")

  private def outcomes(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    CacheAnalysis.outcomes(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      ttlSeconds = 100L)
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap

  test("hit within TTL, expired past it, cold on first sight") {
    val o = outcomes(Seq(
      ev(1L, 0L, "search", 50.0, 7),      // cold, cached
      ev(2L, 60L, "search", 50.0, 7),     // within 100 s → hit
      ev(3L, 300L, "search", 50.0, 7),    // 240 s after last put → expired
      ev(4L, 310L, "search", 50.0, 9)))   // different key → cold
    assert(o == Map(1L -> "cold_miss", 2L -> "hit",
      3L -> "expired_miss", 4L -> "cold_miss"))
  }

  test("fast responses are never cached, so followers miss") {
    val o = outcomes(Seq(
      ev(1L, 0L, "search", 5.0, 7),       // under 10 ms → put skipped
      ev(2L, 10L, "search", 50.0, 7),     // nothing cached yet → cold
      ev(3L, 20L, "search", 5.0, 7)))     // ev2 WAS cached → hit
    assert(o == Map(1L -> "cold_miss", 2L -> "cold_miss", 3L -> "hit"))
  }

  test("expiry is measured from the latest cacheable put, not the latest access") {
    val o = outcomes(Seq(
      ev(1L, 0L, "search", 50.0, 7),
      ev(2L, 90L, "search", 5.0, 7),      // hit, but put skipped (fast)
      ev(3L, 150L, "search", 50.0, 7)))   // 150 s after put 1 → expired
    assert(o(2L) == "hit" && o(3L) == "expired_miss")
  }

  test("key normalization folds case and whitespace like _generate_cache_key") {
    val rows = Seq(
      (1L, new Timestamp(0L), 1L, " Search ", 50.0, """{"k": 7}"""),
      (2L, new Timestamp(60000L), 1L, "search", 50.0, """{"k": 7}"""))
    val o = CacheAnalysis.outcomes(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      ttlSeconds = 100L)
      .orderBy("event_id").collect().map(_.getString(5))
    assert(o.toSeq == Seq("cold_miss", "hit"))
  }

  test("outcomesStream matches the batch window on a bounded feed") {
    // 7-day TTL: at sf0.001 the per-key inter-arrival makes all three
    // outcomes occur (600 s yields no hits at this scale)
    val ttl = 7L * 86400
    val events = Tables.load(spark, sf, "events")
    val batch = CacheAnalysis.outcomes(events, ttlSeconds = ttl)
      .select(col("event_id"), col("outcome"))
      .as[(Long, String)].collect().sorted.toSeq
    val reqs = events.select(
      concat_ws(":", lower(trim(col("event_type"))),
        get_json_object(col("props"), "$.k")).as("cache_key"),
      col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"),
      (col("value") >= CacheAnalysis.MinCacheableMs).as("cacheable"))
      .as[CacheAnalysis.CacheReq]
    val streamed = CacheAnalysis.outcomesStream(reqs, ttlSeconds = ttl)
      .select(col("event_id"), col("outcome"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(batch.nonEmpty && batch.exists(_._2 == "hit") &&
      batch.exists(_._2 == "expired_miss"))
    assert(streamed == batch)
  }

  test("statistics aggregate the outcome split per type") {
    val stats = CacheAnalysis.statistics(Seq(
      ev(1L, 0L, "search", 50.0, 7),
      ev(2L, 60L, "search", 50.0, 7),
      ev(3L, 300L, "search", 50.0, 7),
      ev(4L, 0L, "view", 50.0, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      ttlSeconds = 100L)
      .orderBy("event_type").collect()
    val s = stats(0)
    assert(s.getString(0) == "search" && s.getLong(1) == 3L &&
      s.getLong(2) == 1L && s.getLong(3) == 1L && s.getLong(4) == 1L)
    assert(math.abs(s.getDouble(5) - 0.333333) < 1e-9)
    assert(stats(1).getLong(1) == 1L && stats(1).getDouble(5) == 0.0)
  }
}
