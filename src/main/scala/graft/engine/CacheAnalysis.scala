package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Query-cache behavior analysis over a request log — the batch
  * analogue of the reference's QueryCache
  * (memory_core/query/query_cache.py): the serving structure holds
  * entries under a normalized request key with a TTL, so given a
  * REQUEST LOG the cache's hit/miss/expiry behavior is a pure function
  * of the log — each request hits iff a cacheable request with the
  * same key landed within the TTL before it. That reading turns the
  * reference's sequential get/put state machine into one window
  * expression per request, which is the form that audits cache sizing
  * on a real workload at any scale (one shuffle on the key, one
  * ordered window pass).
  *
  * Reference semantics carried over:
  *   - key normalization strip().lower() + component join
  *     (query_cache.py:268-316 _generate_cache_key);
  *   - fast responses are never cached — execution under 10 ms skips
  *     the put (:318-345 _should_skip_caching), so a request after a
  *     skipped put is a miss even inside the TTL;
  *   - an entry seen but past its TTL is an EXPIRED miss, distinct
  *     from a cold one (:119-162 get; CacheEntry.is_expired :34-37);
  *   - hit_rate = hits / total requests (:45-59 CacheStatistics).
  *
  * Not carried over: byte-budget LRU eviction (`_ensure_cache_space`)
  * — eviction order depends on global sequential access order, which
  * no declarative plan expresses; TTL-only analysis is the upper bound
  * on any LRU's hit rate and the sizing signal the statistics feed.
  */
object CacheAnalysis {

  /** Minimum execution time for a response to be cached
    * (query_cache.py:332-334). */
  val MinCacheableMs = 10.0

  /** Per-request cache outcome: (event_id, ts, event_type, cache_key,
    * cacheable, outcome ∈ hit|expired_miss|cold_miss). The log maps
    * to the reference's QueryRequest under the monitoring family's
    * fixed mapping: key components := (event_type, props.k),
    * execution_time_ms := value. */
  def outcomes(events: DataFrame, ttlSeconds: Long): DataFrame = {
    val keyed = events.select(
      col("event_id"), col("ts"), col("event_type"),
      concat_ws(":", lower(trim(col("event_type"))),
        get_json_object(col("props"), "$.k")).as("cache_key"),
      (col("value") >= MinCacheableMs).as("cacheable"))
    val before = Window.partitionBy(col("cache_key"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .withColumn("prev_put_us",
        max(when(col("cacheable"), unix_micros(col("ts")))).over(before))
      .withColumn("outcome",
        when(col("prev_put_us").isNull, "cold_miss")
          .when(unix_micros(col("ts")) - col("prev_put_us") <=
            ttlSeconds * 1000000L, "hit")
          .otherwise("expired_miss"))
      .drop("prev_put_us")
  }

  /** Per-request-type cache statistics (CacheStatistics :45-59 plus
    * the expiry split get() maintains): requests, hits, expired and
    * cold misses, hit_rate, distinct keys. */
  def statistics(events: DataFrame, ttlSeconds: Long): DataFrame =
    outcomes(events, ttlSeconds)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("requests"),
        count(when(col("outcome") === "hit", 1)).as("hits"),
        count(when(col("outcome") === "expired_miss", 1)).as("expired_misses"),
        count(when(col("outcome") === "cold_miss", 1)).as("cold_misses"),
        round(count(when(col("outcome") === "hit", 1)).cast("double") /
          count(lit(1)), 6).as("hit_rate"),
        countDistinct(col("cache_key")).as("distinct_keys"))

  /** One normalized cache request on the stream side. `us` is the
    * event time in epoch micros. */
  final case class CacheReq(cache_key: String, event_id: Long,
      event_type: String, us: Long, cacheable: Boolean)

  /** Streamed per-request outcome. */
  final case class CacheOutcome(event_id: Long, cache_key: String,
      event_type: String, outcome: String)

  private final case class CacheState(lastPutUs: Long)

  /** Streaming twin of [[outcomes]]: per-key state is ONE long (the
    * latest cacheable put time), updated in (us, event_id) order —
    * so on a bounded feed the labels match the batch window exactly
    * (the parity contract CacheAnalysisSpec pins, same shape as the
    * q121 brute-force twin).
    *
    * State is kept for the life of the stream (NoTimeout): dropping a
    * key's state would relabel its next request cold instead of
    * expired. That mirrors the batch window, which remembers every
    * prior put. The reference's periodic `_cleanup_expired`
    * (query_cache.py:432-458) DOES evict expired entries, after which
    * its next access reads cold — a production stream would set a
    * state timeout ≥ TTL and inherit exactly that cleanup semantics;
    * parity with the no-cleanup batch reading requires keeping state. */
  def outcomesStream(reqs: Dataset[CacheReq],
      ttlSeconds: Long): Dataset[CacheOutcome] = {
    import reqs.sparkSession.implicits._
    val ttlUs = ttlSeconds * 1000000L
    reqs.groupByKey(_.cache_key)
      .flatMapGroupsWithState[CacheState, CacheOutcome](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, evs: Iterator[CacheReq], state: GroupState[CacheState]) =>
          var lastPut = state.getOption.map(_.lastPutUs)
          val out = evs.toSeq.sortBy(e => (e.us, e.event_id)).map { e =>
            val outcome = lastPut match {
              case None => "cold_miss"
              case Some(p) if e.us - p <= ttlUs => "hit"
              case _ => "expired_miss"
            }
            if (e.cacheable)
              lastPut = Some(lastPut.fold(e.us)(math.max(_, e.us)))
            CacheOutcome(e.event_id, key, e.event_type, outcome)
          }
          lastPut.foreach(p => state.update(CacheState(p)))
          out.iterator
      }
  }
}
