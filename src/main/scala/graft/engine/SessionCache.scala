package graft.engine

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) cache for materialized ingestion-time artifacts —
  * the KGraph edge indexes, the DedupIndex pair/cluster tables, and the
  * co-purchase projection all share this helper instead of each keeping
  * a private map keyed by `spark.hashCode()` (identity hashes can
  * collide across SparkSession instances in one JVM, handing one
  * session another session's — possibly stopped — localCheckpoint-backed
  * frame; round-9 ADVICE).
  *
  * Session identity is the session's UUID (collision-free, stable for
  * the session's lifetime). Entries whose SparkContext has stopped are
  * swept on every access — their checkpoint blocks are gone, so the
  * frames are unusable and holding them only leaks. Entries for LIVE
  * sibling sessions on a shared context (test suites' `newSession()`)
  * stay cached by design: the artifact contract is build-once-per-
  * session, and [[invalidate]] exists for callers that want to drop a
  * session's artifacts early (the frames themselves hold a session
  * reference, so weak-keying by session could never collect them).
  *
  * Caller contract (inherited from the maps this replaces): resolve any
  * cached DEPENDENCY before calling [[getOrBuild]] — a nested
  * getOrBuild on this shared map throws "Recursive update" whenever the
  * two keys share a hash bin, an intermittent failure mode because bin
  * assignment depends on the key hash (the original KGraph bug).
  */
object SessionCache {

  private final case class Entry(session: SparkSession, df: DataFrame)
  private val cache = new ConcurrentHashMap[String, Entry]()

  /** Collision-free session identity; falls back to identity hash only
    * for non-classic sessions (none in this project's entry points). */
  def sessionId(spark: SparkSession): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(spark)
      .getOrElse(s"id-${System.identityHashCode(spark)}")

  def getOrBuild(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val it = cache.entrySet().iterator()
    while (it.hasNext)
      if (it.next().getValue.session.sparkContext.isStopped) it.remove()
    cache.computeIfAbsent(s"${sessionId(spark)}|$key",
      _ => Entry(spark, build)).df
  }

  /** Drop every cached artifact belonging to `spark` (the frames'
    * checkpoint blocks are the caller's to release — see
    * Lineage.releaseTransient). */
  def invalidate(spark: SparkSession): Unit = {
    val prefix = sessionId(spark) + "|"
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix)) it.remove()
  }
}
