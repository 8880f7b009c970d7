package graft

import graft.engine.SessionCache

/** Pins the shared artifact cache's identity contract: session keys are
  * collision-free (UUID, not identity hashCode — round-9 ADVICE found
  * the hash-keyed maps could hand one session another session's
  * checkpoint-backed frame), sibling sessions never share entries, and
  * invalidate drops exactly one session's artifacts. */
class SessionCacheSpec extends SparkSpec {
  import spark.implicits._

  test("artifacts are keyed per session, built once, and invalidatable") {
    val s2 = spark.newSession()
    assert(SessionCache.sessionId(spark) != SessionCache.sessionId(s2),
      "sibling sessions must have distinct cache identities")
    var builds = 0
    def make(s: org.apache.spark.sql.SparkSession) =
      SessionCache.getOrBuild(s, "spec-artifact") {
        builds += 1; Seq(1).toDF("x")
      }
    val a1 = make(spark)
    val a2 = make(spark)
    assert(builds == 1 && (a1 eq a2), "same session reuses the built frame")
    make(s2): Unit
    assert(builds == 2, "a sibling session must trigger its own build")
    SessionCache.invalidate(spark)
    make(spark): Unit
    assert(builds == 3, "invalidate must drop the session's entries")
    make(s2): Unit
    assert(builds == 3, "invalidate must not touch other sessions' entries")
    SessionCache.invalidate(spark)
    SessionCache.invalidate(s2)
  }
}
