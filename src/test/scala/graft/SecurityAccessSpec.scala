package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.security.{AccessControl, AuditAnalytics}

/** Pins the access-control and audit-analytics contracts against the
  * reference semantics (security/privacy.py, security/rbac.py,
  * security/audit.py): closure reachability incl. diamond and cycle
  * inputs, every branch of the grant precedence chain, rule expiry and
  * wrong-permission rules, the brute-force window boundary, and the
  * first-event exemption of the new-IP detector. */
class SecurityAccessSpec extends SparkSpec {
  import spark.implicits._

  private def roles(rows: (String, Seq[String], Seq[String])*) =
    rows.toDF("role_id", "permissions", "parent_roles")

  test("roleClosure: diamond inheritance reaches both parents' ancestors") {
    val r = roles(
      ("base_a", Seq("pa"), Nil),
      ("base_b", Seq("pb"), Nil),
      ("mid", Seq("pm"), Seq("base_a")),
      ("top", Seq("pt"), Seq("mid", "base_b")))
    val perms = AccessControl.rolePermissions(r)
      .collect().map(x => x.getString(0) -> x.getString(1)).toSet
    assert(perms.filter(_._1 == "top").map(_._2) ==
      Set("pt", "pm", "pa", "pb"))
    assert(perms.filter(_._1 == "mid").map(_._2) == Set("pm", "pa"))
    assert(perms.filter(_._1 == "base_a").map(_._2) == Set("pa"))
  }

  test("roleClosure: cyclic hierarchy converges (rbac.py visited guard)") {
    val r = roles(
      ("a", Seq("pa"), Seq("b")),
      ("b", Seq("pb"), Seq("a")))
    val perms = AccessControl.rolePermissions(r)
      .collect().map(x => x.getString(0) -> x.getString(1)).toSet
    assert(perms == Set("a" -> "pa", "a" -> "pb", "b" -> "pa", "b" -> "pb"))
  }

  test("cyclicRoles: flags cycle members only (rbac.py validate_role_hierarchy)") {
    val r = roles(
      ("a", Seq("pa"), Seq("b")),
      ("b", Seq("pb"), Seq("a")),
      ("self", Seq("ps"), Seq("self")),
      ("clean", Seq("pc"), Seq("a"))) // points INTO a cycle but is not in one
    val bad = AccessControl.cyclicRoles(r)
      .collect().map(_.getString(0)).toSet
    assert(bad == Set("a", "b", "self"))
  }

  private val specRoles = roles(
    ("reader", Seq("knowledge_read"), Nil),
    ("editor", Seq("knowledge_update"), Seq("reader")),
    ("clerk", Seq("user_read"), Nil))

  private val specUsers = Seq(
    ("u_reader", Seq("reader"), "org_a"),
    ("u_editor", Seq("editor"), "org_b"),
    ("u_none", Seq.empty[String], "org_a"),
    ("u_clerk", Seq("clerk"), "org_c"))
    .toDF("user_id", "roles", "org")

  // one doc per privacy level; u_none owns doc 10 (private)
  private val specMeta = Seq(
    (10L, "private", "u_none", "org_z"),
    (11L, "restricted", "u_x", "org_z"),
    (12L, "confidential", "u_x", "org_z"),
    (13L, "internal", "u_x", "org_a"),
    (14L, "public", "u_x", "org_z"))
    .toDF("doc_id", "privacy_level", "owner_id", "org")

  private val specRules = Seq(
    // valid user rule with wildcard perms on the restricted doc
    (11L, Some("u_clerk"), None: Option[String], Seq("*"), true),
    // EXPIRED user rule on the same doc — must not grant
    (11L, Some("u_editor"), None: Option[String], Seq("*"), false),
    // role rule with the WRONG permission on the confidential doc
    (12L, None: Option[String], Some("clerk"), Seq("user_read"), true))
    .toDF("doc_id", "rule_user", "rule_role", "perms", "valid")

  test("grants: every precedence branch of privacy.py:384-452") {
    val g = AccessControl.grants(specMeta, specUsers, specRules,
        specRoles, "knowledge_read")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3)))
      .toSet
    assert(g(("u_none", 10L, "owner")),
      "owner reads own private doc")
    assert(!g.exists(x => x._2 == 10L && x._1 != "u_none"),
      "private denies all non-owners")
    assert(g(("u_clerk", 11L, "explicit")),
      "restricted grants via valid wildcard rule")
    assert(!g.exists(x => x._2 == 11L && x._1 == "u_editor"),
      "expired rule never grants")
    assert(!g.exists(x => x._2 == 11L && x._1 == "u_reader"),
      "restricted ignores role permissions")
    assert(g(("u_reader", 12L, "role")) && g(("u_editor", 12L, "role")),
      "confidential grants via direct AND inherited read permission")
    assert(!g.exists(x => x._2 == 12L && x._1 == "u_clerk"),
      "wrong-permission rule never grants read")
    assert(g(("u_none", 13L, "organization")),
      "internal grants on org match without any role")
    assert(g(("u_editor", 14L, "role")) && !g.exists(x =>
        x._2 == 14L && (x._1 == "u_none" || x._1 == "u_clerk")),
      "public still requires the read permission (privacy.py:448-450)")
  }

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("bruteForce: threshold fires inside the window, not across it") {
    // u1: 5 failures within 15 min → the 5th (and only it) escalates
    // at threshold 5; u2: 5 failures spread 16 min apart → never fires
    val fails = ((1 to 5).map(i => (1L, i.toLong, ts(i * 3))) ++
        (1 to 5).map(i => (2L, (10 + i).toLong, ts(i * 16))))
      .toDF("user_id", "event_id", "ts")
    val hits = AuditAnalytics.bruteForce(fails, windowSec = 900L,
        threshold = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(hits.toSeq == Seq((1L, 5L, 5L)))
    // boundary is inclusive: failures at t-900s exactly still count
    val edge = Seq((3L, 1L, ts(0)), (3L, 2L, ts(15)))
      .toDF("user_id", "event_id", "ts")
    val h2 = AuditAnalytics.bruteForce(edge, windowSec = 900L,
      threshold = 2).collect()
    assert(h2.length == 1 && h2.head.getLong(1) == 2L)
  }

  test("bruteForceStream matches the batch twin on a bounded feed") {
    // every event as a failed attempt — dense enough at sf0.001
    val fails = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[AuditAnalytics.AuthFail]
    val win = 7L * 86400
    val batch = AuditAnalytics.bruteForce(
        fails.select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts")),
        windowSec = win, threshold = 3)
      .select(col("user_id"), col("event_id"),
        col("failed_attempts_count"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val streamed = AuditAnalytics.bruteForceStream(fails, windowSec = win,
        threshold = 3)
      .select(col("user_id"), col("event_id"),
        col("failed_attempts_count"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("bruteForceStream: same-timestamp ties fold as one RANGE run") {
    val fails = Seq(
      AuditAnalytics.AuthFail(1L, 1L, 1000000L),
      AuditAnalytics.AuthFail(1L, 2L, 1000000L), // tie with event 1
      AuditAnalytics.AuthFail(1L, 3L, 999000000000L)) // far outside window
      .toDS()
    val out = AuditAnalytics.bruteForceStream(fails, windowSec = 900L,
        threshold = 2)
      .collect().map(i => (i.event_id, i.failed_attempts_count)).sorted
    // both tied events see the full tie count (RANGE, not ROWS), and
    // the late lone failure sees a pruned window
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L)))
  }

  test("newIpAccess: empty-set exempt; repeats known; lookback expires") {
    val day = 1440 // minutes
    val acc = Seq(
      (1L, 1L, ts(1), "ip_a"),
      (1L, 2L, ts(2), "ip_a"), // known
      (1L, 3L, ts(3), "ip_b"), // new
      (1L, 4L, ts(4), "ip_a"), // known again
      // 40 days later: the 30-day known set has emptied — exempt again,
      // exactly the reference's days_back=30 recent_access scope
      (1L, 5L, ts(41 * day), "ip_c"),
      (1L, 6L, ts(41 * day + 1), "ip_d"), // new vs {ip_c}
      (2L, 7L, ts(1), "ip_z")) // first event of u2 — exempt
      .toDF("user_id", "event_id", "ts", "ip_address")
    val out = AuditAnalytics.newIpAccess(acc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 3L, 1), (1L, 6L, 1)))
  }
}
