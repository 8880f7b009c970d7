package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.security.{AccessControl, AuditAnalytics}

/** Security / governance family: privacy-level access control
  * (`memory_core/security/privacy.py`), RBAC role-hierarchy resolution
  * (`security/rbac.py`), and audit-log analytics (`security/audit.py`)
  * re-expressed as whole-frame set algebra over the shared test tables.
  *
  * Principal data (roles, users, access rules) is governance metadata —
  * bounded by design, never data-scale — so it lives in deterministic
  * inline tables / derivations that BOTH engines replay; the resource
  * and audit sides are full scans. The role/user constants mirror the
  * reference's system roles (rbac.py:301-389) plus two custom roles
  * that exercise inheritance depth 1 and 2 (diamond) through the
  * closure.
  */
object SecurityQueries {

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  // ---- shared principal constants (one source for Spark AND oracle) --

  /** (role_id, permissions, parent_roles) — rbac.py:301-389 system
    * roles verbatim, plus senior_editor (depth-1 inheritance) and
    * compliance_officer (depth-1 diamond over two parents). */
  private val roleDefs: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("super_admin", Seq(
      "knowledge_create", "knowledge_read", "knowledge_update",
      "knowledge_delete", "knowledge_search", "relationship_create",
      "relationship_read", "relationship_update", "relationship_delete",
      "system_admin", "system_config", "system_monitor", "system_backup",
      "user_create", "user_read", "user_update", "user_delete",
      "user_manage_roles", "role_create", "role_read", "role_update",
      "role_delete", "role_assign", "privacy_manage", "security_audit",
      "encryption_manage"), Nil),
    ("knowledge_admin", Seq(
      "knowledge_create", "knowledge_read", "knowledge_update",
      "knowledge_delete", "knowledge_search", "relationship_create",
      "relationship_read", "relationship_update", "relationship_delete",
      "privacy_manage"), Nil),
    ("knowledge_editor", Seq(
      "knowledge_create", "knowledge_read", "knowledge_update",
      "knowledge_search", "relationship_create", "relationship_read",
      "relationship_update"), Nil),
    ("knowledge_reader",
      Seq("knowledge_read", "knowledge_search", "relationship_read"), Nil),
    ("user_manager", Seq(
      "user_create", "user_read", "user_update", "user_delete",
      "role_read", "role_assign"), Nil),
    ("monitor", Seq(
      "system_monitor", "security_audit", "knowledge_read",
      "relationship_read"), Nil),
    ("senior_editor", Seq("knowledge_delete"), Seq("knowledge_editor")),
    ("compliance_officer", Seq("privacy_manage"),
      Seq("monitor", "knowledge_reader")))

  /** (user_id, roles, org): a reader, an inheriting editor, a role-less
    * principal (owner/org/explicit paths only), a manager WITHOUT read
    * permission, and a diamond-inheritance officer. */
  private val userDefs: Seq[(String, Seq[String], String)] = Seq(
    ("user_0", Seq("knowledge_reader"), "org_0"),
    ("user_1", Seq("senior_editor"), "org_1"),
    ("user_2", Nil, "org_2"),
    ("user_3", Seq("user_manager"), "org_0"),
    ("user_4", Seq("compliance_officer"), "org_1"))

  private def rolesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    roleDefs.toDF("role_id", "permissions", "parent_roles")
  }

  private def usersDf(s: SparkSession): DataFrame = {
    import s.implicits._
    userDefs.toDF("user_id", "roles", "org")
  }

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ",", "]")

  private val rolesValuesSql = roleDefs.map { case (r, ps, pa) =>
    s"('$r', ${sqlList(ps)}, ${sqlList(pa)})" }.mkString(",\n|  ")

  private val usersValuesSql = userDefs.map { case (u, rs, o) =>
    s"('$u', ${sqlList(rs)}, '$o')" }.mkString(",\n|  ")

  // ---- resource metadata + access rules (derived, both engines) -----

  private val levels =
    Seq("public", "internal", "confidential", "restricted", "private")

  /** privacy_level / owner_id / organization_id derived from doc_id —
    * the KnowledgeAccessMetadata fields (privacy.py:86-112) as data. */
  private def meta(d: DataFrame): DataFrame = d.select(
    col("doc_id"),
    element_at(lit(levels.toArray),
      (col("doc_id") % 5).cast("int") + 1).as("privacy_level"),
    concat(lit("user_"), (col("doc_id") % 7).cast("string")).as("owner_id"),
    concat(lit("org_"), (col("doc_id") % 3).cast("string")).as("org"))

  /** Three deterministic rule populations: a role grant, a user grant
    * with "*" permissions and an expiry that invalidates half the rows
    * (is_valid, privacy.py:48-52), and a user grant for the WRONG
    * permission (must never yield read access). */
  private def rules(d: DataFrame): DataFrame = {
    val r1 = d.filter(col("doc_id") % 11 === 3).select(col("doc_id"),
      lit(null).cast("string").as("rule_user"),
      lit("knowledge_reader").as("rule_role"),
      array(lit("knowledge_read")).as("perms"), lit(true).as("valid"))
    val r2 = d.filter(col("doc_id") % 13 === 5).select(col("doc_id"),
      lit("user_2").as("rule_user"), lit(null).cast("string").as("rule_role"),
      array(lit("*")).as("perms"), (col("doc_id") % 2 === 1).as("valid"))
    val r3 = d.filter(col("doc_id") % 17 === 2).select(col("doc_id"),
      lit("user_3").as("rule_user"), lit(null).cast("string").as("rule_role"),
      array(lit("knowledge_update")).as("perms"), lit(true).as("valid"))
    r1.unionByName(r2).unionByName(r3)
  }

  private val metaSql =
    """meta AS (
      |  SELECT doc_id,
      |    ['public','internal','confidential','restricted','private']
      |      [CAST(doc_id % 5 AS INT) + 1] AS privacy_level,
      |    'user_' || (doc_id % 7) AS owner_id,
      |    'org_' || (doc_id % 3) AS org
      |  FROM documents)""".stripMargin

  private val rulesSql =
    """rules AS (
      |  SELECT doc_id, CAST(NULL AS VARCHAR) AS rule_user,
      |    'knowledge_reader' AS rule_role, ['knowledge_read'] AS perms,
      |    TRUE AS valid FROM documents WHERE doc_id % 11 = 3
      |  UNION ALL
      |  SELECT doc_id, 'user_2', NULL, ['*'], doc_id % 2 = 1
      |  FROM documents WHERE doc_id % 13 = 5
      |  UNION ALL
      |  SELECT doc_id, 'user_3', NULL, ['knowledge_update'], TRUE
      |  FROM documents WHERE doc_id % 17 = 2)""".stripMargin

  /** Closure + principal resolution + explicit pairs + grant grid —
    * the oracle twin of AccessControl.grants for knowledge_read. */
  private def accessCtesSql =
    s"""roles(role_id, perms, parents) AS (VALUES
       |  $rolesValuesSql),
       |edges AS (SELECT role_id, unnest(parents) AS parent FROM roles),
       |closure(role_id, ancestor) AS (
       |  SELECT role_id, role_id FROM roles
       |  UNION
       |  SELECT c.role_id, e.parent FROM closure c
       |  JOIN edges e ON c.ancestor = e.role_id),
       |read_roles AS (
       |  SELECT DISTINCT c.role_id FROM closure c
       |  JOIN roles r ON c.ancestor = r.role_id
       |  WHERE list_contains(r.perms, 'knowledge_read')),
       |users(user_id, roles, org) AS (VALUES
       |  $usersValuesSql),
       |u AS (
       |  SELECT user_id, org AS user_org,
       |    EXISTS (SELECT 1
       |      FROM (SELECT unnest(users.roles) AS r) ur
       |      JOIN read_roles rr ON ur.r = rr.role_id) AS has_perm
       |  FROM users),
       |$metaSql,
       |$rulesSql,
       |expl AS (
       |  SELECT DISTINCT x.user_id, r.doc_id
       |  FROM (SELECT user_id, unnest(roles) AS role_id FROM users) x
       |  JOIN rules r ON r.rule_role = x.role_id
       |  WHERE r.valid AND (list_contains(r.perms, 'knowledge_read')
       |    OR list_contains(r.perms, '*'))
       |  UNION
       |  SELECT us.user_id, r.doc_id
       |  FROM users us JOIN rules r ON r.rule_user = us.user_id
       |  WHERE r.valid AND (list_contains(r.perms, 'knowledge_read')
       |    OR list_contains(r.perms, '*'))),
       |grid AS (
       |  SELECT m.doc_id, m.privacy_level, m.owner_id, m.org AS res_org,
       |    u.user_id, u.user_org, u.has_perm,
       |    (e.user_id IS NOT NULL) AS explicit
       |  FROM meta m CROSS JOIN u
       |  LEFT JOIN expl e ON e.user_id = u.user_id AND e.doc_id = m.doc_id),
       |grants AS (
       |  SELECT user_id, doc_id, privacy_level,
       |    CASE WHEN owner_id = user_id THEN 'owner'
       |      WHEN privacy_level = 'private' THEN NULL
       |      WHEN privacy_level = 'restricted'
       |        THEN CASE WHEN explicit THEN 'explicit' END
       |      WHEN privacy_level = 'confidential'
       |        THEN CASE WHEN has_perm THEN 'role'
       |                  WHEN explicit THEN 'explicit' END
       |      WHEN privacy_level = 'internal'
       |        THEN CASE WHEN res_org = user_org THEN 'organization'
       |                  WHEN has_perm THEN 'role' END
       |      WHEN privacy_level = 'public'
       |        THEN CASE WHEN has_perm THEN 'role' END
       |    END AS reason
       |  FROM grid)""".stripMargin

  // -- q118: accessible-resources enumeration — every (user, document)
  //          read grant with its reason (privacy.py:523-557 over the
  //          :384-452 decision chain; role closure rbac.py:622-659).
  private def q118(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    AccessControl.grants(meta(d), usersDf(s), rules(d), rolesDf(s),
        "knowledge_read")
      .orderBy(col("user_id"), col("doc_id"))
  }

  private val q118Sql =
    s"""WITH RECURSIVE
       |$accessCtesSql
       |SELECT user_id, doc_id, privacy_level, reason
       |FROM grants WHERE reason IS NOT NULL
       |ORDER BY user_id, doc_id""".stripMargin

  // -- q119: privacy statistics (privacy.py:595-610) — per-level
  //          resource counts joined with rule and grant densities.
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = meta(d)
    val g = AccessControl.grants(m, usersDf(s), rules(d), rolesDf(s),
      "knowledge_read")
    val byLevel = m.groupBy(col("privacy_level"))
      .agg(count(lit(1)).as("n_resources"))
    val ruleCounts = rules(d).join(m, "doc_id")
      .groupBy(col("privacy_level")).agg(count(lit(1)).as("n_rules"))
    val grantCounts = g.groupBy(col("privacy_level"))
      .agg(count(lit(1)).as("n_grants"),
        countDistinct(col("user_id")).as("n_users"))
    byLevel
      .join(ruleCounts, Seq("privacy_level"), "left")
      .join(grantCounts, Seq("privacy_level"), "left")
      .select(col("privacy_level"), col("n_resources"),
        coalesce(col("n_rules"), lit(0L)).as("n_rules"),
        coalesce(col("n_grants"), lit(0L)).as("n_grants"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy(col("privacy_level"))
  }

  private val q119Sql =
    s"""WITH RECURSIVE
       |$accessCtesSql
       |SELECT m.privacy_level,
       |  count(DISTINCT m.doc_id) AS n_resources,
       |  coalesce(r.n_rules, 0) AS n_rules,
       |  coalesce(g.n_grants, 0) AS n_grants,
       |  coalesce(g.n_users, 0) AS n_users
       |FROM meta m
       |LEFT JOIN (SELECT meta.privacy_level, count(*) AS n_rules
       |  FROM rules JOIN meta USING (doc_id)
       |  GROUP BY meta.privacy_level) r ON r.privacy_level = m.privacy_level
       |LEFT JOIN (SELECT privacy_level, count(*) AS n_grants,
       |    count(DISTINCT user_id) AS n_users
       |  FROM grants WHERE reason IS NOT NULL
       |  GROUP BY privacy_level) g ON g.privacy_level = m.privacy_level
       |GROUP BY m.privacy_level, r.n_rules, g.n_grants, g.n_users
       |ORDER BY m.privacy_level""".stripMargin

  // ---- audit-log enrichment (shared derivation, both engines) -------

  /** AuditEvent fields (audit.py:54-93) derived deterministically from
    * the events table: category from event_type, level and success from
    * event_id arithmetic (decorrelated), risk from the value fraction,
    * ip from user/event arithmetic. */
  private def audit(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("user_id"), col("event_id"), col("ts"),
      col("event_type").as("action"),
      when(col("event_type") === "signup", "authentication")
        .when(col("event_type") === "click", "authorization")
        .when(col("event_type") === "view", "knowledge_access")
        .when(col("event_type") === "purchase", "knowledge_modification")
        .otherwise("security_incident").as("category"),
      element_at(lit(Array("info", "warning", "error", "critical",
          "security")),
        (floor(col("event_id") / 5) % 5).cast("int") + 1).as("level"),
      (col("event_id") % 5 >= 2).as("success"),
      (col("value") % 1.0).as("risk_score"),
      concat(lit("10.0."), (col("user_id") % 16).cast("string"), lit("."),
        (col("event_id") % 32).cast("string")).as("ip_address"))

  private val auditSql =
    """audit AS (
      |  SELECT user_id, event_id, ts, event_type AS action,
      |    CASE event_type WHEN 'signup' THEN 'authentication'
      |      WHEN 'click' THEN 'authorization'
      |      WHEN 'view' THEN 'knowledge_access'
      |      WHEN 'purchase' THEN 'knowledge_modification'
      |      ELSE 'security_incident' END AS category,
      |    ['info','warning','error','critical','security']
      |      [CAST((event_id // 5) % 5 AS INT) + 1] AS level,
      |    event_id % 5 >= 2 AS success,
      |    fmod(value, 1.0) AS risk_score,
      |    '10.0.' || (user_id % 16) || '.' || (event_id % 32) AS ip_address
      |  FROM events)""".stripMargin

  // -- q120: security summary, trailing 7 days anchored at max(ts)
  //          (audit.py:561-623) — long-form (stat, key, value).
  private def q120(s: SparkSession, dir: String): DataFrame = {
    val a = audit(s, dir)
    val now = a.agg(max(col("ts")).as("now_ts"))
    AuditAnalytics.securitySummary(a.crossJoin(broadcast(now)),
        col("now_ts"))
      .orderBy(col("stat"), col("key"))
  }

  private val q120Sql =
    s"""WITH $auditSql,
       |recent AS (
       |  SELECT * FROM audit
       |  WHERE ts >= (SELECT max(ts) FROM audit) - INTERVAL 7 DAY)
       |SELECT stat, key, value FROM (
       |  SELECT 'total_events' AS stat, '' AS key,
       |    CAST(count(*) AS BIGINT) AS value FROM recent
       |  UNION ALL
       |  SELECT 'failed_authentications', '', CAST(sum(CASE
       |    WHEN category = 'authentication' AND NOT success THEN 1
       |    ELSE 0 END) AS BIGINT) FROM recent
       |  UNION ALL
       |  SELECT 'unauthorized_access_attempts', '', CAST(sum(CASE
       |    WHEN category = 'authorization' AND NOT success THEN 1
       |    ELSE 0 END) AS BIGINT) FROM recent
       |  UNION ALL
       |  SELECT 'high_risk_events', '', CAST(sum(CASE
       |    WHEN risk_score >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM recent
       |  UNION ALL
       |  SELECT 'security_incidents', '', CAST(sum(CASE
       |    WHEN category = 'security_incident' THEN 1 ELSE 0 END)
       |    AS BIGINT) FROM recent
       |  UNION ALL
       |  SELECT 'unique_users', '',
       |    CAST(count(DISTINCT user_id) AS BIGINT) FROM recent
       |  UNION ALL
       |  SELECT 'unique_ips', '',
       |    CAST(count(DISTINCT ip_address) AS BIGINT) FROM recent
       |  UNION ALL
       |  SELECT 'events_by_level', level, CAST(count(*) AS BIGINT)
       |  FROM recent GROUP BY level
       |  UNION ALL
       |  SELECT 'events_by_category', category, CAST(count(*) AS BIGINT)
       |  FROM recent GROUP BY category)
       |ORDER BY stat, key""".stripMargin

  // -- q121: brute-force detection (audit.py:263-294) — failed auth
  //          events whose trailing window holds >= threshold failures
  //          by the same user. Reference window is (900 s, 5); the
  //          synthetic log is far sparser than a login service, so the
  //          catalog instance runs (48 h, 3) — same algebra.
  private def q121(s: SparkSession, dir: String): DataFrame =
    AuditAnalytics.bruteForce(
        audit(s, dir)
          .filter(col("category") === "authentication" && !col("success")),
        windowSec = 172800L, threshold = 3)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("failed_attempts_count"), col("risk_score"))
      .orderBy(col("user_id"), col("event_id"))

  private val q121Sql =
    s"""WITH $auditSql,
       |f AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
       |  FROM audit WHERE category = 'authentication' AND NOT success),
       |w AS (
       |  SELECT user_id, event_id, ts_us,
       |    count(*) OVER (PARTITION BY user_id ORDER BY ts_us
       |      RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW)
       |      AS failed_attempts_count
       |  FROM f)
       |SELECT user_id, event_id, ts_us, failed_attempts_count,
       |  0.8 AS risk_score
       |FROM w WHERE failed_attempts_count >= 3
       |ORDER BY user_id, event_id""".stripMargin

  // -- q122: new-IP access anomaly (audit.py:297-324) — knowledge
  //          access from an address outside the user's 30-day known
  //          set (reference intent; see the newIpAccess scaladoc for
  //          the append-before-analyze divergence note).
  private def q122(s: SparkSession, dir: String): DataFrame =
    AuditAnalytics.newIpAccess(
        audit(s, dir).filter(col("category") === "knowledge_access"))
      .orderBy(col("user_id"), col("event_id"))

  private val q122Sql =
    s"""WITH $auditSql,
       |a AS (
       |  SELECT user_id, event_id, ts, ip_address FROM audit
       |  WHERE category = 'knowledge_access'),
       |w AS (
       |  SELECT user_id, event_id, ip_address,
       |    list(ip_address) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts)
       |      RANGE BETWEEN 2592000000000 PRECEDING AND 1 PRECEDING)
       |      AS prior
       |  FROM a)
       |SELECT user_id, event_id, ip_address,
       |  CAST(len(list_distinct(prior)) AS INT) AS n_known_ips,
       |  0.4 AS risk_score
       |FROM w WHERE len(prior) > 0 AND NOT list_contains(prior, ip_address)
       |ORDER BY user_id, event_id""".stripMargin

  // -- q124: compliance report for ['access_control',
  //          'knowledge_management'] over the trailing 30 days
  //          (audit.py:625-679): tag-overlap scope; per-tag counts
  //          explode (an event counts once per matching tag), plus
  //          user/action breakdowns and 0.3/0.7 risk tiers.
  private def q124(s: SparkSession, dir: String): DataFrame = {
    val a = audit(s, dir).withColumn("compliance_tags",
      AuditAnalytics.complianceTags(col("category")))
    val now = a.agg(max(col("ts")).as("now_ts"))
    AuditAnalytics.complianceReport(a.crossJoin(broadcast(now)),
        Seq("access_control", "knowledge_management"), col("now_ts"))
      .orderBy(col("stat"), col("key"))
  }

  private val q124Sql =
    s"""WITH $auditSql,
       |tagged AS (
       |  SELECT *, CASE category
       |    WHEN 'authentication' THEN ['authentication','access_control']
       |    WHEN 'authorization' THEN ['authorization','access_control']
       |    WHEN 'knowledge_access' THEN ['data_access','knowledge_management']
       |    WHEN 'knowledge_modification'
       |      THEN ['data_modification','knowledge_management']
       |    ELSE ['security_incident','threat_detection'] END
       |    AS compliance_tags
       |  FROM audit),
       |scope AS (
       |  SELECT * FROM tagged
       |  WHERE list_has_any(compliance_tags,
       |      ['access_control','knowledge_management'])
       |    AND ts >= (SELECT max(ts) FROM audit) - INTERVAL 30 DAY)
       |SELECT stat, key, value FROM (
       |  SELECT 'total_events' AS stat, '' AS key,
       |    CAST(count(*) AS BIGINT) AS value FROM scope
       |  UNION ALL
       |  SELECT 'events_by_tag', tag, CAST(count(*) AS BIGINT) FROM (
       |    SELECT unnest(compliance_tags) AS tag FROM scope)
       |  WHERE tag IN ('access_control','knowledge_management')
       |  GROUP BY tag
       |  UNION ALL
       |  SELECT 'events_by_user', CAST(user_id AS VARCHAR),
       |    CAST(count(*) AS BIGINT) FROM scope GROUP BY user_id
       |  UNION ALL
       |  SELECT 'events_by_action', action, CAST(count(*) AS BIGINT)
       |  FROM scope GROUP BY action
       |  UNION ALL
       |  SELECT 'risk_distribution', CASE WHEN risk_score < 0.3 THEN 'low'
       |    WHEN risk_score < 0.7 THEN 'medium' ELSE 'high' END,
       |    CAST(count(*) AS BIGINT) FROM scope GROUP BY 2)
       |ORDER BY stat, key""".stripMargin

  // -- q123: governance-gated corpus build — the q116 pipeline run over
  //          ONLY the documents a principal may read (q118's grant set
  //          for user_0). Access filtering precedes dedup/split so
  //          non-readable documents can neither shadow a readable
  //          duplicate nor leak into the manifest — the composition a
  //          compliance-constrained training pipeline runs.
  private def q123(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    import graft.pipeline.Sampling
    val d = docs(s, dir)
    val readable = AccessControl.grants(meta(d), usersDf(s), rules(d),
        rolesDf(s), "knowledge_read")
      .filter(col("user_id") === "user_0")
      .select(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("dkey"))
    d.join(readable, Seq("doc_id"), "left_semi")
      .withColumn("quality", TF.qualityScore(col("text"), col("n_chars")))
      .filter(col("quality") >= 0.75)
      .withColumn("dkey",
        md5(array_join(array_sort(TF.distinctTokens(col("text"))), " ")))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("split", Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 98, "val" -> 1, "test" -> 1), salt = "v1"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TF.tokens(col("text")))).as("n_tokens"),
        round(avg(col("quality")), 6).as("avg_quality"))
      .orderBy(col("source"), col("split"))
  }

  private val q123Sql = {
    import graft.text.{TextFunctions => TF}
    val quality = TF.sql.qualityScore("text", "n_chars")
    val bucket = graft.pipeline.Sampling.sql.hashBucket("doc_id", 100, "v1")
    s"""WITH RECURSIVE
       |$accessCtesSql,
       |readable AS (
       |  SELECT DISTINCT doc_id FROM grants
       |  WHERE reason IS NOT NULL AND user_id = 'user_0'),
       |gated AS (
       |  SELECT doc_id, source, text, $quality AS quality,
       |    md5(array_to_string(list_sort(${TF.sql.distinctTokens("text")}),
       |      ' ')) AS dkey
       |  FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM readable)
       |    AND $quality >= 0.75),
       |kept AS (
       |  SELECT *, min(doc_id) OVER (PARTITION BY dkey) AS keep_id
       |  FROM gated),
       |assigned AS (
       |  SELECT source, quality, ${TF.sql.tokenCount("text")} AS n_toks,
       |    CASE WHEN $bucket < 98 THEN 'train'
       |         WHEN $bucket < 99 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM kept WHERE doc_id = keep_id)
       |SELECT source, split, count(*) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  round(avg(quality), 6) AS avg_quality
       |FROM assigned GROUP BY 1, 2 ORDER BY source, split""".stripMargin
  }

  // -- q194: k-anonymity / l-diversity audit — the release-gating
  //          check a privacy-aware pipeline runs before publishing a
  //          record-level extract (Sweeney 2002; Machanavajjhala et
  //          al. 2006). Quasi-identifier = (nation, market segment,
  //          account-balance band); sensitive attribute = the
  //          customer's dominant order priority (most frequent, tie →
  //          smallest). Reports every QI equivalence class with its
  //          size k and sensitive-value diversity l, flagged against
  //          k >= 5 / l >= 2. Scale shape: one keyed aggregate + a
  //          per-customer top-1 window over orders, one equi-join onto
  //          the registry, one grouped aggregate — no per-class
  //          enumeration, classes stream out of the final groupBy.
  private val KAnonK = 5
  private val LDivL = 2

  private def q194(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("c").desc, col("o_orderpriority"))
    val dom = orders.groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("c_custkey"),
        col("o_orderpriority").as("sensitive"))
    cust.join(dom, Seq("c_custkey"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"),
        coalesce(col("sensitive"), lit("none")).as("sensitive"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("k_size"),
        countDistinct(col("sensitive")).as("l_distinct"))
      .withColumn("k_anonymous", col("k_size") >= KAnonK)
      .withColumn("l_diverse", col("l_distinct") >= LDivL)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
  }

  private val q194Sql =
    s"""WITH dom AS (
       |  SELECT o_custkey AS c_custkey, o_orderpriority AS sensitive
       |  FROM (
       |    SELECT o_custkey, o_orderpriority,
       |      row_number() OVER (PARTITION BY o_custkey
       |        ORDER BY count(*) DESC, o_orderpriority) AS rn
       |    FROM orders GROUP BY o_custkey, o_orderpriority) t
       |  WHERE rn = 1),
       |rec AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       |    coalesce(d.sensitive, 'none') AS sensitive
       |  FROM customer c LEFT JOIN dom d USING (c_custkey))
       |SELECT c_nationkey, c_mktsegment, bal_band,
       |  count(*) AS k_size,
       |  count(DISTINCT sensitive) AS l_distinct,
       |  count(*) >= $KAnonK AS k_anonymous,
       |  count(DISTINCT sensitive) >= $LDivL AS l_diverse
       |FROM rec GROUP BY 1, 2, 3
       |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin

  // -- q336: t-closeness audit (Li, Li & Venkatasubramanian ICDE 2007)
  //          — completes q194's privacy triad: a class can be
  //          k-anonymous AND l-diverse yet still leak (its sensitive
  //          DISTRIBUTION may differ sharply from the population's —
  //          the "skewness attack"). Per q194 QI class, the total-
  //          variation distance between the class's sensitive
  //          distribution and the global one, computed in EXACT
  //          integer cross-multiplication: TVD = Σ|c_v·N − g_v·k| /
  //          (2·k·N) — no per-class float normalization. Flagged
  //          against t = 0.4 (categorical TVD convention). Scale
  //          shape: the (class × sensitive-value) census joins the
  //          #values-bounded global marginal, one keyed agg — classes
  //          stream out, nothing is enumerated per record.
  private val TClose = 0.4

  private def q336(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val orders = Tables.load(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("c").desc, col("o_orderpriority"))
    val dom = orders.groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey").as("c_custkey"),
        col("o_orderpriority").as("sensitive"))
    val rec = cust.join(dom, Seq("c_custkey"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"),
        coalesce(col("sensitive"), lit("none")).as("sensitive"))
    val cls = rec.groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("bal_band"), col("sensitive"))
      .agg(count(lit(1)).as("c_v"))
    val glob = rec.groupBy(col("sensitive"))
      .agg(count(lit(1)).as("g_v"))
      .crossJoin(broadcast(rec.agg(count(lit(1)).as("nn"))))
    // a class missing a sensitive value v still contributes |0·N −
    // g_v·k| to its TVD — realized via the value-grid right join
    val kSize = cls.groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("bal_band")).agg(sum(col("c_v")).as("k_size"))
    val grid = kSize.crossJoin(broadcast(glob))
    grid.join(cls, Seq("c_nationkey", "c_mktsegment", "bal_band",
        "sensitive"), "left")
      .withColumn("cv", coalesce(col("c_v"), lit(0L)))
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("bal_band"), col("k_size"), col("nn"))
      .agg(sum(abs(col("cv") * col("nn") - col("g_v") * col("k_size")))
        .as("num"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("k_size"),
        graft.functions.ExactRound.ratio6(col("num"),
          col("k_size") * col("nn") * 2).as("tvd"),
        (graft.functions.ExactRound.ratio6(col("num"),
          col("k_size") * col("nn") * 2) <= TClose).as("t_close"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"),
        col("bal_band"))
  }

  private val q336Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH dom AS (
       |  SELECT o_custkey AS c_custkey, o_orderpriority AS sensitive
       |  FROM (
       |    SELECT o_custkey, o_orderpriority,
       |      row_number() OVER (PARTITION BY o_custkey
       |        ORDER BY count(*) DESC, o_orderpriority) AS rn
       |    FROM orders GROUP BY o_custkey, o_orderpriority) t
       |  WHERE rn = 1),
       |rec AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       |    coalesce(d.sensitive, 'none') AS sensitive
       |  FROM customer c LEFT JOIN dom d USING (c_custkey)),
       |cls AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band, sensitive,
       |    CAST(count(*) AS BIGINT) AS c_v
       |  FROM rec GROUP BY 1, 2, 3, 4),
       |gmar AS (
       |  SELECT sensitive, CAST(count(*) AS BIGINT) AS g_v,
       |    (SELECT CAST(count(*) AS BIGINT) FROM rec) AS nn
       |  FROM rec GROUP BY 1),
       |ks AS (
       |  SELECT c_nationkey, c_mktsegment, bal_band,
       |    CAST(sum(c_v) AS BIGINT) AS k_size
       |  FROM cls GROUP BY 1, 2, 3),
       |grid AS (SELECT * FROM ks CROSS JOIN gmar),
       |terms AS (
       |  SELECT g.c_nationkey, g.c_mktsegment, g.bal_band, g.k_size,
       |    g.nn,
       |    abs(coalesce(c.c_v, 0) * g.nn - g.g_v * g.k_size) AS term
       |  FROM grid g LEFT JOIN cls c
       |    ON g.c_nationkey = c.c_nationkey
       |    AND g.c_mktsegment = c.c_mktsegment
       |    AND g.bal_band = c.bal_band AND g.sensitive = c.sensitive)
       |SELECT c_nationkey, c_mktsegment, bal_band, k_size,
       |  ${ER.sql.ratio6("CAST(sum(term) AS BIGINT)",
            "k_size * nn * 2")} AS tvd,
       |  ${ER.sql.ratio6("CAST(sum(term) AS BIGINT)",
            "k_size * nn * 2")} <= $TClose AS t_close
       |FROM terms GROUP BY 1, 2, 3, 4, nn
       |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q118_access_grants", q118, Some(q118Sql)),
    Q("q119_privacy_stats", q119, Some(q119Sql)),
    Q("q120_security_summary", q120, Some(q120Sql)),
    Q("q121_brute_force", q121, Some(q121Sql)),
    Q("q122_new_ip_anomaly", q122, Some(q122Sql)),
    Q("q123_governed_corpus", q123, Some(q123Sql)),
    Q("q124_compliance_report", q124, Some(q124Sql)),
    Q("q194_k_anonymity", q194, Some(q194Sql)),
    Q("q336_t_closeness", q336, Some(q336Sql)))
}
