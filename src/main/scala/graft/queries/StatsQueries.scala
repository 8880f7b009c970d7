package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.graph.{GraphOps, KGraph}
import graft.temporal.TemporalOps
import graft.text.{TextFunctions => TF}
import graft.engine.Lineage.LineageOps
import graft.functions.ExactRound

/** Second statistics/insight family (SURVEY.md §2.7 remainder +
  * §2.1 content scan): growth rate, decline runs, group similarity,
  * sequence chains, structural anomalies, consensus levels.
  */
object StatsQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private def daily(s: SparkSession, dir: String): DataFrame =
    TemporalOps.dailySeries(events(s, dir), "event_type", "ts")
      .withColumn("idx", datediff(to_date(col("day")), lit("2024-01-01")))

  private val dailySql =
    """daily AS (
      |  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS day, count(*) AS cnt,
      |    date_diff('day', DATE '2024-01-01', CAST(strftime(ts, '%Y-%m-%d') AS DATE)) AS idx
      |  FROM events GROUP BY 1, 2)""".stripMargin

  // -- q60: compound growth rate over cumulative series
  //         (insight_discovery.py:1168-1184)
  private def q60(s: SparkSession, dir: String): DataFrame =
    TemporalOps.growthRate(daily(s, dir), "k", "day", "cum")
      .select(col("k"), col("first_cum"), col("last_cum"), col("n_days"),
        round(col("growth_rate"), 8).as("growth_rate"))
      .orderBy(col("k"))

  private val q60Sql =
    s"""WITH $dailySql,
       |cumd AS (
       |  SELECT k, day, sum(cnt) OVER (PARTITION BY k ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM daily)
       |SELECT k, arg_min(cum, day) * 1.0 AS first_cum,
       |  arg_max(cum, day) * 1.0 AS last_cum, count(*) AS n_days,
       |  round(CASE WHEN count(*) > 1 AND arg_min(cum, day) > 0
       |    THEN pow(arg_max(cum, day) * 1.0 / arg_min(cum, day),
       |             1.0 / (count(*) - 1)) - 1
       |    ELSE 0.0 END, 8) AS growth_rate
       |FROM cumd GROUP BY k ORDER BY k""".stripMargin

  // -- q61: monotone-decline runs via lag + run-id grouping
  //         (insight_discovery.py:1185-1242)
  private def q61(s: SparkSession, dir: String): DataFrame =
    TemporalOps.declinePeriods(daily(s, dir), "k", "idx", "cnt", minLen = 2)
      .select(col("k"), col("start_idx"), col("end_idx"), col("len"), col("peak"))
      .orderBy(col("k"), col("start_idx"))

  private val q61Sql =
    s"""WITH $dailySql,
       |lagd AS (
       |  SELECT k, idx, cnt, lag(cnt) OVER (PARTITION BY k ORDER BY idx) AS prev
       |  FROM daily),
       |flagged AS (
       |  SELECT *, CASE WHEN prev IS NOT NULL AND cnt < prev THEN 1 ELSE 0 END AS declining,
       |    sum(CASE WHEN prev IS NOT NULL AND cnt < prev THEN 0 ELSE 1 END)
       |      OVER (PARTITION BY k ORDER BY idx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
       |  FROM lagd)
       |SELECT k, min(idx) AS start_idx, max(idx) AS end_idx, count(*) AS len,
       |  max(prev) * 1.0 AS peak
       |FROM flagged WHERE declining = 1
       |GROUP BY k, run_id HAVING count(*) >= 2
       |ORDER BY k, start_idx""".stripMargin

  // -- q62: avg pairwise token-Jaccard within source groups
  //         (insight_discovery.py:690-720). Scale contract: exact average
  //         pairwise similarity is inherently Σ|group|² — the reference
  //         itself only ever runs it over bounded groups. At corpus scale
  //         callers must cap/sample each group first (e.g.
  //         `.withColumn("r", rand(seed)).filter(...)` or a per-group
  //         limit); the join below is a blocked equi-join either way.
  private def q62(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("source"), col("doc_id"), TF.distinctTokens(col("text")).as("toks"))
      .truncateLineage() // tokenize once; the self-join reuses it
    val a = t.select(col("source"), col("doc_id").as("a_id"), col("toks").as("a"))
    val b = t.select(col("source"), col("doc_id").as("b_id"), col("toks").as("b"))
    a.join(b, "source").filter(col("a_id") < col("b_id"))
      .withColumn("jac", TF.jaccardSim(col("a"), col("b")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("jac")), 6).as("avg_jaccard"))
      .orderBy(col("source"))
  }

  private val q62Sql =
    """WITH t AS (
      |  SELECT source, doc_id, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents),
      |pairs AS (
      |  SELECT a.source,
      |    len(list_intersect(a.toks, b.toks)) * 1.0 AS inter,
      |    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
      |  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
      |SELECT source, count(*) AS n_pairs,
      |  round(avg(CASE WHEN uni > 0 THEN inter / uni ELSE 0.0 END), 6) AS avg_jaccard
      |FROM pairs GROUP BY source ORDER BY source""".stripMargin

  // -- q63: sequence chains from root nodes to sinks, grouped by
  //         (len, end_id) (insight_discovery.py:647-689)
  private def q63(s: SparkSession, dir: String): DataFrame =
    GraphOps.chainCounts(
        KGraph.orientedMaterialized(s, dir, GraphOps.Outgoing),
        maxLen = 20, preOriented = true,
        seedFilter = Some(
          substring_index(col("node_id"), ":", -1).cast("long") % 20 === 0))
      .orderBy(col("len"), col("end_id"))

  private val q63Sql =
    s"""WITH RECURSIVE ${KGraph.edgesSql},
       |o AS (SELECT from_id, to_id FROM edges),
       |roots AS (
       |  SELECT DISTINCT from_id AS node_id FROM o
       |  WHERE from_id NOT IN (SELECT to_id FROM o)
       |    AND CAST(string_split(from_id, ':')[2] AS BIGINT) % 20 = 0),
       |walk(start_id, cur, len) AS (
       |  SELECT node_id, node_id, 0 FROM roots
       |  UNION ALL
       |  SELECT w.start_id, o.to_id, w.len + 1 FROM walk w
       |  JOIN o ON o.from_id = w.cur WHERE w.len < 20)
       |SELECT CAST(len AS INT) AS len, cur AS end_id, count(*) AS n_chains
       |FROM walk WHERE cur NOT IN (SELECT from_id FROM o)
       |GROUP BY 1, 2 ORDER BY len, end_id""".stripMargin

  // -- q64: content scan — LIKE filter + deterministic cap
  //         (sqlite_storage.py:619-660)
  private def q64(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("text").contains("data"))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).limit(20)

  private val q64Sql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE contains(text, 'data') ORDER BY doc_id LIMIT 20""".stripMargin

  // -- q65: structural anomaly — per-type degree z-score > 3
  //         (insight_discovery.py:1427-1986 structural detector)
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val e = KGraph.materialized(s, dir)
    val deg = e.select(col("from_id").as("node_id"))
      .unionByName(e.select(col("to_id").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("deg"))
      .withColumn("typ", substring_index(col("node_id"), ":", 1))
    val stats = deg.groupBy(col("typ"))
      .agg(avg(col("deg")).as("mu"), stddev(col("deg")).as("sigma"))
    deg.join(stats, "typ")
      .filter(col("sigma") > 0 &&
        col("deg") > col("mu") + lit(3) * col("sigma"))
      .withColumn("z", (col("deg") - col("mu")) / col("sigma"))
      .select(col("typ"), col("node_id"), col("deg"), round(col("z"), 6).as("z"),
        round(least(col("z") / 5, lit(1.0)), 6).as("severity"))
      .orderBy(col("typ"), col("node_id"))
  }

  private val q65Sql =
    s"""WITH ${KGraph.edgesSql},
       |deg AS (
       |  SELECT node_id, count(*) AS deg, string_split(node_id, ':')[1] AS typ
       |  FROM (SELECT from_id AS node_id FROM edges
       |        UNION ALL SELECT to_id FROM edges)
       |  GROUP BY node_id),
       |stats AS (SELECT typ, avg(deg) AS mu, stddev(deg) AS sigma
       |          FROM deg GROUP BY typ)
       |SELECT d.typ, d.node_id, d.deg,
       |  round((d.deg - mu) / sigma, 6) AS z,
       |  round(least((d.deg - mu) / sigma / 5, 1.0), 6) AS severity
       |FROM deg d JOIN stats s ON d.typ = s.typ
       |WHERE sigma > 0 AND d.deg > mu + 3 * sigma
       |ORDER BY d.typ, d.node_id""".stripMargin

  // -- q66: consensus levels per source over the lang distribution
  //         (synthesis/perspective_analysis.py consensus buckets:
  //          >0.8 strong, >0.6 moderate, >0.4 weak, else none)
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("lang"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .filter(col("rn") === 1)
      .withColumn("consensus", round(col("cnt") / col("total"), 6))
      .select(col("source"), col("lang").as("dominant_lang"),
        col("total").as("n_docs"), col("consensus"),
        when(col("consensus") > 0.8, "strong")
          .when(col("consensus") > 0.6, "moderate")
          .when(col("consensus") > 0.4, "weak")
          .otherwise("none").as("level"))
      .orderBy(col("source"))
  }

  private val q66Sql =
    """WITH c AS (
      |  SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rn,
      |    sum(cnt) OVER (PARTITION BY source) AS total
      |  FROM c)
      |SELECT source, lang AS dominant_lang, CAST(total AS BIGINT) AS n_docs,
      |  round(cnt * 1.0 / total, 6) AS consensus,
      |  CASE WHEN cnt * 1.0 / total > 0.8 THEN 'strong'
      |       WHEN cnt * 1.0 / total > 0.6 THEN 'moderate'
      |       WHEN cnt * 1.0 / total > 0.4 THEN 'weak'
      |       ELSE 'none' END AS level
      |FROM r WHERE rn = 1 ORDER BY source""".stripMargin

  // -- q140: join-key skew diagnosis — the report an engineer reads
  //          BEFORE picking a partition/salting strategy: for each
  //          candidate partition key, the key-frequency distribution
  //          (cardinality, max, exact median via PerfMonitor's
  //          statistics.median order arithmetic, max/median skew
  //          ratio, heaviest key). Bounded-group contract: the sorted
  //          frequency array is bounded by the KEY CARDINALITY, so
  //          this form is for candidate PARTITION keys (enum-like
  //          columns); for high-cardinality keys the array-free
  //          ranked form (PerfMonitor.queryStatsRanked precedent) is
  //          the scale path. The per-key frequency pass itself is one
  //          partial-aggregate shuffle per table — linear at any SF.
  private def skewLeg(df: DataFrame, keyCol: String, label: String): DataFrame = {
    import graft.monitoring.PerfMonitor
    val med = PerfMonitor.medianOfSorted(col("l"))
    df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_freq"),
        sort_array(collect_list(col("c").cast("double"))).as("l"),
        element_at(sort_array(collect_list(struct(col("c"), col("k"))),
          asc = false), 1).getField("k").as("top_key"))
      .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
        col("max_freq"),
        round(med, 6).as("median_freq"),
        round(col("max_freq") / med, 6).as("skew_ratio"),
        col("top_key"))
  }

  private def q140(s: SparkSession, dir: String): DataFrame =
    Seq((docs(s, dir), "source", "documents.source"),
        (docs(s, dir), "lang", "documents.lang"),
        (events(s, dir), "event_type", "events.event_type"),
        (Tables.load(s, dir, "lineitem"), "l_returnflag", "lineitem.l_returnflag"),
        (Tables.load(s, dir, "orders"), "o_orderstatus", "orders.o_orderstatus"))
      .map { case (df, k, label) => skewLeg(df, k, label) }
      .reduce(_ unionByName _)
      .orderBy(col("key_col"))

  private def skewLegSql(table: String, key: String): String =
    s"""SELECT key_col, n_keys, n_rows, max_freq,
       |  round(med, 6) AS median_freq,
       |  round(max_freq * 1.0 / med, 6) AS skew_ratio,
       |  top_key
       |FROM (
       |  SELECT *, CASE WHEN n_keys % 2 = 1
       |      THEN l[CAST((n_keys + 1) // 2 AS INT)]
       |      ELSE (l[CAST(n_keys // 2 AS INT)]
       |            + l[CAST(n_keys // 2 + 1 AS INT)]) / 2 END AS med
       |  FROM (
       |    SELECT '$table.$key' AS key_col, count(*) AS n_keys,
       |      CAST(sum(c) AS BIGINT) AS n_rows, max(c) AS max_freq,
       |      list(CAST(c AS DOUBLE) ORDER BY c) AS l,
       |      (list(k ORDER BY c DESC, k DESC))[1] AS top_key
       |    FROM (SELECT CAST($key AS VARCHAR) AS k, count(*) AS c
       |          FROM $table GROUP BY 1)))""".stripMargin

  private val q140Sql =
    Seq("documents" -> "source", "documents" -> "lang",
        "events" -> "event_type", "lineitem" -> "l_returnflag",
        "orders" -> "o_orderstatus")
      .map { case (t, k) => skewLegSql(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")

  // -- q199: per-source token-mass Gini — how unequally a source's
  //          token budget is spread over its documents (a skewed source
  //          means a few giant docs dominate its mixture weight; the
  //          within-source companion to q140's join-key skew and
  //          q168's cross-source allocation). Exact rank formula
  //          G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x) over ascending
  //          (x, doc_id) ranks — ties carry equal x so the rank
  //          tiebreak cannot change the sum; every accumulation is a
  //          bigint, the single division happens once per source.
  //          Scale shape: one scan-local token count, one per-source
  //          rank window, one keyed aggregate — the window partitions
  //          by source, so no global sort.
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        TF.tokenCount(col("text")).cast("long").as("n_toks"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_toks"), col("doc_id"))
    d.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("i") * col("n_toks")).as("ix"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round((lit(2.0) * col("ix") - (col("n_docs") + 1) * col("n_tokens"))
          / (col("n_docs") * col("n_tokens")), 6).as("gini"))
      .orderBy(col("source"))
  }

  private val q199Sql =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_toks
       |  FROM documents),
       |r AS (
       |  SELECT source, n_toks,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY n_toks, doc_id) AS BIGINT) AS i
       |  FROM d),
       |agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(i * n_toks) AS BIGINT) AS ix
       |  FROM r GROUP BY source)
       |SELECT source, n_docs, n_tokens,
       |  round((2.0 * CAST(ix AS DOUBLE) - (n_docs + 1) * n_tokens)
       |    / (n_docs * n_tokens), 6) AS gini
       |FROM agg ORDER BY source""".stripMargin

  // -- q209: Spearman rank correlation between document metrics — do
  //          the cheap signals (length, token count) agree with the
  //          quality score? ρ = 1 − 6·Σd²/(n(n²−1)) over
  //          deterministically tie-broken ranks (metric asc, doc_id) —
  //          every accumulation is a bigint, ONE double division per
  //          pair at the end. (With the doc_id tie-break this is the
  //          classic d²-formula on total-order ranks, not the
  //          tie-corrected variant — the deterministic choice both
  //          engines replay; noted, not hidden.) Long-range contract:
  //          Σd² ≤ n³ must fit a long → n ≤ ~2M; past that, compute on
  //          a deterministic sample (q111 machinery). The rank windows
  //          are global sorts by design — this is a corpus AUDIT; at
  //          100 TB swap ranks for approx-quantile bins.
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        round(TF.qualityScore(col("text"), col("n_chars")) * 1000)
          .cast("long").as("quality_milli"),
        TF.tokenCount(col("text")).cast("long").as("n_toks"),
        col("n_chars"))
    def ranked(metric: String) =
      d.withColumn(s"r_$metric", row_number().over(
        Window.orderBy(col(metric), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col(s"r_$metric"))
    val r = d.select(col("doc_id"))
      .join(ranked("quality_milli"), "doc_id")
      .join(ranked("n_toks"), "doc_id")
      .join(ranked("n_chars"), "doc_id")
    val pairs = Seq(
      ("quality_milli", "n_toks"),
      ("quality_milli", "n_chars"),
      ("n_toks", "n_chars"))
    pairs.map { case (a, b) =>
      r.agg(count(lit(1)).as("n"),
          sum((col(s"r_$a") - col(s"r_$b")) * (col(s"r_$a") - col(s"r_$b")))
            .as("sd2"))
        .select(lit(a).as("metric_a"), lit(b).as("metric_b"), col("n"),
          round(lit(1.0) - lit(6.0) * col("sd2") /
            (col("n") * (col("n") * col("n") - 1)), 6).as("rho"))
    }.reduce(_ unionByName _).orderBy(col("metric_a"), col("metric_b"))
  }

  private val q209Sql = {
    val legs = Seq(
      ("quality_milli", "n_toks"),
      ("quality_milli", "n_chars"),
      ("n_toks", "n_chars")).map { case (a, b) =>
      s"""SELECT '$a' AS metric_a, '$b' AS metric_b,
         |  count(*) AS n,
         |  round(1.0 - 6.0 * CAST(sum((r_$a - r_$b) * (r_$a - r_$b))
         |      AS DOUBLE)
         |    / (count(*) * (count(*) * count(*) - 1)), 6) AS rho
         |FROM r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(round(${TF.sql.qualityScore("text", "n_chars")} * 1000)
       |      AS BIGINT) AS quality_milli,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_toks,
       |    n_chars
       |  FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY quality_milli, doc_id)
       |      AS BIGINT) AS r_quality_milli,
       |    CAST(row_number() OVER (ORDER BY n_toks, doc_id)
       |      AS BIGINT) AS r_n_toks,
       |    CAST(row_number() OVER (ORDER BY n_chars, doc_id)
       |      AS BIGINT) AS r_n_chars
       |  FROM d)
       |$legs
       |ORDER BY metric_a, metric_b""".stripMargin
  }

  // -- q225: per-source length-distribution KS drift — the two-sample
  //          Kolmogorov–Smirnov distance between each source's doc-
  //          length distribution and the EXACT rest-of-corpus
  //          complement, over a 64-bucket histogram (the structural
  //          odd-one-out view beside q158's lexical JSD and q182's
  //          temporal PSI). EXACT-RATIONAL KS: |F_s(b) − F_r(b)| =
  //          |cdf_s·n_r − cdf_r·n_s| / (n_s·n_r), so the max runs over
  //          INTEGERS and the single division happens once at the end —
  //          no per-bucket double compare can flip cross-engine.
  //          Scale shape: one scan to (source × 64) counts; cdfs are
  //          64-row source-partitioned windows; complement = corpus
  //          totals minus own counts (no self-join). (Contract:
  //          n_s·n_r must fit a long — sample strata past ~3e9 docs.)
  private val KsBucketWidth = 32L
  private val KsBuckets = 64L

  private def q225(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val b = docs(s, dir).select(col("source"),
      least(expr(s"n_chars div $KsBucketWidth"), lit(KsBuckets - 1))
        .as("bucket"))
    val cnt = b.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val tot = b.groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    // complement counts: corpus per-bucket total minus own; the grid is
    // (source x observed buckets) — zero own-count cells materialize
    // via the source list x bucket totals, never a full outer scan
    val srcN = b.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val allN = b.agg(count(lit(1)).as("n_all"))
    val grid = srcN.select(col("source"), col("n_s"))
      .crossJoin(broadcast(tot))
      .join(cnt, Seq("source", "bucket"), "left")
      .select(col("source"), col("n_s"), col("bucket"),
        coalesce(col("c"), lit(0L)).as("c"), col("ct"))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cdf_s", sum(col("c")).over(w))
      .withColumn("cdf_all", sum(col("ct")).over(w))
      .crossJoin(broadcast(allN))
      .withColumn("cdf_r", col("cdf_all") - col("cdf_s"))
      .withColumn("n_r", col("n_all") - col("n_s"))
      .withColumn("num",
        abs(col("cdf_s") * col("n_r") - col("cdf_r") * col("n_s")))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"), max(col("num")).as("max_num"),
        max(col("n_s") * col("n_r")).as("den"))
      .select(col("source"), col("n_docs"),
        ExactRound.ratio6(col("max_num"), col("den")).as("ks"))
      .withColumn("drifted", col("ks") >= 0.1)
      .orderBy(col("source"))
  }

  private val q225Sql =
    s"""WITH b AS (
       |  SELECT source,
       |    least(n_chars // $KsBucketWidth, ${KsBuckets - 1}) AS bucket
       |  FROM documents),
       |cnt AS (
       |  SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM b GROUP BY 1, 2),
       |tot AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM b GROUP BY 1),
       |srcn AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM b GROUP BY 1),
       |alln AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM b),
       |grid AS (
       |  SELECT s.source, s.n_s, t.bucket, COALESCE(c.c, 0) AS c, t.ct
       |  FROM srcn s CROSS JOIN tot t
       |  LEFT JOIN cnt c ON c.source = s.source AND c.bucket = t.bucket),
       |cdf AS (
       |  SELECT source, n_s, bucket,
       |    CAST(sum(c) OVER w AS BIGINT) AS cdf_s,
       |    CAST(sum(ct) OVER w AS BIGINT) AS cdf_all
       |  FROM grid
       |  WINDOW w AS (PARTITION BY source ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ks AS (
       |  SELECT source, max(n_s) AS n_docs,
       |    max(abs(cdf_s * (n_all - n_s) - (cdf_all - cdf_s) * n_s))
       |      AS max_num,
       |    max(n_s * (n_all - n_s)) AS den
       |  FROM cdf, alln GROUP BY source)
       |SELECT source, n_docs,
       |  ${graft.functions.ExactRound.sql.ratio6("max_num", "den")} AS ks,
       |  ${graft.functions.ExactRound.sql.ratio6("max_num", "den")} >= 0.1
       |    AS drifted
       |FROM ks ORDER BY source""".stripMargin

  // -- q230: robust length outliers (median/MAD) — per source, the
  //          doc-length median, the median absolute deviation, and how
  //          many docs exceed the modified-z cutoff |x − med| >
  //          3·1.4826·MAD (Iglewicz–Hoaglin). q41's IQR bounds break
  //          when a source is >25% contaminated; MAD holds to 50% —
  //          the robust sibling for corpus-hygiene sweeps. EXACT order
  //          statistics, no percentile_approx: median = mean of the
  //          middle one/two ranks via a source-partitioned row_number
  //          (same rank arithmetic both engines, so even-n .5 medians
  //          are bit-identical); MAD repeats the same rank pass on
  //          |x − med|. Scale shape: two source-partitioned window
  //          passes + keyed rollups — partition-local, no global sort.
  private def q230(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    def median(df: DataFrame, valCol: String, tieCol: String): DataFrame = {
      val w = Window.partitionBy(col("source"))
        .orderBy(col(valCol), col(tieCol))
      df.withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("rn") === expr("(nn + 1) div 2") ||
          col("rn") === expr("(nn + 2) div 2"))
        .groupBy(col("source"))
        .agg((sum(col(valCol)) / count(lit(1))).as("med"),
          max(col("nn")).as("n_docs"))
    }
    val d = docs(s, dir).select(col("source"), col("doc_id"),
      col("n_chars").cast("double").as("len"))
    val med = median(d, "len", "doc_id")
    val dev = d.join(med, Seq("source"))
      .withColumn("dev", abs(col("len") - col("med")))
    val mad = median(dev.select(col("source"), col("doc_id"),
      col("dev").as("len")), "len", "doc_id")
      .select(col("source"), col("med").as("mad"))
    dev.join(mad, Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"), max(col("med")).as("median_len"),
        max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("source"), col("n_docs"), col("median_len"), col("mad"),
        col("n_outliers"),
        ExactRound.ratio6(col("n_outliers"), col("n_docs"))
          .as("outlier_rate"))
      .orderBy(col("source"))
  }

  private val q230Sql =
    s"""WITH d AS (
       |  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS len
       |  FROM documents),
       |r1 AS (
       |  SELECT source, doc_id, len,
       |    row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
       |      AS rn,
       |    count(*) OVER (PARTITION BY source) AS nn
       |  FROM d),
       |med AS (
       |  SELECT source, sum(len) / count(*) AS med,
       |    CAST(max(nn) AS BIGINT) AS n_docs
       |  FROM r1
       |  WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
       |  GROUP BY source),
       |dev AS (
       |  SELECT d.source, d.doc_id, abs(d.len - m.med) AS dev,
       |    m.med, m.n_docs
       |  FROM d JOIN med m USING (source)),
       |r2 AS (
       |  SELECT source, dev,
       |    row_number() OVER (PARTITION BY source ORDER BY dev, doc_id)
       |      AS rn,
       |    count(*) OVER (PARTITION BY source) AS nn
       |  FROM dev),
       |mad AS (
       |  SELECT source, sum(dev) / count(*) AS mad
       |  FROM r2
       |  WHERE rn = (nn + 1) // 2 OR rn = (nn + 2) // 2
       |  GROUP BY source)
       |SELECT v.source, CAST(max(v.n_docs) AS BIGINT) AS n_docs,
       |  max(v.med) AS median_len, max(a.mad) AS mad,
       |  CAST(sum(CASE WHEN v.dev > 4.4478 * a.mad THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers,
       |  ${graft.functions.ExactRound.sql.ratio6(
      "sum(CASE WHEN v.dev > 4.4478 * a.mad THEN 1 ELSE 0 END)",
      "max(v.n_docs)")} AS outlier_rate
       |FROM dev v JOIN mad a USING (source)
       |GROUP BY v.source
       |ORDER BY source""".stripMargin

  // -- q234: schema profile — the Deequ-style column profiler a
  //          pipeline runs before trusting a new drop: per (table,
  //          column) row count, distinct count, null count. One agg
  //          pass per table computes every column's statistics in a
  //          single scan (13 tiny aggregate slots), then explodes to
  //          the long form — never 13 separate scans. Exact integers
  //          throughout. At 100 TB the countDistinct slots swap for
  //          approx_count_distinct (documented dial; the oracle pins
  //          the exact form).
  private val ProfileCols: Seq[(String, Seq[String])] = Seq(
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "embeddings" -> Seq("vec_id", "label"))

  private def q234(s: SparkSession, dir: String): DataFrame = {
    def profile(table: String, cols: Seq[String]): DataFrame = {
      val t = Tables.load(s, dir, table)
      val aggs = cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"d_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"z_$c")))
      t.agg(count(lit(1)).as("rows"), aggs: _*)
        .select(explode(array(cols.map(c => struct(
          lit(table).as("tbl"), lit(c).as("col_name"),
          col("rows").as("n_rows"), col(s"d_$c").as("n_distinct"),
          col(s"z_$c").as("n_null"))): _*)).as("r"))
        .select(col("r.tbl").as("tbl"), col("r.col_name").as("col_name"),
          col("r.n_rows").as("n_rows"),
          col("r.n_distinct").as("n_distinct"),
          col("r.n_null").as("n_null"))
    }
    ProfileCols.map { case (t, cs) => profile(t, cs) }
      .reduce(_ unionByName _)
      .orderBy(col("tbl"), col("col_name"))
  }

  private val q234Sql = {
    val legs = ProfileCols.flatMap { case (t, cs) =>
      cs.map(c =>
        s"""SELECT '$t' AS tbl, '$c' AS col_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null
           |FROM $t""".stripMargin)
    }.mkString("\nUNION ALL\n")
    s"$legs\nORDER BY tbl, col_name"
  }

  // -- q235: expectation suite — declarative data-contract checks
  //          (Deequ/Great-Expectations shape) evaluated in one agg
  //          pass per table: key uniqueness, derived-column
  //          consistency (n_chars = length(text)), domain bounds, and
  //          dimensionality. Output one row per check with the
  //          violation count and a pass flag — the gate a pipeline
  //          wires before q116/q174 builds. Exact integers; each
  //          table contributes one scan.
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids"),
      sum(when(col("n_chars") <= 0, 1L).otherwise(0L)).as("bad_len"),
      sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("len_mismatch"),
      sum(when(col("lang").isNull || length(col("lang")) < 2, 1L)
        .otherwise(0L)).as("bad_lang"))
    val ev = events(s, dir).agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("dup_ids"),
      sum(when(col("ts") < lit("2024-01-01").cast("timestamp") ||
        col("ts") >= lit("2025-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("ts_out"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_value"))
    val em = Tables.load(s, dir, "embeddings").agg(
      count(lit(1)).as("n"),
      sum(when(size(col("embedding")) =!= 64, 1L).otherwise(0L))
        .as("bad_dim"))
    def row(frame: DataFrame, check: String, nCol: String, vCol: String) =
      frame.select(lit(check).as("check"), col(nCol).as("n_checked"),
        col(vCol).as("n_violations"),
        (col(vCol) === 0L).as("pass"))
    Seq(
      row(d, "documents.doc_id unique", "n", "dup_ids"),
      row(d, "documents.n_chars positive", "n", "bad_len"),
      row(d, "documents.n_chars = length(text)", "n", "len_mismatch"),
      row(d, "documents.lang well-formed", "n", "bad_lang"),
      row(ev, "events.event_id unique", "n", "dup_ids"),
      row(ev, "events.ts within 2024", "n", "ts_out"),
      row(ev, "events.value nonnegative", "n", "neg_value"),
      row(em, "embeddings.dim = 64", "n", "bad_dim"))
      .reduce(_ unionByName _)
      .orderBy(col("check"))
  }

  private val q235Sql =
    """WITH d AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_ids,
      |    CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS bad_len,
      |    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS len_mismatch,
      |    CAST(sum(CASE WHEN lang IS NULL OR length(lang) < 2
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang
      |  FROM documents),
      |ev AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_ids,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
      |      OR ts >= TIMESTAMP '2025-01-01' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ts_out,
      |    CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS neg_value
      |  FROM events),
      |em AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bad_dim
      |  FROM embeddings)
      |SELECT * FROM (
      |  SELECT 'documents.doc_id unique' AS check, n AS n_checked,
      |    dup_ids AS n_violations, dup_ids = 0 AS pass FROM d
      |  UNION ALL
      |  SELECT 'documents.n_chars positive', n, bad_len, bad_len = 0 FROM d
      |  UNION ALL
      |  SELECT 'documents.n_chars = length(text)', n, len_mismatch,
      |    len_mismatch = 0 FROM d
      |  UNION ALL
      |  SELECT 'documents.lang well-formed', n, bad_lang, bad_lang = 0 FROM d
      |  UNION ALL
      |  SELECT 'events.event_id unique', n, dup_ids, dup_ids = 0 FROM ev
      |  UNION ALL
      |  SELECT 'events.ts within 2024', n, ts_out, ts_out = 0 FROM ev
      |  UNION ALL
      |  SELECT 'events.value nonnegative', n, neg_value, neg_value = 0 FROM ev
      |  UNION ALL
      |  SELECT 'embeddings.dim = 64', n, bad_dim, bad_dim = 0 FROM em)
      |ORDER BY "check"""".stripMargin

  // -- q238: field-association audit — mutual information between the
  //          `source` and `lang` columns of documents (does source
  //          predict language?), with marginal entropies and normalized
  //          MI. The categorical companion to q237's numeric Pearson
  //          matrix and q223's chi²: chi² answers "independent or
  //          not?", MI answers "HOW MANY bits does one field carry
  //          about the other?" — the metadata-leakage screen run before
  //          stratifying or splitting on a field. Determinism: ONE
  //          scan + one (source × lang)-bounded cell aggregate; the
  //          margins are exact long sums OVER THE CELL GRID (not extra
  //          scans), and every double fold is cell-/margin-ordered
  //          (the q158 sorted-fold contract), so both engines add the
  //          same terms in the same order. Scale shape: the only
  //          data-sized step is the first groupBy; everything after is
  //          #sources×#langs-bounded.
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val cells = docs(s, dir).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val sx = cells.groupBy(col("source")).agg(sum(col("c")).as("nx"))
    val sy = cells.groupBy(col("lang")).agg(sum(col("c")).as("ny"))
    val nt = cells.agg(sum(col("c")).as("n"), count(lit(1)).as("n_cells"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    val miTerms = cells.join(broadcast(sx), "source")
      .join(broadcast(sy), "lang").crossJoin(broadcast(nt))
      .select(struct(col("source"), col("lang")).as("k"),
        ((dd(col("c")) / col("n")) *
          log(dd(col("c")) * col("n") / (dd(col("nx")) * col("ny"))))
          .as("t"))
      .agg(sort_array(collect_list(struct(col("k"), col("t")))).as("ts"))
      .select(aggregate(col("ts"), lit(0.0d), (a, x) => a + x("t")).as("mi"))
    def hFold(m: DataFrame, key: String, cnt: String) =
      m.crossJoin(broadcast(nt.select(col("n"))))
        .select(col(key).as("k"),
          (-(dd(col(cnt)) / col("n")) * log(dd(col(cnt)) / col("n"))).as("t"))
        .agg(sort_array(collect_list(struct(col("k"), col("t")))).as("ts"))
        .select(aggregate(col("ts"), lit(0.0d), (a, x) => a + x("t")).as("h"))
    val hx = hFold(sx, "source", "nx")
    val hy = hFold(sy, "lang", "ny")
    nt.crossJoin(broadcast(miTerms)).crossJoin(broadcast(hx.select(col("h").as("hx"))))
      .crossJoin(broadcast(hy.select(col("h").as("hy"))))
      .select(col("n").as("n_rows"), col("n_cells"),
        round(col("mi"), 6).as("mi"),
        round(col("hx"), 6).as("h_source"),
        round(col("hy"), 6).as("h_lang"),
        round(col("mi") / sqrt(col("hx") * col("hy")), 6).as("nmi"))
  }

  private val q238Sql =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
      |sx AS (SELECT source, sum(c) AS nx FROM cells GROUP BY 1),
      |sy AS (SELECT lang, sum(c) AS ny FROM cells GROUP BY 1),
      |nt AS (SELECT sum(c) AS n, CAST(count(*) AS BIGINT) AS n_cells
      |       FROM cells),
      |mi AS (
      |  SELECT sum((CAST(c AS DOUBLE) / n) *
      |    ln(CAST(c AS DOUBLE) * n / (CAST(nx AS DOUBLE) * ny))
      |    ORDER BY source, lang) AS mi
      |  FROM cells JOIN sx USING (source) JOIN sy USING (lang)
      |  CROSS JOIN nt),
      |hx AS (SELECT sum(-(CAST(nx AS DOUBLE) / n) *
      |         ln(CAST(nx AS DOUBLE) / n) ORDER BY source) AS hx
      |       FROM sx CROSS JOIN nt),
      |hy AS (SELECT sum(-(CAST(ny AS DOUBLE) / n) *
      |         ln(CAST(ny AS DOUBLE) / n) ORDER BY lang) AS hy
      |       FROM sy CROSS JOIN nt)
      |SELECT CAST(n AS BIGINT) AS n_rows, n_cells,
      |  round(mi, 6) AS mi, round(hx, 6) AS h_source,
      |  round(hy, 6) AS h_lang,
      |  round(mi / sqrt(hx * hy), 6) AS nmi
      |FROM nt CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  // -- q247: partition-sizing advisor — the config numbers a 100 TB job
  //          actually needs before it runs: per data-sized table, the
  //          exact in-memory row width under a declared byte model
  //          (fixed 8/4 for long/ts/double/int, payload length for
  //          strings, 4·len for float vectors), total bytes, and the
  //          partition counts that hit the two standard targets —
  //          128 MiB scan splits (spark.sql.files.maxPartitionBytes)
  //          and 64 MiB shuffle partitions (the
  //          spark.sql.shuffle.partitions sizing rule). Everything is
  //          an exact integer sum + ceiling divisions; the width MODEL
  //          is declared, not sampled, so the oracle pins it. One agg
  //          scan per table.
  private val AdvisorWidths: Seq[(String, String)] = Seq(
    "documents" ->
      "8 + length(text) + length(lang) + length(source) + 8",
    "events" ->
      "8 + 8 + 8 + length(event_type) + 8 + length(props)",
    "embeddings" -> "8 + 4 * size(embedding) + 4",
    "lineitem" ->
      ("8 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + length(l_returnflag) + " +
        "length(l_linestatus) + 8"))
  private val ScanTarget = 128L * 1024 * 1024
  private val ShuffleTarget = 64L * 1024 * 1024

  private def q247(s: SparkSession, dir: String): DataFrame = {
    def leg(table: String, widthExpr: String): DataFrame =
      Tables.load(s, dir, table)
        .select(expr(widthExpr).cast("long").as("w"))
        .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("total_bytes"))
        .select(lit(table).as("tbl"), col("n_rows"), col("total_bytes"),
          ExactRound.ratio6(col("total_bytes"), col("n_rows"))
            .as("avg_row_bytes"),
          expr(s"(total_bytes + ${ScanTarget - 1}) div $ScanTarget")
            .as("scan_partitions"),
          expr(s"(total_bytes + ${ShuffleTarget - 1}) div $ShuffleTarget")
            .as("shuffle_partitions"))
    AdvisorWidths.map { case (t, w) => leg(t, w) }
      .reduce(_ unionByName _)
      .orderBy(col("tbl"))
  }

  private val q247Sql = {
    val legs = AdvisorWidths.map { case (t, w) =>
      val dw = w.replace("size(embedding)", "len(embedding)")
      s"""SELECT '$t' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum($dw) AS BIGINT) AS total_bytes,
         |  ${ExactRound.sql.ratio6(s"sum($dw)", "count(*)")}
         |    AS avg_row_bytes,
         |  CAST((sum($dw) + $ScanTarget - 1) // $ScanTarget AS BIGINT)
         |    AS scan_partitions,
         |  CAST((sum($dw) + $ShuffleTarget - 1) // $ShuffleTarget AS BIGINT)
         |    AS shuffle_partitions
         |FROM $t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$legs)
       |ORDER BY tbl""".stripMargin
  }

  // -- q263: join-cardinality estimator audit — the System-R /
  //          Selinger formula every cost-based optimizer runs on
  //          (|A|·|B| / max(ndv_A, ndv_B), Selinger et al. 1979)
  //          evaluated against the TRUE join sizes of the three
  //          canonical KG joins, with the FK-side NDV and the
  //          containment assumption made visible. The audit a stats
  //          pipeline runs to decide whether ANALYZE-collected NDVs
  //          are good enough for plan choice. Exactness: counts and
  //          NDVs are exact longs; the estimate is one integral
  //          divide; err_ratio is a micro6 rational. The n_l·n_r
  //          product stays under 2^63 through sf10 on these tables
  //          (document the ratio form past that). Scale shape: per
  //          join, two single-table aggregates + the actual join
  //          count (hash equi-joins) — no new shapes.
  private def q263(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    def audit(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame = {
      val ls = left.agg(count(lit(1)).as("n_l"),
        countDistinct(col(lk)).as("d_l"))
      val rs = right.agg(count(lit(1)).as("n_r"),
        countDistinct(col(rk)).as("d_r"))
      val actual = left.select(col(lk).as("k"))
        .join(right.select(col(rk).as("k")), Seq("k"))
        .agg(count(lit(1)).as("actual"))
      ls.crossJoin(rs).crossJoin(actual)
        .select(lit(name).as("join_name"), col("n_l"), col("n_r"),
          col("d_l"), col("d_r"),
          expr("(n_l * n_r) div greatest(d_l, d_r)").as("estimated"),
          col("actual"),
          ExactRound.ratio6(expr("(n_l * n_r) div greatest(d_l, d_r)"),
            col("actual")).as("est_over_actual"))
    }
    val orders = Tables.load(s, dir, "orders")
    val customer = Tables.load(s, dir, "customer")
    val lineitem = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
    audit("orders_customer", orders, "o_custkey", customer, "c_custkey")
      .unionByName(audit("lineitem_orders", lineitem, "l_orderkey",
        orders, "o_orderkey"))
      .unionByName(audit("lineitem_part", lineitem, "l_partkey",
        part, "p_partkey"))
      .orderBy(col("join_name"))
  }

  private lazy val q263Sql = {
    import graft.functions.{ExactRound => ER}
    def leg(name: String, lt: String, lk: String, rt: String, rk: String) =
      s"""SELECT '$name' AS join_name, n_l, n_r, d_l, d_r,
         |  (n_l * n_r) // greatest(d_l, d_r) AS estimated, actual,
         |  ${ER.sql.ratio6("(n_l * n_r) // greatest(d_l, d_r)", "actual")}
         |    AS est_over_actual
         |FROM
         |  (SELECT CAST(count(*) AS BIGINT) AS n_l,
         |     CAST(count(DISTINCT $lk) AS BIGINT) AS d_l FROM $lt),
         |  (SELECT CAST(count(*) AS BIGINT) AS n_r,
         |     CAST(count(DISTINCT $rk) AS BIGINT) AS d_r FROM $rt),
         |  (SELECT CAST(count(*) AS BIGINT) AS actual
         |   FROM $lt l JOIN $rt r ON l.$lk = r.$rk)""".stripMargin
    s"""SELECT * FROM (
       |${leg("orders_customer", "orders", "o_custkey", "customer", "c_custkey")}
       |UNION ALL
       |${leg("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
       |UNION ALL
       |${leg("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey")})
       |ORDER BY join_name""".stripMargin
  }

  // -- q266: Benford first-digit audit (Benford 1938; the Nigrini
  //          fraud/data-quality screen) over order totals: observed
  //          first-significant-digit shares vs the Benford expectation
  //          P(d) = log10(1 + 1/d), with the chi-square contribution
  //          per digit. Exactness: first digits are string surgery on
  //          the integer cent representation (no float log to GET the
  //          digit); the nine Benford probabilities are micro-unit
  //          integer CONSTANTS precomputed in Scala and embedded in
  //          both texts; chi² terms are exact rationals of counts and
  //          MILLI-unit constants (the squared difference n_d·10³ −
  //          n·p‰ stays under 2^63 through ~3·10⁹ rows — unit-rescale
  //          the difference past that). Scale shape: one scan, one
  //          9-row aggregate.
  private val BenfordMicro: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000.0))
  private val BenfordMilli: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.round(math.log10(1.0 + 1.0 / d) * 1000.0))

  private def q266(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(substring(
        abs(round(col("o_totalprice") * 100, 0)).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
      .filter(col("digit") >= 1)
    val counts = o.groupBy(col("digit")).agg(count(lit(1)).as("n_d"))
    val tot = counts.agg(sum(col("n_d")).as("n"))
    val bmap = typedLit(BenfordMicro.toMap)
    val bmilli = typedLit(BenfordMilli.toMap)
    counts.crossJoin(broadcast(tot))
      .withColumn("exp_micro", element_at(bmap, col("digit")))
      .withColumn("pm", element_at(bmilli, col("digit")))
      .select(col("digit"), col("n_d"),
        ExactRound.ratio6(col("n_d"), col("n")).as("obs_share"),
        (col("exp_micro") / lit(1e6)).as("benford_share"),
        // chi2 term = (n_d - n*p)^2/(n*p) with p in milli units:
        // (n_d*1000 - n*pm)^2 / (1000 * n * pm), all exact longs
        ExactRound.ratio6(
          (col("n_d") * 1000L - col("n") * col("pm")) *
            (col("n_d") * 1000L - col("n") * col("pm")),
          col("n") * col("pm") * 1000L).as("chi2_term"))
      .orderBy(col("digit"))
  }

  private lazy val q266Sql = {
    import graft.functions.{ExactRound => ER}
    val vals = BenfordMicro.zip(BenfordMilli).map {
      case ((d, m), (_, ml)) => s"($d, $m::BIGINT, $ml::BIGINT)" }
      .mkString(", ")
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(CAST(abs(round(o_totalprice * 100))
       |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
       |  FROM orders),
       |counts AS (
       |  SELECT digit, CAST(count(*) AS BIGINT) AS n_d
       |  FROM digits WHERE digit >= 1 GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_d) AS BIGINT) AS n FROM counts),
       |b(digit, exp_micro, pm) AS (VALUES $vals)
       |SELECT c.digit, c.n_d,
       |  ${ER.sql.ratio6("c.n_d", "t.n")} AS obs_share,
       |  b.exp_micro / 1e6 AS benford_share,
       |  ${ER.sql.ratio6(
      "(c.n_d * 1000 - t.n * b.pm) * (c.n_d * 1000 - t.n * b.pm)",
      "t.n * b.pm * 1000")} AS chi2_term
       |FROM counts c
       |JOIN b ON b.digit = c.digit
       |CROSS JOIN tot t
       |ORDER BY c.digit""".stripMargin
  }

  // -- q297: Kendall tau-b between doc length and composite quality,
  //          GRID-EXACT (Kendall 1945 tie-corrected form): both
  //          variables bucketize (length /100 capped 19, quality
  //          decile), and over grouped data tau-b is exactly
  //          computable from the 2-D cell census — concordant /
  //          discordant pair counts are Σ n_ab·n_cd over ordered cell
  //          pairs, tie terms come off the marginals. The rank
  //          correlation that complements q209's Spearman (which
  //          needs a global rank); here the census is ≤ 200 cells, so
  //          the pair fold is a bounded self-cross, never a data-sized
  //          rank. Determinism: all counts exact integers; tau-b is a
  //          single-row double formula, round6.
  private def q297(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val cells = d.select(
        expr("least(n_chars div 100, 19)").as("bx"),
        least(floor(TF.qualityScore(col("text"), col("n_chars")) * 10)
          .cast("long"), lit(9L)).as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("n"))
      .truncateLineage()
    val pairs = cells.select(col("bx").as("ax"), col("by").as("ay"),
        col("n").as("an"))
      .crossJoin(broadcast(cells.select(col("bx").as("cx"),
        col("by").as("cy"), col("n").as("cn"))))
      .filter(col("cx") > col("ax"))
      .agg(
        sum(when(col("cy") > col("ay"), col("an") * col("cn"))
          .otherwise(0L)).as("conc"),
        sum(when(col("cy") < col("ay"), col("an") * col("cn"))
          .otherwise(0L)).as("disc"))
    val tx = cells.groupBy(col("bx")).agg(sum(col("n")).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1"),
        sum(col("t")).as("nn"))
    val ty = cells.groupBy(col("by")).agg(sum(col("n")).as("t"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("nn").as("n_docs"),
        coalesce(col("conc"), lit(0L)).as("concordant"),
        coalesce(col("disc"), lit(0L)).as("discordant"),
        expr("round((coalesce(conc, 0) - coalesce(disc, 0)) / " +
          "nullif(sqrt((CAST(nn AS DOUBLE) * (nn - 1) / 2 - n1) * " +
          "(CAST(nn AS DOUBLE) * (nn - 1) / 2 - n2)), 0), 6)")
          .as("tau_b"))
  }

  private val q297Sql = {
    val by = s"least(CAST(floor(${TF.sql.qualityScore("text", "n_chars")}" +
      " * 10) AS BIGINT), 9)"
    s"""WITH cells AS (
       |  SELECT least(n_chars // 100, 19) AS bx, $by AS by,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |pairs AS (
       |  SELECT
       |    CAST(sum(CASE WHEN c.by > a.by THEN a.n * c.n ELSE 0 END)
       |      AS BIGINT) AS conc,
       |    CAST(sum(CASE WHEN c.by < a.by THEN a.n * c.n ELSE 0 END)
       |      AS BIGINT) AS disc
       |  FROM cells a CROSS JOIN cells c WHERE c.bx > a.bx),
       |tx AS (
       |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1,
       |    CAST(sum(t) AS BIGINT) AS nn
       |  FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY bx)),
       |ty AS (
       |  SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2
       |  FROM (SELECT CAST(sum(n) AS BIGINT) AS t FROM cells GROUP BY by))
       |SELECT nn AS n_docs,
       |  coalesce(conc, 0) AS concordant, coalesce(disc, 0) AS discordant,
       |  round((coalesce(conc, 0) - coalesce(disc, 0)) /
       |    nullif(sqrt((CAST(nn AS DOUBLE) * (nn - 1) / 2 - n1) *
       |    (CAST(nn AS DOUBLE) * (nn - 1) / 2 - n2)), 0), 6) AS tau_b
       |FROM pairs, tx, ty""".stripMargin
  }

  // -- q295: chi-square test of independence (source × lang) with
  //          Cramér's V — IS a doc's language independent of its
  //          source? The categorical complement to q238's field MI:
  //          chi2 carries the classical test statistic + dof, V the
  //          [0,1] effect size a mixing report prints. The full grid
  //          (observed AND zero cells — a missing cell still
  //          contributes its expectation) is the #sources × #langs
  //          cross of two tiny marginal frames. Determinism: each
  //          cell's term (n·N − r·c)²/(N·r·c) is a pointwise double
  //          over exact integer marginals, floored to micro units
  //          before the grid sum (the mean-of-rounded contract);
  //          chi2/V are single-row formulas, round6.
  private def q295(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val joint = d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val rws = joint.groupBy(col("source")).agg(sum(col("n")).as("r"))
    val cls = joint.groupBy(col("lang")).agg(sum(col("n")).as("c"))
    val tot = joint.agg(sum(col("n")).as("nn"),
      countDistinct(col("source")).as("nr"),
      countDistinct(col("lang")).as("nc"))
    rws.crossJoin(broadcast(cls))
      .join(joint, Seq("source", "lang"), "left")
      .crossJoin(broadcast(tot))
      .select(expr("CAST(floor(pow(coalesce(n, 0) * nn - r * c, 2) / " +
        "(CAST(nn AS DOUBLE) * r * c) * 1000000) AS BIGINT)").as("tm"),
        col("nn"), col("nr"), col("nc"))
      .groupBy().agg(sum(col("tm")).as("chi2_micro"),
        max(col("nn")).as("nn"), max(col("nr")).as("nr"),
        max(col("nc")).as("nc"))
      .select(col("nn").as("n_docs"), col("nr").as("n_sources"),
        col("nc").as("n_langs"),
        ((col("nr") - 1L) * (col("nc") - 1L)).as("dof"),
        expr("round(chi2_micro / 1e6, 6)").as("chi2"),
        expr("round(sqrt((chi2_micro / 1e6) / " +
          "(CAST(nn AS DOUBLE) * least(nr - 1, nc - 1))), 6)")
          .as("cramers_v"))
  }

  private val q295Sql =
    """WITH joint AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |rws AS (SELECT source, CAST(sum(n) AS BIGINT) AS r
      |  FROM joint GROUP BY 1),
      |cls AS (SELECT lang, CAST(sum(n) AS BIGINT) AS c
      |  FROM joint GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
      |    CAST(count(DISTINCT source) AS BIGINT) AS nr,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS nc
      |  FROM joint),
      |grid AS (
      |  SELECT CAST(floor(pow(coalesce(j.n, 0) * t.nn - rw.r * cl.c, 2) /
      |      (CAST(t.nn AS DOUBLE) * rw.r * cl.c) * 1000000) AS BIGINT)
      |      AS tm,
      |    t.nn, t.nr, t.nc
      |  FROM rws rw CROSS JOIN cls cl
      |  LEFT JOIN joint j ON j.source = rw.source AND j.lang = cl.lang
      |  CROSS JOIN tot t),
      |agg AS (
      |  SELECT CAST(sum(tm) AS BIGINT) AS chi2_micro,
      |    CAST(max(nn) AS BIGINT) AS nn, CAST(max(nr) AS BIGINT) AS nr,
      |    CAST(max(nc) AS BIGINT) AS nc
      |  FROM grid)
      |SELECT nn AS n_docs, nr AS n_sources, nc AS n_langs,
      |  CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
      |  round(chi2_micro / 1e6, 6) AS chi2,
      |  round(sqrt((chi2_micro / 1e6) /
      |    (CAST(nn AS DOUBLE) * least(nr - 1, nc - 1))), 6) AS cramers_v
      |FROM agg""".stripMargin

  // -- q337: ECOD outlier scores (Li et al. TKDE 2022 "ECOD:
  //          Unsupervised Outlier Detection Using Empirical Cumulative
  //          Distribution Functions") over three integer text
  //          features (chars, tokens, 'en'-stopword count) — the
  //          parameter-free ensemble complement to q41's IQR and
  //          q230's MAD screens: a doc is anomalous if it sits in the
  //          joint tail of ALL dimensions, O(x) = max(−Σ_d ln F_d(x),
  //          −Σ_d ln F̄_d(x)) with per-dim empirical CDFs. The two-
  //          sided max variant (the paper's automatic skew blend is
  //          documented as the refinement). Determinism: each (dim,
  //          value) census cell carries a micro-FLOORED ln of an
  //          exact integer ratio (rank/n), summed as integers per
  //          doc; top-20 cut ties on doc_id. Scale shape: three
  //          value-domain censuses with cumulative windows (per-dim
  //          grids, never |docs|), three value-keyed joins back, one
  //          TakeOrderedAndProject.
  private val EcodTop = 20

  private def q337(s: SparkSession, dir: String): DataFrame = {
    val stops = TF.stopwords("en")
    val feats = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("f_chars"),
        TF.tokenCount(col("text")).cast("long").as("f_tokens"),
        TF.countIn(TF.tokens(col("text")), stops).cast("long")
          .as("f_stop"))
    def dimScores(f: String) = {
      val census = feats.select(col(f).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(feats.agg(count(lit(1)).as("n"))))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("v"))))
      census.select(col("v").as(f),
        expr("CAST(floor(ln(CAST(cum AS DOUBLE) / n) * 1000000)" +
          " AS BIGINT)").as(s"lt_l_$f"),
        expr("CAST(floor(ln(CAST(n - cum + c AS DOUBLE) / n)" +
          " * 1000000) AS BIGINT)").as(s"lt_r_$f"))
    }
    val joined = Seq("f_chars", "f_tokens", "f_stop")
      .foldLeft(feats)((acc, f) => acc.join(dimScores(f), f))
    joined
      .withColumn("score_left_micro",
        -(col("lt_l_f_chars") + col("lt_l_f_tokens") +
          col("lt_l_f_stop")))
      .withColumn("score_right_micro",
        -(col("lt_r_f_chars") + col("lt_r_f_tokens") +
          col("lt_r_f_stop")))
      .select(col("doc_id"), col("source"),
        (col("score_left_micro") / lit(1e6)).as("score_left"),
        (col("score_right_micro") / lit(1e6)).as("score_right"),
        (greatest(col("score_left_micro"), col("score_right_micro")) /
          lit(1e6)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(EcodTop)
  }

  private val q337Sql = {
    val stopList = TF.stopwords("en")
    def census(f: String) =
      s"""c_$f AS (
         |  SELECT v, CAST(floor(ln(CAST(cum AS DOUBLE) / n) * 1000000)
         |      AS BIGINT) AS lt_l_$f,
         |    CAST(floor(ln(CAST(n - cum + c AS DOUBLE) / n) * 1000000)
         |      AS BIGINT) AS lt_r_$f
         |  FROM (
         |    SELECT v, c, sum(c) OVER (ORDER BY v) AS cum,
         |      (SELECT CAST(count(*) AS BIGINT) FROM feats) AS n
         |    FROM (SELECT $f AS v, CAST(count(*) AS BIGINT) AS c
         |          FROM feats GROUP BY 1) g) w)""".stripMargin
    s"""WITH feats AS (
       |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS f_chars,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS f_tokens,
       |    CAST(${TF.sql.countIn(TF.sql.tokens("text"), stopList)}
       |      AS BIGINT) AS f_stop
       |  FROM documents),
       |${census("f_chars")},
       |${census("f_tokens")},
       |${census("f_stop")},
       |scored AS (
       |  SELECT f.doc_id, f.source,
       |    -(a.lt_l_f_chars + b.lt_l_f_tokens + d.lt_l_f_stop)
       |      AS sl_micro,
       |    -(a.lt_r_f_chars + b.lt_r_f_tokens + d.lt_r_f_stop)
       |      AS sr_micro
       |  FROM feats f
       |  JOIN c_f_chars a ON f.f_chars = a.v
       |  JOIN c_f_tokens b ON f.f_tokens = b.v
       |  JOIN c_f_stop d ON f.f_stop = d.v)
       |SELECT doc_id, source, sl_micro / 1e6 AS score_left,
       |  sr_micro / 1e6 AS score_right,
       |  greatest(sl_micro, sr_micro) / 1e6 AS score
       |FROM scored
       |ORDER BY score DESC, doc_id LIMIT $EcodTop""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q60_growth_rate", q60, Some(q60Sql)),
    Q("q61_decline_periods", q61, Some(q61Sql)),
    Q("q62_group_similarity", q62, Some(q62Sql)),
    Q("q63_sequence_chains", q63, Some(q63Sql), headline = true),
    Q("q64_content_scan", q64, Some(q64Sql)),
    Q("q65_structural_anomaly", q65, Some(q65Sql)),
    Q("q66_consensus_levels", q66, Some(q66Sql)),
    Q("q140_key_skew_report", q140, Some(q140Sql)),
    Q("q199_source_gini", q199, Some(q199Sql)),
    Q("q209_metric_spearman", q209, Some(q209Sql)),
    Q("q225_ks_length_drift", q225, Some(q225Sql)),
    Q("q295_chi2_independence", q295, Some(q295Sql)),
    Q("q297_kendall_tau_grid", q297, Some(q297Sql)),
    Q("q230_mad_outliers", q230, Some(q230Sql)),
    Q("q234_schema_profile", q234, Some(q234Sql)),
    Q("q235_expectations", q235, Some(q235Sql)),
    Q("q238_field_mi", q238, Some(q238Sql)),
    Q("q247_partition_advisor", q247, Some(q247Sql)),
    Q("q263_join_cardinality", q263, Some(q263Sql)),
    Q("q266_benford_audit", q266, Some(q266Sql)),
    Q("q337_ecod_outliers", q337, Some(q337Sql)))
}
