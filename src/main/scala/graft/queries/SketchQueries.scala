package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{TextFunctions => TF}

/** Mergeable-sketch audits — the cardinality / frequency summaries a
  * 100 TB pipeline keeps INSTEAD of exact state, next to their exact
  * answers at audit scale so the error is a measured number, not a
  * paper claim. Both sketches here are chosen for the property that
  * matters on a cluster: they are commutative monoids (register-max /
  * counter-sum), so per-partition partials combine map-side and
  * per-day partials union across time without re-reading history —
  * q250 proves that merge identity inside the query itself.
  *
  * Determinism contract (both engines bit-equal): the portable 32-bit
  * md5 hash; register indexes / ranks by integer div-mod; 2^-M terms
  * are exact powers of two whose 256-term sum spans < 53 mantissa bits,
  * so the double sum is exact in ANY accumulation order; the bias
  * constant alpha_256 * m^2 is one Scala-computed double literal
  * embedded in both texts. No libm beyond exact power-of-two division.
  */
object SketchQueries {

  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")
  private def documents(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  // -- q250: HyperLogLog distinct-user sketch per event_type (Flajolet
  //          et al. 2007) — m = 256 registers from the portable hash's
  //          low 8 bits, rho = leading-zero rank of the remaining 24
  //          bits (25 - bitlength, 25 at zero). The query computes the
  //          registers TWICE: directly, and as a max-merge of per-day
  //          register snapshots — `merge_consistent` pins the monoid
  //          identity that lets 1000 executors (or 365 daily jobs)
  //          sketch independently and combine loss-free. The reported
  //          hll_estimate is the COMBINED estimator: the small-range
  //          linear-counting branch (m·ln(m/V) when the raw estimate is
  //          under 2.5m and empty registers exist) via hllEst, with the
  //          zero-register count also reported so the regime is
  //          visible. Scale shape: one scan, (type × day × 256)-
  //          bounded register frames, map-side max combine everywhere.
  private val HllM = 256
  /** alpha_256 * 256^2 — same IEEE literal on both engines. */
  private val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0

  private def q250(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .select(col("event_type"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .withColumn("h", TF.md5Long(col("user_id").cast("string")))
      .select(col("event_type"), col("day"), col("user_id"),
        pmod(col("h"), lit(HllM.toLong)).as("j"),
        when(expr(s"h div $HllM") === 0L, lit(25))
          .otherwise(lit(25) - length(expr(s"bin(h div $HllM)")))
          .cast("int").as("rho"))
    val direct = base.groupBy(col("event_type"), col("j"))
      .agg(max(col("rho")).as("m_direct"))
    val merged = base.groupBy(col("event_type"), col("day"), col("j"))
      .agg(max(col("rho")).as("rho_d"))
      .groupBy(col("event_type"), col("j"))
      .agg(max(col("rho_d")).as("m_merged"))
    val agg = direct.join(merged, Seq("event_type", "j"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("active_registers"),
        sum(expr("cast(1.0 as double) / shiftleft(cast(1 as bigint), m_direct)"))
          .as("ssum"),
        sum(when(col("m_direct") =!= col("m_merged"), 1L).otherwise(0L))
          .as("mism"))
    val exact = base.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val raw = lit(HllAlphaM2) /
      (col("ssum") + (lit(HllM.toLong) - col("active_registers")))
    val zeroR = lit(HllM.toLong) - col("active_registers")
    // small-range branch: linear counting m·ln(m/V), its ln quantized
    // to micro-units on both engines (the lnlnFit pattern) — the
    // combined estimator is shared with q264's set algebra via hllEst
    val combined = hllEst(col("ssum"), col("active_registers"))
    exact.join(agg, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("active_registers"),
        zeroR.as("zero_registers"),
        round(raw, 6).as("hll_raw"),
        round(combined, 6).as("hll_estimate"),
        round((combined - col("n_exact")) / col("n_exact"), 6).as("rel_err"),
        (col("mism") === 0L).as("merge_consistent"))
      .orderBy(col("event_type"))
  }

  private val q250Sql = {
    val h = TF.sql.md5Long("user_id::VARCHAR")
    s"""WITH base AS (
       |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id,
       |    h % $HllM AS j,
       |    CASE WHEN h // $HllM = 0 THEN 25
       |         ELSE 25 - length(bin(h // $HllM)) END AS rho
       |  FROM (SELECT event_type, ts, user_id, $h AS h FROM events)),
       |direct AS (SELECT event_type, j, max(rho) AS m_direct
       |           FROM base GROUP BY 1, 2),
       |merged AS (SELECT event_type, j, max(rho_d) AS m_merged FROM (
       |             SELECT event_type, day, j, max(rho) AS rho_d
       |             FROM base GROUP BY 1, 2, 3) GROUP BY 1, 2),
       |agg AS (SELECT event_type,
       |          CAST(count(*) AS BIGINT) AS active_registers,
       |          sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << m_direct)) AS ssum,
       |          sum(CASE WHEN m_direct <> m_merged THEN 1 ELSE 0 END) AS mism
       |        FROM direct JOIN merged USING (event_type, j) GROUP BY 1),
       |exact AS (SELECT event_type,
       |            CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
       |          FROM base GROUP BY 1)
       |SELECT event_type, n_exact, active_registers, zero_registers,
       |  round(raw, 6) AS hll_raw,
       |  round(combined, 6) AS hll_estimate,
       |  round((combined - n_exact) / n_exact, 6) AS rel_err,
       |  (mism = 0) AS merge_consistent
       |FROM (
       |  SELECT event_type, n_exact, active_registers, mism,
       |    $HllM - active_registers AS zero_registers,
       |    raw,
       |    CASE WHEN raw <= ${2.5 * HllM} AND $HllM - active_registers > 0
       |         THEN $HllM.0 * CAST(round(ln($HllM.0 /
       |           CAST($HllM - active_registers AS DOUBLE)) * 1000000)
       |           AS BIGINT) / 1000000.0
       |         ELSE raw END AS combined
       |  FROM (
       |    SELECT event_type, n_exact, active_registers, mism,
       |      $HllAlphaM2 / (ssum + ($HllM - active_registers)) AS raw
       |    FROM exact JOIN agg USING (event_type)))
       |ORDER BY event_type""".stripMargin
  }

  // -- q251: count-min heavy hitters over the document token stream
  //          (Cormode & Muthukrishnan 2005) — d = 4 salted hash rows ×
  //          w = 1024 counters; a token's estimate is the MIN of its 4
  //          counters, which can only OVER-count (collisions add).
  //          Candidates are the true heavy hitters (count ≥ total /
  //          2000, integer compare), each reported with its exact
  //          count, sketch estimate, overcount, and whether it lands
  //          inside the standard 2/w·N bound. Scale shape: the only
  //          data-sized step is the token census (explode + map-side
  //          combine); the 4-salt replication runs over the VOCAB-
  //          bounded census, the counter table is a fixed 4096 rows
  //          (broadcast side of the probe join), and the 1-row total
  //          frame is a broadcast stats cross.
  private val CmsW = 1024
  private val CmsSalts = 4

  private def q251(s: SparkSession, dir: String): DataFrame = {
    val census = documents(s, dir)
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = census.agg(sum(col("cnt")).as("total"))
    val salted = census.select(col("tok"), col("cnt"),
        explode(expr(s"sequence(0, ${CmsSalts - 1})")).as("salt"))
      .withColumn("bucket",
        pmod(TF.md5Long(concat(col("tok"), lit("#"),
          col("salt").cast("string"))), lit(CmsW.toLong)))
    val counters = salted.groupBy(col("salt"), col("bucket"))
      .agg(sum(col("cnt")).as("bsum"))
    val cands = census.join(broadcast(total))
      .filter(col("cnt") * 2000 >= col("total"))
    cands.select(col("tok"), col("cnt"), col("total"))
      .join(salted.select(col("tok"), col("salt"), col("bucket")),
        Seq("tok"))
      .join(broadcast(counters), Seq("salt", "bucket"))
      .groupBy(col("tok"), col("cnt"), col("total"))
      .agg(min(col("bsum")).as("cms_est"))
      .select(col("tok").as("token"), col("cnt").as("true_cnt"),
        col("cms_est"),
        (col("cms_est") - col("cnt")).as("overcount"),
        ((col("cms_est") - col("cnt")) * CmsW <= col("total") * 2)
          .as("within_bound"))
      .orderBy(col("token"))
  }

  private val q251Sql = {
    val hs = TF.sql.md5Long("tok || '#' || s::VARCHAR")
    s"""WITH census AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(${TF.sql.tokens("text")}) AS tok
       |        FROM documents) GROUP BY 1),
       |tot AS (SELECT sum(cnt) AS total FROM census),
       |salted AS (
       |  SELECT tok, cnt, s AS salt, $hs % $CmsW AS bucket
       |  FROM census, range(0, $CmsSalts) t(s)),
       |counters AS (SELECT salt, bucket, CAST(sum(cnt) AS BIGINT) AS bsum
       |             FROM salted GROUP BY 1, 2),
       |cands AS (SELECT tok, cnt, total FROM census, tot
       |          WHERE cnt * 2000 >= total)
       |SELECT c.tok AS token, c.cnt AS true_cnt,
       |  min(k.bsum) AS cms_est,
       |  min(k.bsum) - c.cnt AS overcount,
       |  ((min(k.bsum) - c.cnt) * $CmsW <= c.total * 2) AS within_bound
       |FROM cands c
       |JOIN salted sl ON sl.tok = c.tok
       |JOIN counters k ON k.salt = sl.salt AND k.bucket = sl.bucket
       |GROUP BY c.tok, c.cnt, c.total
       |ORDER BY token""".stripMargin
  }

  // -- q259: equi-width histogram quantile sketch — the third monoid
  //          (counter-vector under +, after q250's register-max and
  //          q251's counter-sum): 64 FIXED-width bins (64 chars each,
  //          top bin open) over document length per source, quantile
  //          estimates read off the cumulative histogram with linear
  //          interpolation as EXACT rationals of counts, next to the
  //          exact order-statistic answer and the signed error. Fixed
  //          widths are the mergeability condition (data-dependent bin
  //          edges don't add across batches); the lang-partitioned
  //          partial histograms are summed and pinned equal to the
  //          direct ones in `merge_consistent`, the same in-result
  //          monoid proof as q250. Scale shape: one scan into
  //          (source × 64)-bounded histograms; the exact twin collects
  //          per-source sorted arrays — the audit-scale path only, the
  //          sketch is the 100 TB path (documented like q51/q62).
  private val HgBins = 64
  private val HgWidth = 64L
  private val HgQs = Seq(50L, 90L, 99L)

  private def q259(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = documents(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        least(lit(HgBins - 1L), expr(s"n_chars div $HgWidth")).as("bin"))
    val direct = d.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_direct"))
    val merged = d.groupBy(col("source"), col("lang"), col("bin"))
      .agg(count(lit(1)).as("nl"))
      .groupBy(col("source"), col("bin"))
      .agg(sum(col("nl")).as("n_merged"))
    val consistent = direct.join(merged, Seq("source", "bin"))
      .groupBy(col("source"))
      .agg(sum(when(col("n_direct") =!= col("n_merged"), 1L).otherwise(0L))
        .as("mism"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = direct
      .withColumn("cum", sum(col("n_direct")).over(wCum))
    val totals = d.groupBy(col("source"))
      .agg(count(lit(1)).as("total"),
        sort_array(collect_list(col("n_chars"))).as("sorted"))
    // target rank r = ceil(q/100 * total) (1-indexed); pick the first
    // bin with cum*100 >= q*total, interpolate inside it
    val qrows = totals
      .select(col("source"), col("total"), col("sorted"),
        explode(typedLit(HgQs)).as("q_pct"))
      .select(col("source"), col("total"), col("q_pct"),
        element_at(col("sorted"),
          expr("cast((q_pct * total + 99) div 100 as int)"))
          .as("exact_value"))
    val est = qrows.join(cum, Seq("source"))
      .filter(col("cum") * 100 >= col("q_pct") * col("total"))
      .groupBy(col("source"), col("q_pct"), col("total"),
        col("exact_value"))
      .agg(min(col("bin")).as("qbin"))
      .join(cum.select(col("source"), col("bin").as("qbin"),
        col("n_direct").as("bn"), col("cum").as("bcum")),
        Seq("source", "qbin"))
    est.select(col("source"), col("q_pct"),
        ExactRound.ratio6(
          col("qbin") * HgWidth * lit(100L) * col("bn") +
            lit(HgWidth) * (col("q_pct") * col("total") -
              (col("bcum") - col("bn")) * 100),
          col("bn") * lit(100L)).as("hist_estimate"),
        col("exact_value"))
      .join(consistent, Seq("source"))
      .select(col("source"), col("q_pct"), col("hist_estimate"),
        col("exact_value"),
        round(col("hist_estimate") - col("exact_value"), 6).as("err_chars"),
        (col("mism") === 0L).as("merge_consistent"))
      .orderBy(col("source"), col("q_pct"))
  }

  private lazy val q259Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH d AS (
       |  SELECT source, lang, n_chars,
       |    least(${HgBins - 1}, n_chars // $HgWidth) AS bin
       |  FROM documents),
       |direct AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n_direct
       |           FROM d GROUP BY 1, 2),
       |merged AS (SELECT source, bin, CAST(sum(nl) AS BIGINT) AS n_merged
       |           FROM (SELECT source, lang, bin,
       |                   CAST(count(*) AS BIGINT) AS nl
       |                 FROM d GROUP BY 1, 2, 3) GROUP BY 1, 2),
       |consistent AS (
       |  SELECT source,
       |    sum(CASE WHEN n_direct <> n_merged THEN 1 ELSE 0 END) AS mism
       |  FROM direct JOIN merged USING (source, bin) GROUP BY 1),
       |cum AS (
       |  SELECT source, bin, n_direct,
       |    CAST(sum(n_direct) OVER (PARTITION BY source ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM direct),
       |totals AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS total,
       |    list_sort(list(n_chars)) AS sorted
       |  FROM d GROUP BY 1),
       |qrows AS (
       |  SELECT source, total, q_pct,
       |    sorted[CAST((q_pct * total + 99) // 100 AS INT)] AS exact_value
       |  FROM totals, (VALUES (50::BIGINT), (90::BIGINT), (99::BIGINT))
       |    t(q_pct)),
       |qbins AS (
       |  SELECT q.source, q.q_pct, q.total, q.exact_value,
       |    min(c.bin) AS qbin
       |  FROM qrows q JOIN cum c ON c.source = q.source
       |  WHERE c.cum * 100 >= q.q_pct * q.total
       |  GROUP BY 1, 2, 3, 4),
       |est AS (
       |  SELECT b.source, b.q_pct,
       |    ${ER.sql.ratio6(
      s"b.qbin * $HgWidth * 100 * c.n_direct + $HgWidth * " +
        "(b.q_pct * b.total - (c.cum - c.n_direct) * 100)",
      "c.n_direct * 100")} AS hist_estimate,
       |    b.exact_value
       |  FROM qbins b JOIN cum c
       |    ON c.source = b.source AND c.bin = b.qbin)
       |SELECT e.source AS source, e.q_pct, e.hist_estimate, e.exact_value,
       |  round(e.hist_estimate - e.exact_value, 6) AS err_chars,
       |  (k.mism = 0) AS merge_consistent
       |FROM est e JOIN consistent k ON k.source = e.source
       |ORDER BY e.source, e.q_pct""".stripMargin
  }

  // -- q261: bottom-k (KMV) sketch — the fourth monoid (sorted-set
  //          merge-and-truncate): the k = 32 smallest DISTINCT user
  //          hashes per event_type are simultaneously a mergeable
  //          uniform sample and a distinct-count estimator (Bar-Yossef
  //          et al. 2002): N̂ = (k−1)·2³² / h_(k), pure integer
  //          division on the portable hash. Registers built twice —
  //          direct, and per-day bottom-k unioned then re-truncated —
  //          with set equality pinned in `merge_consistent` (the law
  //          that lets daily jobs keep 32 longs each and still answer
  //          month-distinct). Below k distinct values the sketch IS the
  //          exact answer (est = n_exact). Scale shape: one scan into
  //          (type × hash)-keyed distincts, per-type top-k windows over
  //          k-bounded frames, everything downstream ≤ k rows per key.
  private val BkK = 32
  private val BkDom = 4294967296L // 2^32: the portable hash's range

  private def q261(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events(s, dir)
      .select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        TF.md5Long(col("user_id").cast("string")).as("h"))
    val distinctH = base.select(col("event_type"), col("h")).distinct()
    val wk = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val direct = distinctH
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= BkK)
    val daily = base.select(col("event_type"), col("day"), col("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("day")).orderBy(col("h"))))
      .filter(col("rn") <= BkK)
      .select(col("event_type"), col("h")).distinct()
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= BkK)
    val mism = direct.select(col("event_type"), col("h"))
      .unionByName(daily.select(col("event_type"), col("h")))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("c") =!= 2L, 1L).otherwise(0L)).as("mism"))
    val perType = direct.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
    val exact = distinctH.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"))
    exact.join(perType, Seq("event_type")).join(mism, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("n_kept"),
        col("hk").as("kth_hash"),
        when(col("n_exact") < BkK, col("n_exact"))
          .otherwise(expr(s"(${BkK - 1} * $BkDom) div hk")).as("kmv_estimate"),
        round((when(col("n_exact") < BkK, col("n_exact"))
          .otherwise(expr(s"(${BkK - 1} * $BkDom) div hk")) -
          col("n_exact")).cast("double") / col("n_exact"), 6).as("rel_err"),
        (col("mism") === 0L).as("merge_consistent"))
      .orderBy(col("event_type"))
  }

  private lazy val q261Sql = {
    val h = TF.sql.md5Long("user_id::VARCHAR")
    s"""WITH base AS (
       |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, $h AS h
       |  FROM events),
       |dh AS (SELECT DISTINCT event_type, h FROM base),
       |direct AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM dh) x WHERE rn <= $BkK),
       |daily AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h, row_number() OVER (
       |      PARTITION BY event_type ORDER BY h) AS rn
       |    FROM (
       |      SELECT DISTINCT event_type, h FROM (
       |        SELECT event_type, day, h, row_number() OVER (
       |          PARTITION BY event_type, day ORDER BY h) AS rnd
       |        FROM (SELECT DISTINCT event_type, day, h FROM base))
       |      WHERE rnd <= $BkK)) x
       |  WHERE rn <= $BkK),
       |mism AS (
       |  SELECT event_type,
       |    sum(CASE WHEN c <> 2 THEN 1 ELSE 0 END) AS mism
       |  FROM (
       |    SELECT event_type, h, count(*) AS c FROM (
       |      SELECT * FROM direct UNION ALL SELECT * FROM daily)
       |    GROUP BY 1, 2)
       |  GROUP BY 1),
       |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
       |         max(h) AS hk
       |       FROM direct GROUP BY 1),
       |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM dh GROUP BY 1)
       |SELECT event_type, n_exact, n_kept, hk AS kth_hash,
       |  CASE WHEN n_exact < $BkK THEN n_exact
       |       ELSE (${BkK - 1} * $BkDom) // hk END AS kmv_estimate,
       |  round(CAST((CASE WHEN n_exact < $BkK THEN n_exact
       |       ELSE (${BkK - 1} * $BkDom) // hk END) - n_exact AS DOUBLE)
       |    / n_exact, 6) AS rel_err,
       |  (mism = 0) AS merge_consistent
       |FROM ex JOIN pt USING (event_type) JOIN mism USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // -- q264: HLL set algebra — the register-union trick that answers
  //          cross-segment overlap questions from sketches alone:
  //          |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union
  //          sketch is just the element-wise register MAX (exact, not
  //          an approximation of the union — the same monoid q250
  //          proves). Audited against the exact pairwise user overlap
  //          for every event_type pair. Estimator (incl. the linear-
  //          counting branch) is shared with q250 via [[hllEst]] /
  //          [[hllEstSql]]. Scale shape: one scan into per-type
  //          registers; pair expansion joins the 256-row register
  //          frames against a broadcast ≤(T²)-row pair frame; the
  //          exact twin is one distinct-pair self-join (audit-scale).
  private def hllEst(ssum: org.apache.spark.sql.Column,
      active: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val zeroR = lit(HllM.toLong) - active
    val raw = lit(HllAlphaM2) / (ssum + zeroR)
    val lc = lit(HllM.toDouble) *
      round(log(lit(HllM.toDouble) / zeroR.cast("double")) * lit(1000000), 0)
        .cast("long") / lit(1000000.0)
    when(raw <= lit(2.5 * HllM) && zeroR > 0L, lc).otherwise(raw)
  }

  private def hllEstSql(ssum: String, active: String): String =
    s"""(CASE WHEN $HllAlphaM2 / (($ssum) + ($HllM - ($active)))
       |      <= ${2.5 * HllM} AND $HllM - ($active) > 0
       | THEN $HllM.0 * CAST(round(ln($HllM.0 /
       |   CAST($HllM - ($active) AS DOUBLE)) * 1000000) AS BIGINT)
       |   / 1000000.0
       | ELSE $HllAlphaM2 / (($ssum) + ($HllM - ($active))) END)"""
      .stripMargin.replace("\n", " ")

  private def q264(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir)
      .select(col("event_type"), col("user_id"))
      .withColumn("h", TF.md5Long(col("user_id").cast("string")))
      .select(col("event_type"), col("user_id"),
        pmod(col("h"), lit(HllM.toLong)).as("j"),
        when(expr(s"h div $HllM") === 0L, lit(25))
          .otherwise(lit(25) - length(expr(s"bin(h div $HllM)")))
          .cast("int").as("rho"))
    val regs = base.groupBy(col("event_type"), col("j"))
      .agg(max(col("rho")).as("rho"))
    def estOf(r: DataFrame, keys: Seq[String]) = r
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("active"),
        sum(expr("cast(1.0 as double) / shiftleft(cast(1 as bigint), rho)"))
          .as("ssum"))
      .withColumn("est", hllEst(col("ssum"), col("active")))
    val single = estOf(regs, Seq("event_type"))
    val pairs = single.select(col("event_type").as("ta"))
      .join(single.select(col("event_type").as("tb")),
        col("ta") < col("tb"))
    val unionRegs = regs
      .join(broadcast(pairs), col("event_type") === col("ta"))
      .select(col("ta"), col("tb"), col("j"), col("rho"))
      .unionByName(regs
        .join(broadcast(pairs), col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("j"), col("rho")))
      .groupBy(col("ta"), col("tb"), col("j"))
      .agg(max(col("rho")).as("rho"))
    val unionEst = estOf(unionRegs, Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("est").as("est_ab"))
    val du = base.select(col("event_type"), col("user_id")).distinct()
    val exact = du.select(col("event_type").as("ta"), col("user_id"))
      .join(du.select(col("event_type").as("tb"), col("user_id")),
        Seq("user_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_exact_overlap"))
    unionEst
      .join(single.select(col("event_type").as("ta"),
        col("est").as("est_a")), Seq("ta"))
      .join(single.select(col("event_type").as("tb"),
        col("est").as("est_b")), Seq("tb"))
      .join(exact, Seq("ta", "tb"), "left")
      .select(col("ta"), col("tb"),
        coalesce(col("n_exact_overlap"), lit(0L)).as("n_exact_overlap"),
        round(col("est_a") + col("est_b") - col("est_ab"), 6)
          .as("hll_overlap_est"),
        round(col("est_a") + col("est_b") - col("est_ab") -
          coalesce(col("n_exact_overlap"), lit(0L)), 6).as("err"))
      .orderBy(col("ta"), col("tb"))
  }

  private lazy val q264Sql = {
    val h = TF.sql.md5Long("user_id::VARCHAR")
    val est = hllEstSql("ssum", "active")
    s"""WITH base AS (
       |  SELECT event_type, user_id,
       |    h % $HllM AS j,
       |    CASE WHEN h // $HllM = 0 THEN 25
       |         ELSE 25 - length(bin(h // $HllM)) END AS rho
       |  FROM (SELECT event_type, user_id, $h AS h FROM events)),
       |regs AS (SELECT event_type, j, max(rho) AS rho
       |         FROM base GROUP BY 1, 2),
       |single AS (
       |  SELECT event_type, $est AS est FROM (
       |    SELECT event_type, CAST(count(*) AS BIGINT) AS active,
       |      sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << rho)) AS ssum
       |    FROM regs GROUP BY 1)),
       |prs AS (SELECT a.event_type AS ta, b.event_type AS tb
       |        FROM single a JOIN single b ON a.event_type < b.event_type),
       |uregs AS (
       |  SELECT ta, tb, j, max(rho) AS rho FROM (
       |    SELECT p.ta, p.tb, r.j, r.rho
       |    FROM regs r JOIN prs p ON r.event_type = p.ta
       |    UNION ALL
       |    SELECT p.ta, p.tb, r.j, r.rho
       |    FROM regs r JOIN prs p ON r.event_type = p.tb)
       |  GROUP BY 1, 2, 3),
       |uest AS (
       |  SELECT ta, tb, $est AS est_ab FROM (
       |    SELECT ta, tb, CAST(count(*) AS BIGINT) AS active,
       |      sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << rho)) AS ssum
       |    FROM uregs GROUP BY 1, 2)),
       |du AS (SELECT DISTINCT event_type, user_id FROM base),
       |exact AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb,
       |    CAST(count(*) AS BIGINT) AS n_exact_overlap
       |  FROM du a JOIN du b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT u.ta, u.tb,
       |  coalesce(e.n_exact_overlap, 0) AS n_exact_overlap,
       |  round(sa.est + sb.est - u.est_ab, 6) AS hll_overlap_est,
       |  round(sa.est + sb.est - u.est_ab -
       |    coalesce(e.n_exact_overlap, 0), 6) AS err
       |FROM uest u
       |JOIN single sa ON sa.event_type = u.ta
       |JOIN single sb ON sb.event_type = u.tb
       |LEFT JOIN exact e ON e.ta = u.ta AND e.tb = u.tb
       |ORDER BY u.ta, u.tb""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q250_hll_distinct", q250, Some(q250Sql)),
    Q("q251_cms_heavy_hitters", q251, Some(q251Sql)),
    Q("q259_histogram_quantiles", q259, Some(q259Sql)),
    Q("q261_bottomk_kmv", q261, Some(q261Sql)),
    Q("q264_hll_overlap", q264, Some(q264Sql)))
}
