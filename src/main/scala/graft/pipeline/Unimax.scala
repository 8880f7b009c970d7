package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
  * More Effective Language Sampling for Large-Scale Multilingual
  * Pretraining" — builder mandate, no reference counterpart): split a
  * total token budget across sources as uniformly as possible while
  * repeating no source more than `epochCap` epochs.
  *
  * The paper states the allocation as a sequential loop (repeatedly
  * give every remaining source an even share, cap the ones that can't
  * absorb it, recurse on the leftover). This is the closed form:
  * sorted by capacity ascending, the capped set is a PREFIX of the
  * order, and source i is capped iff
  * `cap_i * (S - i + 1) <= budget - prefix_{i-1}` — the even split
  * over sources i..S, with everything before i fully allocated,
  * already exceeds i's capacity. A running prefix-AND guards the
  * prefix property explicitly rather than relying on the monotonicity
  * proof. All of that arithmetic is exact bigints; the only double is
  * the final leftover-share division, identical on any engine.
  *
  * Scale shape: the input is the per-source token aggregate (a
  * few-thousand-row frame at any corpus size); every window here runs
  * over that bounded frame — the q134/q141 bounded-window precedent —
  * and the 1-row total joins in as a broadcast.
  */
object Unimax {

  /** Allocation over `st(source, n_tok)`: source, n_tok, cap, alloc
    * (unrounded double). Budget = floor(n_tok total * budgetNum /
    * budgetDen). */
  def alloc(st: DataFrame, epochCap: Long, budgetNum: Long,
      budgetDen: Long): DataFrame = {
    val capped = st.withColumn("cap", col("n_tok") * lit(epochCap))
    val tot = capped.agg(sum(col("n_tok")).as("tot"),
      count(lit(1)).as("n_src"))
    val byCap = Window.orderBy(col("cap"), col("source"))
    val all = byCap
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    capped.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"tot * $budgetNum div $budgetDen"))
      .withColumn("i", row_number().over(byCap).cast("long"))
      .withColumn("p", sum(col("cap")).over(byCap))
      .withColumn("ok",
        when(col("cap") * (col("n_src") - col("i") + 1) <=
          col("budget") - (col("p") - col("cap")), 1L).otherwise(0L))
      .withColumn("is_capped", min(col("ok")).over(byCap) === 1L)
      .withColumn("n_capped",
        sum(when(col("is_capped"), 1L).otherwise(0L)).over(all))
      .withColumn("capped_sum",
        sum(when(col("is_capped"), col("cap")).otherwise(0L)).over(all))
      .select(col("source"), col("n_tok"), col("cap"),
        when(col("is_capped"), col("cap").cast("double"))
          .otherwise((col("budget") - col("capped_sum")) * lit(1.0) /
            (col("n_src") - col("n_capped"))).as("alloc"))
  }

  /** DuckDB oracle twin: CTE chain over `src` (source, n_tok) ending in
    * `${p}alloc(source, n_tok, cap, alloc)` — prefix `p` keeps the
    * names collision-free when composed into larger chains (q174). */
  object sql {
    def allocCtes(src: String, epochCap: Long, budgetNum: Long,
        budgetDen: Long, p: String = "u"): String =
      s"""${p}st AS (
         |  SELECT source, n_tok, n_tok * $epochCap AS cap FROM $src),
         |${p}tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot,
         |  CAST(count(*) AS BIGINT) AS n_src FROM ${p}st),
         |${p}rnk AS (
         |  SELECT s.*, t.tot, t.n_src,
         |    (t.tot * $budgetNum) // $budgetDen AS budget,
         |    CAST(row_number() OVER w AS BIGINT) AS i,
         |    sum(s.cap) OVER w AS p
         |  FROM ${p}st s CROSS JOIN ${p}tot t
         |  WINDOW w AS (ORDER BY s.cap, s.source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |${p}flg AS (
         |  SELECT *, CASE WHEN cap * (n_src - i + 1) <= budget - (p - cap)
         |    THEN 1 ELSE 0 END AS ok FROM ${p}rnk),
         |${p}prf AS (
         |  SELECT *, min(ok) OVER (ORDER BY cap, source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
         |    AS capped
         |  FROM ${p}flg),
         |${p}glb AS (
         |  SELECT *,
         |    sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped,
         |    sum(CASE WHEN capped THEN cap ELSE 0 END) OVER ()
         |      AS capped_sum
         |  FROM ${p}prf),
         |${p}alloc AS (
         |  SELECT source, n_tok, cap,
         |    CASE WHEN capped THEN CAST(cap AS DOUBLE)
         |      ELSE (budget - capped_sum) * 1.0 / (n_src - n_capped) END
         |      AS alloc
         |  FROM ${p}glb)""".stripMargin
  }
}
