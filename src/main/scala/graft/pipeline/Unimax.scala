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
}
