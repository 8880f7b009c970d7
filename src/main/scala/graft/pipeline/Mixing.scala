package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-scaled source mixing for training-corpus assembly
  * (builder mandate — no reference counterpart): given per-source
  * populations, a sampling temperature T rebalances the mixture,
  * `p_i ∝ (n_i/N)^(1/T)` — T=1 keeps natural proportions, T→∞ tends to
  * uniform over sources, T<1 sharpens toward the big sources. The
  * budget then yields a per-source quota, realized deterministically:
  * every doc repeats `quota / n` times (full epochs) and the
  * `quota % n` docs with the smallest portable hash rank get one more
  * copy — re-runs and engines agree copy-for-copy, unlike `rand()`
  * sampling.
  *
  * Scale shape: the plan is one aggregate over the corpus (map-side
  * combinable count per source) — a few-thousand-row frame at any
  * corpus size — and both normalization constants join back as
  * broadcast 1-row aggregates. Selection is a broadcast join of that
  * plan against the scan plus a per-source hash-rank window; the window
  * sorts within sources only, and the epoch explode emits copies
  * without ever materializing the mixture on one node.
  */
object Mixing {

  /** Per-source mixing plan: population, normalized probability, doc
    * quota for `budget`, and the quota's epoch/remainder split.
    * Columns: source, n_docs, p, quota, full_epochs, remainder. */
  def plan(df: DataFrame, sourceCol: String, temperature: Double,
      budget: Long): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    require(budget > 0, "budget must be positive")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val withW = counts
      .crossJoin(broadcast(counts.select(sum(col("n_docs")).as("n_total"))))
      .withColumn("w",
        pow(col("n_docs") / col("n_total"), lit(1.0 / temperature)))
    withW
      .crossJoin(broadcast(withW.select(sum(col("w")).as("w_sum"))))
      .withColumn("p", col("w") / col("w_sum"))
      .withColumn("quota", round(col("p") * budget).cast("long"))
      .select(col("source"), col("n_docs"), round(col("p"), 6).as("p"),
        col("quota"),
        (col("quota") / col("n_docs")).cast("long").as("full_epochs"),
        (col("quota") % col("n_docs")).as("remainder"))
  }

  /** Materialized mixture: each input row exploded to its copy count
    * under `plan` — `full_epochs` copies for everyone, plus one for the
    * `remainder` smallest (hash, key) ranks in the source. Adds
    * `copy_n` (1-based) so downstream shuffles can spread the copies.
    * Rows from sources whose quota gives them zero copies drop out. */
  def mix(df: DataFrame, sourceCol: String, keyCol: String,
      temperature: Double, budget: Long, salt: String = ""): DataFrame = {
    val quotas = plan(df, sourceCol, temperature, budget)
      .select(col("source").as(sourceCol), col("full_epochs"),
        col("remainder"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(Sampling.hashBucket(col(keyCol), 1000000000, salt),
        col(keyCol))
    df.withColumn("mix_rank", row_number().over(w))
      .join(broadcast(quotas), sourceCol)
      .withColumn("copies",
        col("full_epochs") +
          when(col("mix_rank") <= col("remainder"), 1L).otherwise(0L))
      .filter(col("copies") > 0)
      .withColumn("copy_n", explode(expr("sequence(1, copies)")))
      .drop("full_epochs", "remainder", "copies")
  }
}
