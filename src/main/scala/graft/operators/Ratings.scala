package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch rating updates (rating/rating_system.py `update_rating`,
  * asserted by tests/unit/test_rating_system.py): per-node evidence
  * adjusts the three ratings with the reference's exact formulas —
  *
  *   truthfulness: old + 0.2·confirmation − 0.2·contradiction
  *   richness:     old + 0.2·richness_factor     (factor ∈ [−1, 1])
  *   stability:    old + 0.2·stability_factor
  *
  * each clamped to [0, 1], and — the part the reference tests pin — a
  * rating is only WRITTEN when its evidence is present: absent evidence
  * (null column) leaves the old value and marks the rating untouched,
  * and a row with no evidence at all reports status `no_changes`
  * instead of `success`. The whole update is one projection, so it runs
  * as a scan at any scale (the MERGE INTO form on a lakehouse).
  */
object Ratings {

  private def clamp(c: Column): Column = least(lit(1.0), greatest(lit(0.0), c))

  /** Input columns: `rating_truthfulness/richness/stability` (current
    * values) and nullable evidence columns `confirmation`,
    * `contradiction`, `richness_factor`, `stability_factor`. Output adds
    * the updated ratings plus `touched_*` flags and `status`. */
  def updateRatings(nodes: DataFrame): DataFrame = {
    val truthEvidence =
      col("confirmation").isNotNull || col("contradiction").isNotNull
    val newTruth = clamp(col("rating_truthfulness") +
      lit(0.2) * coalesce(col("confirmation"), lit(0.0)) -
      lit(0.2) * coalesce(col("contradiction"), lit(0.0)))
    val newRich = clamp(col("rating_richness") +
      lit(0.2) * col("richness_factor"))
    val newStab = clamp(col("rating_stability") +
      lit(0.2) * col("stability_factor"))
    nodes
      .withColumn("touched_truthfulness", truthEvidence)
      .withColumn("touched_richness", col("richness_factor").isNotNull)
      .withColumn("touched_stability", col("stability_factor").isNotNull)
      .withColumn("rating_truthfulness",
        when(truthEvidence, newTruth).otherwise(col("rating_truthfulness")))
      .withColumn("rating_richness",
        when(col("richness_factor").isNotNull, newRich)
          .otherwise(col("rating_richness")))
      .withColumn("rating_stability",
        when(col("stability_factor").isNotNull, newStab)
          .otherwise(col("rating_stability")))
      .withColumn("status",
        when(col("touched_truthfulness") || col("touched_richness") ||
          col("touched_stability"), lit("success"))
          .otherwise(lit("no_changes")))
  }
}
