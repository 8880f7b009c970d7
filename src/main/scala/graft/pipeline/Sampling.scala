package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Deterministic sampling and split assignment for training-data
  * pipelines (builder mandate — no reference counterpart; the reference
  * serves online queries, a 100 TB corpus build needs reproducible
  * subsetting).
  *
  * Everything here derives from a portable keyed hash
  * (`TextFunctions.md5Long` — first 8 md5 hex chars as a long), NOT from
  * `rand()` or Spark's `sample()`: the assignment of a row depends only
  * on (key, salt), so re-runs, retries, and engines agree row-for-row —
  * the property train/val splits actually need. Adding data never moves
  * an existing row between splits (per-key, not per-position), and a
  * salt change re-deals the whole corpus.
  *
  * Scale shapes: bucket/rate/split are pure per-row column arithmetic
  * (scan-local, no shuffle). quotaSample is one shuffle on the group key
  * + a per-group row_number window; per-group state is the quota, not
  * the group, so a skewed group costs its sort only. For quotas at
  * "top-k of a petabyte group" scale, pre-prune with `rateSample` at a
  * few times the expected quota rate before the window.
  */
object Sampling {

  /** Deterministic bucket in [0, buckets): portable hash of (key, salt).
    * Key is stringified so any type hashes identically cross-engine. */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    pmod(TextFunctions.md5Long(concat(key.cast("string"), lit(salt))),
      lit(buckets.toLong))

  /** Keep rows whose bucket falls under `rate` (0..1), deterministically.
    * Granularity is 1/buckets. */
  def rateSample(df: DataFrame, key: Column, rate: Double,
      salt: String = "", buckets: Int = 1000000): DataFrame =
    df.filter(hashBucket(key, buckets, salt) <
      lit((rate * buckets).toLong))

  /** Split assignment by integer weights, e.g.
    * Seq("train" -> 98, "val" -> 1, "test" -> 1): buckets are dealt over
    * the weight total, cumulative ranges pick the split. Deterministic
    * per key; weights are exact (every bucket maps to exactly one
    * split). */
  def splitColumn(key: Column, weights: Seq[(String, Int)],
      salt: String = ""): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val b = hashBucket(key, total, salt)
    val cuts = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    weights.zip(cuts).init.foldRight(lit(weights.last._1)) {
      case (((name, _), upper), otherwise) =>
        when(b < upper, name).otherwise(otherwise)
    }
  }

  /** Per-group deterministic quota: the `quota` rows of each group with
    * the smallest (hash, key) — a reproducible "random" per-group sample
    * that is stable under appends outside the group. Returns the input
    * rows plus the sample rank. */
  def quotaSample(df: DataFrame, group: Column, key: Column,
      quota: Int, salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(hashBucket(key, 1000000000, salt), key)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }

  /** DuckDB equivalents (tools/check.py oracle side). */
  object sql {
    def hashBucket(key: String, buckets: Int, salt: String = ""): String =
      s"(${TextFunctions.sql.md5Long(s"(CAST($key AS VARCHAR) || '$salt')")}" +
        s" % $buckets + $buckets) % $buckets"
  }
}
