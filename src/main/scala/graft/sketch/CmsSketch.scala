package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Count-min sketch counter table over a document token stream —
  * the REUSABLE form of q251's embedded construction (same d = 4
  * salted rows × w = 1024 counters, same portable hash), factored so
  * the incremental/streaming path can build PARTIAL counter tables
  * per micro-batch and merge them with the sketch's monoid:
  *
  *   counters(A ∪ B) = merge(counters(A), counters(B))
  *
  * — element-wise sum over the fixed (salt, bucket) grid, which is
  * what lets 1000 executors (or a day's micro-batches) sketch
  * independently and combine loss-free. CmsStreamSpec pins
  * stream == batch through a real micro-batched run.
  *
  * Scale shape: the only data-sized step is the token census (explode
  * + map-side combine); the salt replication runs over the
  * vocab-bounded census and the counter table is a FIXED d·w rows.
  */
object CmsSketch {

  val W = 1024
  val Salts = 4

  /** (salt, bucket, bsum) counter table for the batch. */
  def tokenCounters(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .select(col("tok"), col("cnt"),
        explode(expr(s"sequence(0, ${Salts - 1})")).as("salt"))
      .withColumn("bucket",
        pmod(TextFunctions.md5Long(concat(col("tok"), lit("#"),
          col("salt").cast("string"))), lit(W.toLong)))
      .groupBy(col("salt"), col("bucket"))
      .agg(sum(col("cnt")).as("bsum"))

  /** Monoid merge of appended partial counter tables. */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy(col("salt"), col("bucket"))
      .agg(sum(col("bsum")).as("bsum"))

  /** Point estimate (min over the d counters) for each probe token —
    * `counters` is the fixed 4096-row table (broadcast side).
    *
    * LEFT join + coalesce-to-0: a (salt, bucket) cell no token hashed
    * into has no counter row, and correct CMS semantics read that
    * missing counter as count 0 — an inner join would silently drop the
    * empty cell, inflating the min for a probe whose other cells are
    * occupied and ERASING a probe all of whose cells are empty (its
    * true estimate is 0, the one case the sketch answers exactly). */
  def estimates(counters: DataFrame, tokens: DataFrame,
      tokCol: String): DataFrame =
    tokens.select(col(tokCol).as("tok"),
        explode(expr(s"sequence(0, ${Salts - 1})")).as("salt"))
      .withColumn("bucket",
        pmod(TextFunctions.md5Long(concat(col("tok"), lit("#"),
          col("salt").cast("string"))), lit(W.toLong)))
      .join(broadcast(counters), Seq("salt", "bucket"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("bsum"), lit(0L))).as("cms_est"))
}
