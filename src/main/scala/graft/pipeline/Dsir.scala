package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Data Selection via Importance Resampling (builder mandate — no
  * reference counterpart): score every candidate document by how much
  * more likely its hashed-n-gram features are under a TARGET corpus
  * than under the raw corpus, the public DSIR recipe (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling") —
  * the standard way a 100 TB crawl is skimmed for "looks like the
  * high-quality target domain" documents.
  *
  * Features are hashed unigram buckets (portable md5 hash →
  * [[TextFunctions.md5Long]], so DuckDB reproduces every bucket id
  * bit-for-bit). Both bucket distributions are add-one smoothed; a
  * document's log importance weight is the position-ordered sum of its
  * tokens' bucket log-ratios.
  *
  * Scale shape: the bucket tables are FEATURE-bounded (`buckets` rows,
  * default 256) never corpus-bounded, so they broadcast onto the token
  * instance stream; everything else is one linear posexplode scan, one
  * keyed per-document aggregate, and a TakeOrdered selection. No stage
  * pairs documents with documents.
  *
  * Determinism contract: bucket counts are integers; each bucket's
  * log-ratio is one IEEE expression of those integers; per-document
  * sums fold in POSITION order (sorted-array left fold, mirrored by the
  * oracle's `sum(... ORDER BY pos)`), so both engines produce
  * bit-identical doubles before the final rounding.
  */
object Dsir {

  val DefaultBuckets = 256

  /** Token instances with 1-based positions and hashed feature bucket:
    * (doc_id, source, pos, b). */
  def instances(docs: DataFrame, buckets: Int = DefaultBuckets): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        posexplode(TextFunctions.tokens(col("text"))))
      .select(col("doc_id"), col("source"),
        (col("pos") + 1).cast("long").as("pos"),
        Sampling.hashBucket(col("col"), buckets).as("b"))

  /** Per-candidate-document importance weights against the target
    * distribution: (doc_id, n_tok, logw) with logw unrounded.
    *
    * @param isTarget   predicate over (doc_id, source) marking the
    *                   target slice; candidates are the complement.
    */
  def importance(docs: DataFrame, isTarget: Column,
      buckets: Int = DefaultBuckets): DataFrame = {
    val inst = instances(docs, buckets)
    val tgt = inst.filter(isTarget)
    val cand = inst.filter(!isTarget)
    val tgtBuckets = tgt.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tgtTotal = tgt.agg(count(lit(1)).as("nt"))
    val candBuckets = cand.groupBy(col("b")).agg(count(lit(1)).as("cc"))
    val candTotal = cand.agg(count(lit(1)).as("nc"))
    // log-ratio per feature bucket present in the candidate stream;
    // buckets unseen in the target keep the smoothed floor via ct=0
    val ratios = candBuckets
      .join(tgtBuckets, Seq("b"), "left")
      .crossJoin(broadcast(tgtTotal))
      .crossJoin(broadcast(candTotal))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
            (col("nt") + lit(buckets.toDouble))) -
          log((col("cc") + lit(1.0)) /
            (col("nc") + lit(buckets.toDouble)))).as("lr"))
    cand
      .join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lr"))))
        .as("lrs"))
      .select(col("doc_id"),
        size(col("lrs")).cast("long").as("n_tok"),
        aggregate(col("lrs"), lit(0.0d), (acc, x) => acc + x("lr"))
          .as("logw"))
  }

  /** DuckDB oracle fragments (tools/check.py side). */
  object sql {
    /** CTE chain ending in `dsagg(doc_id, n_tok, logw)` — the oracle
      * twin of [[importance]] with target slice `source = '<target>'`
      * over `documents`. */
    def importanceCtes(target: String, buckets: Int = DefaultBuckets)
        : String = {
      val bucket = Sampling.sql.hashBucket("l[i]", buckets)
      s"""toks AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS l
         |  FROM documents),
         |inst AS (
         |  SELECT doc_id, source, CAST(i AS BIGINT) AS pos, $bucket AS b
         |  FROM toks, unnest(range(1, len(l) + 1)) r(i)),
         |tgtb AS (
         |  SELECT b, count(*) AS ct FROM inst
         |  WHERE source = '$target' GROUP BY 1),
         |tgtn AS (
         |  SELECT count(*) AS nt FROM inst WHERE source = '$target'),
         |candb AS (
         |  SELECT b, count(*) AS cc FROM inst
         |  WHERE source <> '$target' GROUP BY 1),
         |candn AS (
         |  SELECT count(*) AS nc FROM inst WHERE source <> '$target'),
         |ratios AS (
         |  SELECT b,
         |    ln((coalesce(ct, 0) + 1.0) / (nt + $buckets.0)) -
         |      ln((cc + 1.0) / (nc + $buckets.0)) AS lr
         |  FROM candb LEFT JOIN tgtb USING (b)
         |  CROSS JOIN tgtn CROSS JOIN candn),
         |dsagg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    sum(lr ORDER BY pos) AS logw
         |  FROM inst JOIN ratios USING (b)
         |  WHERE source <> '$target'
         |  GROUP BY 1)""".stripMargin
    }
  }
}
