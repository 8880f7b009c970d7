package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fine-grained duplicated-span detection (builder mandate — no
  * reference counterpart): the sub-document complement of the
  * whole-document dedup family. Instead of asking "is this document a
  * duplicate", it asks "which PARTS of this document also appear in
  * other documents" — the signal behind span-level training-data
  * dedup (repeated boilerplate, quoted chunks, licence blocks), where
  * a document is kept but its cross-document repeated spans are
  * down-weighted or cut.
  *
  * Method: k-token shingles at every position; a shingle that occurs
  * in more than one DISTINCT document is a duplicated span. Per
  * document we report the duplicated-shingle fraction and the fraction
  * of token positions covered by at least one duplicated span (the
  * span-union coverage — computed by exploding each duplicated span
  * into its k positions and counting distinct positions, which is
  * integer arithmetic and so exactly reproducible on any engine).
  *
  * Scale shape: one explode (k-gram stream), one key-partitioned
  * countDistinct per shingle, one shuffle hash join back on the
  * shingle key, one bounded position explode (k x duplicated spans),
  * and two per-document aggregates. Nothing is quadratic: the join key
  * is the shingle text, so co-occurring documents never pair up —
  * exactly the property that lets span dedup run where pairwise dedup
  * cannot.
  */
object SpanDedup {

  /** K-token shingles of token-array frame (doc_id, l) →
    * (doc_id, pos, shingle); pos is 1-based, rows only for docs with
    * at least k tokens. */
  def shingles(toks: DataFrame, k: Int): DataFrame =
    toks
      .filter(size(col("l")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("l")) - (k - 1)),
          i => concat_ws(" ", slice(col("l"), i, lit(k))))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("shingle"))

  /** Maximal duplicated EXTENTS — the exact-substring dedup unit of the
    * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better" family: contiguous runs of token positions covered by at
    * least one cross-document duplicated k-shingle, per document. Where
    * [[stats]] counts coverage, this materializes the actual substring
    * spans a pipeline would CUT (while keeping the document), via
    * gaps-and-islands over the covered position set (tpos − row_number
    * — all integer arithmetic, bit-exact on any engine).
    *
    * Scale shape: candidate generation is an inverted-index equi-join on
    * the shingle key — co-occurring documents never pair up, which is
    * what lets exact-substring dedup run at corpus sizes where pairwise
    * comparison cannot (Lee et al. reach the same property through a
    * suffix array; the shingle index is the join-friendly equivalent
    * with a k-token resolution floor). The islands window partitions by
    * doc_id, so extent assembly is per-document-local after one keyed
    * shuffle. At 100 TB the shingle string itself would be replaced by
    * a 64-bit rolling hash as the join key (2^-64 collision odds, per
    * the paper's hashed variant) — the string key here keeps the
    * catalog entry exactly oracle-comparable.
    *
    * Returns (doc_id, ext_start, ext_end, ext_len), 1-based inclusive
    * token positions. */
  def extents(toks: DataFrame, k: Int): DataFrame = {
    val sh = shingles(toks, k)
    val dupTypes = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("shingle"))
    val covered = sh.join(dupTypes, Seq("shingle"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tpos"))
    covered
      .withColumn("grp", col("tpos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("tpos")).as("ext_start"),
        max(col("tpos")).as("ext_end"),
        count(lit(1)).as("ext_len"))
      .select(col("doc_id"), col("ext_start"), col("ext_end"),
        col("ext_len"))
  }

  /** Asymmetric covered extents: maximal runs of token positions in
    * `evalToks` docs covered by k-shingles that also occur anywhere in
    * `refToks` — the cross-corpus form of [[extents]] (eval-vs-train
    * split leakage, batch-vs-corpus exact-substring dedup). Same
    * inverted-index shape with the REF side reduced to a distinct
    * shingle-type set (vocabulary-bounded) before the join; eval docs
    * never pair with eval docs. Returns (doc_id, ext_start, ext_end,
    * ext_len) over eval doc_ids. */
  def extentsAgainst(evalToks: DataFrame, refToks: DataFrame, k: Int)
      : DataFrame = {
    val refSh = shingles(refToks, k).select(col("shingle")).distinct()
    val covered = shingles(evalToks, k).join(refSh, Seq("shingle"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tpos"))
    covered
      .withColumn("grp", col("tpos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("tpos")).as("ext_start"),
        max(col("tpos")).as("ext_end"),
        count(lit(1)).as("ext_len"))
      .select(col("doc_id"), col("ext_start"), col("ext_end"),
        col("ext_len"))
  }

  /** Per-document duplicated-span statistics: (doc_id, n_tokens,
    * n_shingles, dup_shingles, dup_frac, covered_tokens, covered_frac)
    * — fractions unrounded. */
  def stats(toks: DataFrame, k: Int): DataFrame = {
    val sh = shingles(toks, k)
    val dupTypes = sh.groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("shingle"))
    val dupSpans = sh.join(dupTypes, Seq("shingle"))
    val perDoc = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val dupPerDoc = dupSpans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_shingles"))
    val covered = dupSpans
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tpos")).as("covered_tokens"))
    toks.filter(size(col("l")) >= k)
      .select(col("doc_id"), size(col("l")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_shingles", "covered_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_shingles"),
        col("dup_shingles"),
        (col("dup_shingles").cast("double") / col("n_shingles"))
          .as("dup_frac"),
        col("covered_tokens"),
        (col("covered_tokens").cast("double") / col("n_tokens"))
          .as("covered_frac"))
  }
}
