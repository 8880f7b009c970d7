package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition-based quality filters for training corpora (builder
  * mandate — no reference counterpart): excessive word / n-gram
  * repetition is the classic low-quality-document signal (boilerplate,
  * keyword stuffing, generation loops), filtered on ratio thresholds in
  * the Gopher-rules style.
  *
  * Everything is per-row column arithmetic over the token array — the
  * occurrence statistics come from ONE linear pass over the sorted
  * array (run-length aggregate), not from a token explode + group-by,
  * so the metrics compute inside the scan with zero shuffle at any
  * corpus size. Per-row cost is O(tokens · log tokens) for the sort;
  * the alternative count-per-distinct-token lambda is O(tokens ·
  * distinct) and quadratic on long documents.
  */
object Repetition {

  /** Whitespace tokens with empties dropped (leading/trailing space
    * safe). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Adjacent-pair (bigram) strings of a token array. */
  def bigrams(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))

  /** Occurrence statistics of an array in one sorted linear pass:
    * struct(best = top occurrence count, nruns = distinct values,
    * dup = total occurrences of values appearing more than once). */
  def runStats(arr: Column): Column = {
    def state(prev: Column, run: Column, best: Column, nruns: Column,
        dup: Column) =
      struct(prev.as("prev"), run.as("run"), best.as("best"),
        nruns.as("nruns"), dup.as("dup"))
    def closeRun(acc: Column) = (
      greatest(acc("best"), acc("run")),
      acc("dup") + when(acc("run") > 1, acc("run")).otherwise(lit(0L)))
    aggregate(
      array_sort(arr),
      state(lit(null).cast("string"), lit(0L), lit(0L), lit(0L), lit(0L)),
      (acc, x) => {
        val (best, dup) = closeRun(acc)
        when(acc("prev").isNotNull && x === acc("prev"),
          state(x, acc("run") + 1, acc("best"), acc("nruns"), acc("dup")))
          .otherwise(state(x, lit(1L), best, acc("nruns") + 1, dup))
      },
      acc => {
        val (best, dup) = closeRun(acc)
        struct(best.as("best"), acc("nruns").as("nruns"), dup.as("dup"))
      })
  }

  /** Shannon entropy of the token distribution — the
    * information-theoretic repetitiveness score (H = ln L - (1/L)·Σ
    * freq·ln freq; 0 for a single repeated token, ln(distinct) for an
    * even spread). Same zero-shuffle shape as [[runStats]]: frequencies
    * come from one sorted-run pass inside the scan, never an explode +
    * group-by.
    *
    * Determinism contract: each run's freq·ln(freq) term is quantized
    * to a micro-unit bigint and the terms integer-sum (order-free —
    * the q163/q164 ln-quantization pattern), so the closed form
    * `(round(ln L·1e6)·L − Σq) / (1e6·L)` is one integer numerator over
    * one double division: bit-identical on any engine that sums the
    * same (token, freq) multiset. Empty arrays score 0. */
  def entropy(arr: Column): Column = {
    def q(run: Column) =
      round(run.cast("double") * log(run.cast("double")) * lit(1e6), 0)
        .cast("long")
    def state(prev: Column, run: Column, sumq: Column) =
      struct(prev.as("prev"), run.as("run"), sumq.as("sumq"))
    val sumQ = aggregate(
      array_sort(arr),
      state(lit(null).cast("string"), lit(0L), lit(0L)),
      (acc, x) => {
        val closed = acc("sumq") +
          when(acc("run") > 0, q(acc("run"))).otherwise(lit(0L))
        when(acc("prev").isNotNull && x === acc("prev"),
          state(x, acc("run") + 1, acc("sumq")))
          .otherwise(state(x, lit(1L), closed))
      },
      acc => acc("sumq") +
        when(acc("run") > 0, q(acc("run"))).otherwise(lit(0L)))
    val len = size(arr).cast("long")
    when(len === 0L, lit(0.0)).otherwise(
      (round(log(len.cast("double")) * lit(1e6), 0).cast("long") * len -
        sumQ) / (lit(1e6) * len.cast("double")))
  }

  /** Top-occurrence share: best / total, the "one token dominates"
    * signal. */
  def topShare(stats: Column, total: Column): Column =
    stats("best") / total

  /** Duplicated-occurrence fraction: share of occurrences whose value
    * appears more than once. */
  def dupFraction(stats: Column, total: Column): Column =
    stats("dup") / total
}
