package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Benchmark decontamination (training-pipeline mandate — no reference
  * counterpart): find training documents that share word n-grams with a
  * held-out/benchmark set, the standard leakage check run before
  * training on a large corpus.
  *
  * Shape: inverted-index equi-join. Each side explodes to its DISTINCT
  * word n-grams (hashed — the join shuffles 8-byte keys, not strings;
  * both engines hash identically via `TextFunctions.md5Long`, so the
  * oracle sees the same collisions, if ever), the join blocks on the
  * n-gram, and a count aggregate per (train, bench) pair yields the
  * shared-shingle count. At 100 TB the benchmark side is small (even
  * "all public benchmarks" is ~GBs) — it broadcasts, and the train side
  * streams through scan-local; no all-pairs anything. Boilerplate
  * n-grams (licenses, headers) are the skew risk: `maxBenchDf` drops
  * n-grams present in more than that many benchmark docs before the
  * join, the classic stopword cut for this join.
  */
object Decontaminate {

  /** Distinct word n-grams of a token array; empty below n tokens
    * (guarded — Spark's `sequence(1, 0)` would count DOWN). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))

  // distinct over the HASHES (not the strings), so the oracle's
  // list_distinct(list_transform(...)) is reproduced exactly even in the
  // face of an in-document hash collision
  private def explodedHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(transform(
        wordShingles(TextFunctions.tokens(col(textCol)), n),
        g => TextFunctions.md5Long(g)))).as("g_id"))

  /** (train_id, bench_id, n_shared) for every pair sharing at least
    * `minShared` distinct n-grams. */
  def sharedNgrams(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minShared: Long = 1L,
      maxBenchDf: Option[Int] = None): DataFrame = {
    val t = explodedHashes(train, idCol, textCol, n)
      .withColumnRenamed(idCol, "train_id")
    val b0 = explodedHashes(bench, idCol, textCol, n)
      .withColumnRenamed(idCol, "bench_id")
    val b = maxBenchDf match {
      case Some(cap) =>
        val hot = b0.groupBy(col("g_id"))
          .agg(countDistinct(col("bench_id")).as("df"))
          .filter(col("df") > cap).select(col("g_id"))
        b0.join(broadcast(hot), Seq("g_id"), "left_anti")
      case None => b0
    }
    t.join(b, Seq("g_id"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB equivalents (oracle side). */
  object sql {
    def shingleHashes(toks: String, n: Int): String =
      s"list_distinct(list_transform(range(1, greatest(len($toks) - ${n - 1}, 0) + 1), " +
        s"i -> ${TextFunctions.sql.md5Long(s"array_to_string(($toks)[i:i+${n - 1}], ' ')")}))"
  }
}
