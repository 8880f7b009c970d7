package graft

import org.apache.spark.sql.functions._
import graft.engine.Lineage.LineageOps
import graft.semantic.SimilarityJoins
import graft.text.TextFunctions

/** Diagnostic main: quantifies the PPJoin positional+length pruning on the
  * prefix-filtered similarity joins (q24 tag-Jaccard, q30 3-gram Jaccard).
  * Prints, per workload, the scored-candidate count with the plain
  * AllPairs prefix filter vs with the PPJoin filters, plus the final pair
  * count (identical in both modes — the filters are exact).
  *
  * Usage: runMain graft.CandidateStats [sfDir]
  */
object CandidateStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-candstats", Some("local[32]"), 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")

    // q24 shape: word tokens, blocked by source, t = 0.7
    val words = docs.select(col("source").as("blk"), col("doc_id").as("id"),
        TextFunctions.distinctTokens(col("text")).as("toks"))
      .truncateLineage()
    // q30 shape: char 3-gram shingles, blocked by source, t = 0.8
    val shingles = docs.select(col("source").as("blk"), col("doc_id").as("id"),
        array_distinct(TextFunctions.charShingles(col("text"), 3)).as("toks"))
      .truncateLineage()

    for ((name, toks, t) <- Seq(("q24_words_t0.7", words, 0.7),
        ("q30_3gram_t0.8", shingles, 0.8))) {
      val plain = SimilarityJoins.prefixPairs(toks, t, ppjoinFilters = false)
      val ppj = SimilarityJoins.prefixPairs(toks, t)
      val nPlain = plain.count()
      val nPpj = ppj.count()
      val nFinal = ppj.filter(col("sim") >= t).count()
      println(f"[candstats] $name: allpairs_candidates=$nPlain " +
        f"ppjoin_candidates=$nPpj (${100.0 * nPpj / nPlain}%.1f%%) " +
        f"final_pairs>=t=$nFinal")
    }
    spark.stop()
  }
}
