package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.engine.Lineage.LineageOps

/** BPE merge training (builder mandate — tokenizer-preparation stage;
  * the public byte-pair-encoding recipe of Sennrich et al. 2016): learn
  * the `n` highest-count adjacent-symbol merges over the corpus.
  *
  * Scale shape: ONE corpus scan builds the (word, count) table; every
  * iteration after that runs on the VOCABULARY (distinct words), which
  * is sub-linear in corpus size — the pair census is a vocab-bounded
  * explode + keyed sum, the argmax is a 1-row TakeOrdered, and the
  * merge application is a per-word index-ordered fold. The word table
  * is lineage-truncated per iteration, so iteration k never re-runs
  * iterations 1..k-1 (the PageRank/BFS pattern).
  *
  * Determinism: pair counts are exact integers (weighted by word
  * frequency); argmax ties break lexicographically on (left, right);
  * the merge fold applies strictly leftmost-first (`aaa` + merge (a,a)
  * → `aa a`, matching the reference implementation's scan order). No
  * floats anywhere, so training is bit-stable across runs and
  * partitionings.
  */
object BpeTrainer {

  val EndOfWord = "</w>"

  /** (word, n) frequency table from whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequence: characters plus the end-of-word marker. */
  def initSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Weighted adjacent-pair census over a (syms, n) table. Words that
    * have collapsed to a single symbol carry no adjacent pair and are
    * filtered out first — without the guard, `sequence(1, size-1)`
    * on a 1-element array yields the DESCENDING sequence [1, 0] and
    * `element_at(syms, 0)` throws at runtime. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("left"),
          element_at(col("syms"), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("cnt"))

  /** Apply one merge (left, right) → left+right, leftmost-first. */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(left + right))))
          .otherwise(concat(acc, array(x))))

  /** Train `n` merges; returns (rank, left, right, cnt) ordered by rank.
    * Stops early if no adjacent pair remains. */
  def train(docs: DataFrame, textCol: String, n: Int): Seq[(Int, String, String, Long)] = {
    var words = wordCounts(docs, textCol)
      .select(initSymbols(col("word")).as("syms"), col("n"))
      .truncateLineage()
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var rank = 1
    while (rank <= n) {
      val best = pairCounts(words)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) { rank = n + 1 }
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        words = words
          .select(applyMerge(col("syms"), l, r).as("syms"), col("n"))
          .truncateLineage()
        rank += 1
      }
    }
    merges.toList
  }
}
