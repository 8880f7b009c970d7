package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Pins the incremental-ingestion dedup contracts (q141/q142 machinery):
  * the asymmetric LSH pairs only across sides (cost tracks the batch,
  * never re-pairs the corpus), agrees with the symmetric sweep on the
  * cross-side slice, and the shard manifest's two-level prefix sum
  * equals the global cumsum it decomposes. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // Planted corpus: docs 1/2 are near-identical (one token differs in
  // 40), 3 is unrelated, 10 duplicates 1 verbatim, 11 is unrelated.
  private val base = "alpha beta gamma delta " * 10
  private val corpus = Seq(
    (1L, base + "tail one"),
    (2L, base + "tail two"),
    (3L, "completely different content with nothing shared at all"),
    (10L, base + "tail one"),
    (11L, "another unrelated document about other things entirely"))
    .toDF("doc_id", "text")

  private val oldSide = corpus.filter(col("doc_id") < 10)
  private val newSide = corpus.filter(col("doc_id") >= 10)

  test("minhashLshAgainst finds cross-side near-dups and only those") {
    val pairs = Dedup.minhashLshAgainst(newSide, oldSide, "doc_id", "text",
        k = 12, bands = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 duplicates 1 (and so also nears 2); 11 matches nothing
    assert(pairs.contains((10L, 1L)))
    assert(!pairs.exists(_._1 == 11L))
    // every emitted pair is new-side x old-side — old x old (1,2) must
    // NOT appear even though they are near-identical
    assert(pairs.forall { case (n, o) => n >= 10L && o < 10L })
  }

  test("asymmetric LSH agrees with the symmetric sweep's cross-side slice") {
    val sym = Dedup.minhashLsh(corpus, "doc_id", "text",
        k = 12, bands = 2, threshold = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { // a_id < b_id; keep pairs straddling the cutoff
        case (a, b) if a < 10L && b >= 10L => (b, a)
      }.toSet
    val asym = Dedup.minhashLshAgainst(newSide, oldSide, "doc_id", "text",
        k = 12, bands = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asym == sym)
  }

  test("streaming incremental LSH over micro-batches equals the full sweep") {
    import org.apache.spark.sql.types._
    // the real corpus, streamed one file per trigger so the run actually
    // crosses several micro-batch boundaries with uneven contents
    val corpus = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val srcDir = java.nio.file.Files.createTempDirectory("incdedup-src").toString
    corpus.repartition(5).write.mode("overwrite").parquet(srcDir)
    val accDir = java.nio.file.Files.createTempDirectory("incdedup-acc").toString

    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    var batches = 0
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        batches += 1
        val seen = try s.read.parquet(accDir)
          catch { case _: Throwable => s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema) }
        pairs ++= Dedup.incrementalPairs(batch.toDF(), seen, "doc_id", "text",
            k = 12, bands = 2, threshold = 0.9)
          .select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        batch.write.mode("append").parquet(accDir): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()

    val full = Dedup.minhashLsh(corpus, "doc_id", "text", k = 12, bands = 2,
        threshold = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(batches > 2, s"expected several micro-batches, got $batches")
    assert(pairs.toSet == full)
    assert(full.nonEmpty)
  }

  test("shard manifest: two-level prefix sum equals the global cumsum") {
    val W = org.apache.spark.sql.expressions.Window
    // deterministic uneven token counts over a doc_id space spanning
    // several ranges (RangeWidth=1024 in the catalog; 8 here, so the
    // boundary frame actually has >1 row)
    val d = (0L until 200L).map(i => (i * 3, 1L + (i * 7) % 13))
      .toDF("doc_id", "n_tok")
    val beforeRange = W.orderBy(col("rng")).rowsBetween(W.unboundedPreceding, -1)
    val within = W.partitionBy(col("rng")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val rangeCum = d.withColumn("rng", expr("doc_id div 8"))
      .groupBy(col("rng")).agg(sum(col("n_tok")).as("rt"))
      .withColumn("range_before",
        coalesce(sum(col("rt")).over(beforeRange), lit(0L)))
    val twoLevel = d.withColumn("rng", expr("doc_id div 8"))
      .join(rangeCum.select(col("rng"), col("range_before")), Seq("rng"))
      .withColumn("tokens_before", col("range_before") +
        coalesce(sum(col("n_tok")).over(within), lit(0L)))
      .select(col("doc_id"), col("tokens_before"))
    val global = d.withColumn("tokens_before",
        coalesce(sum(col("n_tok")).over(
          W.orderBy(col("doc_id")).rowsBetween(W.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("doc_id"), col("tokens_before"))
    assert(twoLevel.except(global).isEmpty && global.except(twoLevel).isEmpty)
  }
}
