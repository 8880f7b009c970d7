package graft

import org.apache.spark.sql.functions._
import graft.sketch.CmsSketch

/** Pins the streaming count-min twin: per-micro-batch PARTIAL counter
  * tables, appended and merged with the sketch monoid, equal the
  * one-pass batch counter table exactly — for any batch decomposition
  * — and the resulting estimates keep the sketch's one-sided error
  * (never under-count the true census). */
class CmsStreamSpec extends SparkSpec {

  test("streamed partial counters merge to the exact batch counter table") {
    val docs = Tables.load(spark, sf, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("cms-src").toString
    docs.repartition(5).write.mode("overwrite").parquet(srcDir)
    val accDir = java.nio.file.Files.createTempDirectory("cms-acc").toString

    var batches = 0
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batches += 1
          CmsSketch.tokenCounters(batch.toDF(), "text")
            .write.mode("append").parquet(accDir): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batches > 2, s"expected several micro-batches, got $batches")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("salt"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("bsum")).toMap
    val streamed = key(CmsSketch.merge(spark.read.parquet(accDir)))
    val direct = key(CmsSketch.tokenCounters(docs, "text"))
    assert(streamed == direct && direct.nonEmpty,
      "merged micro-batch counters must equal the one-pass table")

    // one-sided error: the merged sketch never under-counts the census
    val census = docs
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val est = CmsSketch.estimates(
        CmsSketch.merge(spark.read.parquet(accDir)),
        census.select(col("tok")), "tok")
      .join(census, Seq("tok"))
    assert(est.filter(col("cms_est") < col("cnt")).count() == 0)
  }

  test("a probe hitting empty cells reads them as 0 and is never dropped") {
    import spark.implicits._
    // tiny corpus -> almost every (salt, bucket) cell has NO counter
    // row; correct CMS semantics read a missing counter as count 0.
    // Before round 10 the estimate inner-joined the counter table, so
    // an out-of-vocab probe either vanished (all cells empty) or read
    // an inflated min over only its occupied cells (round-9 ADVICE).
    val corpus = Seq(("d1", "alpha beta alpha")).toDF("doc_id", "text")
    val counters = CmsSketch.tokenCounters(corpus, "text")
    val probes = (1 to 20).map(i => s"unseen_token_$i").toDF("tok")
    val est = CmsSketch.estimates(counters, probes, "tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 20, "every probe must appear in the output")
    // ≤2 occupied buckets per salt row out of 1024: each unseen probe
    // has ≥1 empty cell (fixed deterministic hashes), so min = 0
    assert(est.values.forall(_ == 0L),
      s"unseen probes must estimate 0, got $est")
    // in-vocab probes still read their exact counts in this
    // collision-free table
    val inv = CmsSketch.estimates(counters,
        Seq("alpha", "beta").toDF("tok"), "tok").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inv == Map("alpha" -> 2L, "beta" -> 1L))
  }
}
