package graft

import org.apache.spark.sql.functions._

/** Streaming twin of the one-way-F family (q301/q306/q314): the
  * per-group moment triple (n, Σx, Σx²) is a SUM MONOID — per-micro-
  * batch partial moments appended and merged equal the one-pass batch
  * moments exactly, for any batch decomposition, because every
  * component is an exact integer sum. That is what lets the ANOVA /
  * ICC / design-effect screens run incrementally over an ingest
  * stream (merge the day's moments, recompute the 1-row statistic)
  * instead of rescanning the corpus; the F/ICC formulas downstream
  * are deterministic functions of the merged moments, already
  * oracle-gated through q301/q306/q314. Same parity contract as
  * LengthCensusStreamSpec and CmsStreamSpec. */
class AnovaMomentsStreamSpec extends SparkSpec {

  test("streamed partial moment triples merge to the exact batch moments") {
    val docs = Tables.load(spark, sf, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("am-src").toString
    docs.repartition(5).write.mode("overwrite").parquet(srcDir)
    val accDir = java.nio.file.Files.createTempDirectory("am-acc").toString

    var batches = 0
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batches += 1
          batch.toDF().groupBy(col("source")).agg(
              count(lit(1)).as("n_g"), sum(col("n_chars")).as("s_g"),
              sum(col("n_chars") * col("n_chars")).as("q_g"))
            .write.mode("append").parquet(accDir): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batches > 2, s"expected several micro-batches, got $batches")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_g"), r.getAs[Long]("s_g"),
          r.getAs[Long]("q_g")))).toMap
    val merged = key(spark.read.parquet(accDir)
      .groupBy(col("source")).agg(sum(col("n_g")).as("n_g"),
        sum(col("s_g")).as("s_g"), sum(col("q_g")).as("q_g")))
    val direct = key(docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_g"), sum(col("n_chars")).as("s_g"),
      sum(col("n_chars") * col("n_chars")).as("q_g")))
    assert(merged == direct && direct.nonEmpty,
      "merged micro-batch moments must equal the one-pass moments")
  }
}
