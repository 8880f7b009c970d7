package graft

import org.apache.spark.sql.functions._

/** Streaming twin of q289's drift machinery: the (source, length)
  * value census that feeds the Wasserstein integration is a SUM
  * MONOID — per-micro-batch partial censuses appended and merged
  * equal the one-pass batch census exactly, for any batch
  * decomposition. That is what lets the EMD drift monitor run
  * incrementally (merge the day's census into the corpus census, then
  * integrate) instead of rescanning the corpus; the EMD itself is a
  * deterministic function of the merged census, already oracle-gated
  * through q289. Same parity contract as CmsStreamSpec's count-min
  * twin. */
class LengthCensusStreamSpec extends SparkSpec {

  test("streamed partial length censuses merge to the exact batch census") {
    val docs = Tables.load(spark, sf, "documents")
    val srcDir = java.nio.file.Files.createTempDirectory("lc-src").toString
    docs.repartition(5).write.mode("overwrite").parquet(srcDir)
    val accDir = java.nio.file.Files.createTempDirectory("lc-acc").toString

    var batches = 0
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          batches += 1
          batch.toDF().groupBy(col("source"), col("n_chars").as("v"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("append").parquet(accDir): Unit
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batches > 2, s"expected several micro-batches, got $batches")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("v")) ->
        r.getAs[Long]("cnt")).toMap
    val merged = key(spark.read.parquet(accDir)
      .groupBy(col("source"), col("v")).agg(sum(col("cnt")).as("cnt")))
    val direct = key(docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("cnt")))
    assert(merged == direct && direct.nonEmpty,
      "merged micro-batch censuses must equal the one-pass census")
  }
}
