package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog
import graft.streaming.EventStream

/** Parity pins for the streaming as-of twin: on the same feed, the
  * one-row-of-state stream produces EXACTLY the batch AsOfJoin result
  * (q241's oracle-gated frame), including matches that span micro-batch
  * boundaries (view in batch 0, purchase in batch 1) and tolerance
  * nulls. */
class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def feed = Tables.load(spark, sf, "events")
    .filter(col("event_type").isin("view", "purchase"))
    .select(col("user_id"), unix_timestamp(col("ts")).as("sec"),
      col("event_id"),
      when(col("event_type") === "view", 0).otherwise(1).as("side"),
      col("value"))

  private type Row6 = (Long, Long, Long, Option[Long], Option[Long],
    Option[Long], Option[Double])

  private def batchRows: Seq[Row6] =
    Catalog.byName("q241_asof_join").run(spark, sf)
      .select("user_id", "p_eid", "p_sec", "v_eid", "v_sec", "gap_sec",
        "v_value")
      .as[Row6].collect().sortBy(_._2).toSeq

  test("single-pass stream function equals the batch as-of join") {
    val got = EventStream.asOfStream(feed.as[EventStream.AsOfEv], Some(3600L))
      .select("user_id", "p_eid", "p_sec", "v_eid", "v_sec", "gap_sec",
        "v_value")
      .as[Row6].collect().sortBy(_._2).toSeq
    val want = batchRows
    assert(want.nonEmpty && got == want)
    // both matched and unmatched purchases must occur for the pin to
    // actually exercise the tolerance path
    assert(want.exists(_._4.isDefined) && want.exists(_._4.isEmpty))
  }

  test("matches span micro-batch boundaries through state") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("asofstream").toString
    val cut = feed.agg(expr("percentile_approx(sec, 0.5)")).head().getLong(0)
    feed.filter(col("sec") <= cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/b0")
    feed.filter(col("sec") > cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/b1")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("sec", LongType),
      StructField("event_id", LongType), StructField("side", IntegerType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*")
    val q = EventStream.asOfStream(stream.as[EventStream.AsOfEv], Some(3600L))
      .writeStream.outputMode("append")
      .format("memory").queryName("asofout").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("asofout")
      .select("user_id", "p_eid", "p_sec", "v_eid", "v_sec", "gap_sec",
        "v_value")
      .as[Row6].collect().sortBy(_._2).toSeq
    assert(got == batchRows)
  }
}
