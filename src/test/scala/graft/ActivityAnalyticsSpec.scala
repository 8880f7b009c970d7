package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Catalog
import graft.streaming.EventStream

/** Invariants for the event-behavior analytics (q215/q216/q218) and the
  * SQ8 codec audit (q217) that the oracle's value-hash alone doesn't
  * articulate: the ntile closed form, the session-label refactor parity,
  * the Markov mass-conservation identity, and the quantization error
  * bound.
  */
class ActivityAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("q218 ntile closed form matches native ntile on an uneven frame") {
    // 23 users (U mod 10 = 3): first 3 buckets get 3 rows, the rest 2 —
    // the uneven-bucket rule the closed integer form must reproduce.
    val ua = (1 to 23).map(i => (i.toLong, (i * 7 % 11 + 1).toLong))
      .toDF("user_id", "n")
    val native = ua.withColumn("decile",
      ntile(10).over(Window.orderBy(col("n"), col("user_id"))))
    val u = 23L
    val base = u / 10
    val rem = u % 10
    val closed = ua.withColumn("rnk",
        row_number().over(Window.orderBy(col("n"), col("user_id"))))
      .withColumn("decile",
        when(col("rnk") <= lit(rem * (base + 1)),
          ((col("rnk") - 1) / lit(base + 1)).cast("long") + 1)
          .otherwise(lit(rem) +
            ((col("rnk") - lit(rem * (base + 1)) - 1) / lit(base)).cast("long") + 1))
    val nat = native.select("user_id", "decile").as[(Long, Long)]
      .collect().toMap
    val cls = closed.select("user_id", "decile").as[(Long, Long)]
      .collect().toMap
    assert(cls === nat)
  }

  test("sessionLabels aggregates to exactly sessionizeBatch") {
    val ev = Tables.load(spark, sf, "events")
    val viaLabels = EventStream.sessionLabels(ev, 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("duration_sec"))
    val direct = EventStream.sessionizeBatch(ev, 1800L)
    assert(viaLabels.exceptAll(direct).isEmpty && direct.exceptAll(viaLabels).isEmpty)
  }

  test("q215 transition mass: total transitions = events - users") {
    // every user contributes (its event count - 1) transitions, so the
    // matrix total is N_events - N_users; and each row's counts sum to
    // that row's marginal (the join key), so probabilities sum to ~1.
    val ev = Tables.load(spark, sf, "events")
    val res = Catalog.byName("q215_markov_transitions").run(spark, sf)
    val totalN = res.agg(sum("n")).head().getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(totalN === nEvents - nUsers)
    val rowMass = res.groupBy("prev_type").agg(sum("p").as("mass"))
      .select("mass").as[Double].collect()
    // per-row quantization error ≤ #types * 0.5e-6
    assert(rowMass.forall(m => math.abs(m - 1.0) < 1e-4))
  }

  test("q216 paths stay inside one session") {
    // trigram count per (user, session) = max(n_events - 2, 0): the sum
    // over sessions must equal the catalog query's total path count.
    val ev = Tables.load(spark, sf, "events")
    val expected = EventStream.sessionizeBatch(ev, 1800L)
      .select(greatest(col("n_events") - 2, lit(0L)).as("k"))
      .agg(sum("k")).head().getLong(0)
    val lab = EventStream.sessionLabels(ev, 1800L)
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("sec"), col("event_id"))
    val total = lab.withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull).count()
    assert(total === expected)
  }

  test("transitionsStream aggregates to exactly the q215 count frame") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
      .as[EventStream.TypedEv]
    val streamed = EventStream.transitionsStream(ev)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().sorted.toSeq
    val batch = Catalog.byName("q215_markov_transitions").run(spark, sf)
      .select("prev_type", "next_type", "n")
      .as[(String, String, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("transitionsStream spans micro-batch boundaries through state") {
    import org.apache.spark.sql.types._
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
    // two files, one per trigger: every user's history is split across
    // batches, so boundary transitions only exist if state chains them
    val dir = java.nio.file.Files.createTempDirectory("trstream").toString
    val cut = ev.agg(expr("percentile_approx(sec, 0.5)")).head().getLong(0)
    ev.filter(col("sec") <= cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/b0")
    ev.filter(col("sec") > cut).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/b1")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("sec", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*")
    val q = EventStream.transitionsStream(stream.as[EventStream.TypedEv])
      .writeStream.outputMode("append")
      .format("memory").queryName("trout").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
        "SELECT prev_type, next_type, count(*) AS n FROM trout GROUP BY 1, 2")
      .as[(String, String, Long)].collect().sorted.toSeq
    val batch = Catalog.byName("q215_markov_transitions").run(spark, sf)
      .select("prev_type", "next_type", "n")
      .as[(String, String, Long)].collect().sorted.toSeq
    assert(streamed == batch)
  }

  test("q236: fast-session screen fires only on machine-speed fixtures") {
    // replicate the flag on sessionizeBatch output: a 3-event burst in
    // 30 s is fast; the same 3 events spread 10 min apart are not
    val burst = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 30L),
      (2L, 4L, 0L), (2L, 5L, 600L), (2L, 6L, 1200L))
      .toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_seconds(sec)").as("ts"))
    val sess = EventStream.sessionizeBatch(burst, 1800L)
      .withColumn("fast", col("n_events") >= 2 &&
        col("duration_sec") <= (col("n_events") - 1) * 60L)
      .select("user_id", "fast").as[(Long, Boolean)].collect().toMap
    assert(sess(1L) && !sess(2L))
    // catalog run: flagged users report consistent bounds
    Catalog.byName("q236_bot_sessions").run(spark, sf).collect()
      .foreach { r =>
        assert(r.getAs[Long]("n_fast") >= 1L)
        assert(r.getAs[Long]("n_fast") <= r.getAs[Long]("n_sessions"))
        assert(r.getAs[Long]("n_fast_events") >= 2 * r.getAs[Long]("n_fast"))
      }
  }

  test("q217 per-dim max error respects the SQ8 half-step bound") {
    val res = Catalog.byName("q217_sq8_error").run(spark, sf).collect()
    assert(res.length === 64)
    res.foreach { r =>
      val mn = r.getAs[Double]("dim_min")
      val mx = r.getAs[Double]("dim_max")
      val halfStep = (mx - mn) / 255.0 / 2.0
      val maxErr = r.getAs[Double]("max_abs_err")
      assert(maxErr <= halfStep + 1e-6,
        s"dim ${r.getAs[Int]("pos")}: $maxErr > $halfStep")
      val meanErr = r.getAs[Double]("mean_abs_err")
      assert(meanErr <= maxErr + 1e-9)
    }
  }
}
