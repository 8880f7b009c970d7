package graft

import graft.queries.Catalog

/** Control-chart invariants (q252 CUSUM, q253 EWMA). */
class ControlChartSpec extends SparkSpec {

  test("CUSUM prefix-sum decomposition equals the textbook recurrence") {
    // the identity q252 relies on: max(0, prev + x) == S_t - min S_j
    val xs = Seq(3L, -5L, 2L, 7L, -1L, -9L, 4L, 4L)
    val rec = xs.scanLeft(0L)((c, x) => math.max(0L, c + x)).tail
    val ps = xs.scanLeft(0L)(_ + _).tail
    val dec = ps.zipWithIndex.map { case (s, i) =>
      s - math.min(0L, ps.take(i + 1).min) }
    // recurrence CUSUM includes the implicit S_0 = 0 floor; the query
    // windows include the current row only, so align via min with 0
    assert(rec == dec)
  }

  test("q252: cusum bounds, mad, and alarm bookkeeping") {
    val rows = Catalog.byName("q252_cusum_chart").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_cusum_pos") >= 0L)
      assert(r.getAs[Long]("max_cusum_neg") >= 0L)
      assert(r.getAs[Long]("mad") >= 0L)
      val alarms = r.getAs[Long]("n_alarms")
      val firstDay = Option(r.getAs[String]("first_alarm_day"))
      assert((alarms > 0L) == firstDay.isDefined,
        s"alarm count/first-day inconsistent for ${r.getAs[String]("k")}")
    }
  }

  test("q253: fold produces a smoothed level inside the series envelope") {
    val rows = Catalog.byName("q253_ewma_chart").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Double]("ewma_final") > 0.0)
      assert(r.getAs[Double]("max_dev") >= 0.0)
      assert(r.getAs[Long]("n_alarms") <= math.max(0L, n - 1L))
    }
  }

  test("EWMA half-fold is the alpha=1/2 recurrence") {
    val xs = Seq(4.0, 8.0, 2.0)
    val es = xs.tail.scanLeft(xs.head)((e, x) => (e + x) / 2.0)
    assert(es == Seq(4.0, 6.0, 4.0))
  }

  test("q262: drops shrink as the watermark grows; shares bounded") {
    val rows = graft.queries.Catalog.byName("q262_lateness_audit")
      .run(spark, sf).collect().sortBy(_.getAs[Long]("watermark_sec"))
    assert(rows.map(_.getAs[Long]("watermark_sec")).toSeq ==
      Seq(0L, 60L, 300L, 3600L))
    val drops = rows.map(_.getAs[Long]("n_dropped"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val s = r.getAs[Double]("drop_share")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Long]("max_lateness_sec") >= 0L)
    }
  }

  test("q263: Selinger estimate is exact on PK-FK joins with containment") {
    val rows = graft.queries.Catalog.byName("q263_join_cardinality")
      .run(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // FK NDV <= PK count and referential integrity hold on TPC-H, so
      // |A||B|/max(d_A,d_B) collapses to the exact join size
      assert(r.getAs[Long]("estimated") == r.getAs[Long]("actual"),
        r.getAs[String]("join_name"))
      assert(r.getAs[Double]("est_over_actual") == 1.0)
      assert(r.getAs[Long]("d_l") <= r.getAs[Long]("d_r"))
    }
  }

  test("q265: weekly profile is complete and residuals are coherent") {
    val rows = graft.queries.Catalog.byName("q265_stl_decomposition")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("k")).foreach { case (k, rs) =>
      assert(rs.map(_.getAs[Int]("dow")).sorted.toSeq == (0 to 6),
        s"$k weekday profile incomplete")
      val mean = rs.head.getAs[Double]("residual_abs_mean")
      val mx = rs.head.getAs[Double]("residual_abs_max")
      assert(mean >= 0.0 && mx >= mean)
    }
  }

  test("q266: digit ledger is complete and pinned to log10(1+1/d)") {
    val rows = graft.queries.Catalog.byName("q266_benford_audit")
      .run(spark, sf).collect().sortBy(_.getAs[Int]("digit"))
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    var share = 0.0
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      val want = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getAs[Double]("benford_share") - want) < 1e-6)
      assert(r.getAs[Double]("chi2_term") >= 0.0)
      share += r.getAs[Double]("obs_share")
    }
    assert(math.abs(share - 1.0) < 1e-4)
  }

  /** The q252 centered daily series (cnt·D − total per event_type). */
  private def centered = {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type").as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val sized = daily.groupBy(col("k"))
      .agg(count(lit(1)).as("nd"), sum(col("cnt")).as("total"))
    daily.join(sized, Seq("k"))
      .select(col("k"), col("day"),
        (col("cnt") * col("nd") - col("total")).as("s_t"))
  }

  test("cusumStream: stream across batch cuts equals the window form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    import org.apache.spark.sql.types._
    val cent = centered
    // batch form: the q252 decomposition windows
    val wCum = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = cent
      .withColumn("ps", sum(col("s_t")).over(wCum))
      .select(col("k"), col("day"),
        (col("ps") - least(min(col("ps")).over(wCum), lit(0L))).as("cpos"),
        (greatest(max(col("ps")).over(wCum), lit(0L)) - col("ps"))
          .as("cneg"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    // stream form: split the series mid-way so every key's chart spans
    // the batch boundary and only state can continue it
    val dir = java.nio.file.Files.createTempDirectory("cusumstream").toString
    val cut = cent.agg(expr("percentile_approx(unix_timestamp(" +
      "to_date(day)), 0.5)")).head().getLong(0)
    cent.filter(unix_timestamp(to_date(col("day"))) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b0")
    cent.filter(unix_timestamp(to_date(col("day"))) > cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b1")
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("day", StringType), StructField("s_t", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*")
    val q = graft.streaming.EventStream
      .cusumStream(stream.as[graft.streaming.EventStream.CusumIn])
      .writeStream.outputMode("append")
      .format("memory").queryName("cusumout").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT k, day, cpos, cneg FROM cusumout")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("ewmaStream: levels across batch cuts are bit-identical to the fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.types._
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type").as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"))
    // batch: the exact scala fold per key in day order
    val batch = daily.as[(String, String, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        var e = 0.0; var seeded = false
        sorted.toSeq.map { case (_, day, cnt) =>
          val x = cnt.toDouble
          if (!seeded) { e = x; seeded = true; (k, day, e) }
          else { e = (e + x) / 2.0; (k, day, e) }
        }
      }.sorted
    val dir = java.nio.file.Files.createTempDirectory("ewmastream").toString
    val cut = daily.agg(expr(
      "percentile_approx(unix_timestamp(to_date(day)), 0.5)"))
      .head().getLong(0)
    daily.filter(unix_timestamp(to_date(col("day"))) <= cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b0")
    daily.filter(unix_timestamp(to_date(col("day"))) > cut)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b1")
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("day", StringType), StructField("cnt", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/b*")
    val q = graft.streaming.EventStream
      .ewmaStream(stream.as[graft.streaming.EventStream.EwmaIn])
      .writeStream.outputMode("append")
      .format("memory").queryName("ewmaout").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT k, day, ewma FROM ewmaout")
      .as[(String, String, Double)].collect().toSeq.sorted
    assert(batch.nonEmpty && streamed == batch)
  }

  test("q275/q276: robust trend stats cohere with the series size") {
    val mk = Catalog.byName("q275_mann_kendall").run(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ts = Catalog.byName("q276_theil_sen").run(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(mk.nonEmpty && mk.keySet == ts.keySet)
    mk.foreach { case (k, r) =>
      val n = r.getAs[Long]("n_days")
      val s = r.getAs[Long]("s_stat")
      // |S| is bounded by the pair count, and Theil-Sen saw exactly
      // that many pairwise slopes
      val pairs = n * (n - 1) / 2
      assert(math.abs(s) <= pairs)
      assert(ts(k).getAs[Long]("n_pairs") == pairs)
      assert(r.getAs[Double]("var_s") > 0.0)
      val z = r.getAs[Double]("z")
      val trend = r.getAs[String]("trend")
      assert(trend == (if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "no_trend"))
      // a strong positive z must come with a non-negative robust slope
      // (and vice versa) — the two trend readings cannot contradict
      val slope = ts(k).getAs[Double]("theil_sen_slope")
      if (z > 1.96) assert(slope >= 0.0)
      if (z < -1.96) assert(slope <= 0.0)
    }
  }

  test("q281: cumulative hazard is monotone and exp(-H) dominates KM") {
    val na = Catalog.byName("q281_nelson_aalen").run(spark, sf).collect()
      .map(r => r.getAs[Long]("duration_min") -> r).toMap
    assert(na.nonEmpty)
    var prev = 0.0
    na.toSeq.sortBy(_._1).foreach { case (_, r) =>
      val h = r.getAs[Double]("cum_hazard")
      assert(h >= prev, "hazard must be cumulative"); prev = h
      val s = r.getAs[Double]("fh_survival")
      assert(s > 0.0 && s <= 1.0)
    }
    // 1 - x <= e^-x termwise, so the Fleming-Harrington curve sits ON
    // OR ABOVE Kaplan-Meier at every event time (2e-6 rounding slack)
    val km = Catalog.byName("q240_km_retention").run(spark, sf).collect()
      .map(r => r.getAs[Long]("duration_min") -> r.getAs[Double]("survival"))
      .toMap
    assert(km.keySet == na.keySet)
    km.foreach { case (t, s) =>
      assert(na(t).getAs[Double]("fh_survival") >= s - 2e-6,
        s"FH below KM at t=$t")
    }
  }

  test("q282: log-rank bookkeeping coheres") {
    val r = Catalog.byName("q282_logrank_test").run(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_times") > 0)
    val o = r.getAs[Long]("o_a"); val e = r.getAs[Double]("e_a")
    val v = r.getAs[Double]("variance"); val z = r.getAs[Double]("z")
    assert(o >= 0 && e > 0.0 && v > 0.0)
    assert(math.abs(z - (o - e) / math.sqrt(v)) < 1e-3)
    assert(r.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
    // the hash split carries no causal signal: a huge |z| here would
    // mean the arithmetic broke, not that arm A behaves differently
    assert(math.abs(z) < 6.0, s"implausible log-rank z=$z on a null split")
  }

  test("q272: MASE is the exact MAE cross-ratio; errors are non-negative") {
    val rows = Catalog.byName("q272_forecast_backtest")
      .run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m1 = r.getAs[Double]("mae_naive")
      val m7 = r.getAs[Double]("mae_seasonal")
      assert(m1 >= 0.0 && m7 >= 0.0)
      Option(r.getAs[java.lang.Double]("mase")).foreach { mase =>
        assert(mase >= 0.0)
        // the reported MASE must agree with the two reported MAEs up
        // to their 1e-6 roundings
        if (m1 > 0) assert(math.abs(mase - m7 / m1) < 1e-3,
          s"mase=$mase vs ratio=${m7 / m1}")
      }
    }
  }
}
