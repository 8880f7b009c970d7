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
}
