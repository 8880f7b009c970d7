package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Sketch-audit invariants (q250 HLL, q251 count-min). */
class SketchSpec extends SparkSpec {

  test("q250: register partition identity and HLL error envelope") {
    val rows = Catalog.byName("q250_hll_distinct").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the monoid law: per-day max-merged registers == direct registers
      assert(r.getAs[Boolean]("merge_consistent"),
        s"merge mismatch for ${r.getAs[String]("event_type")}")
      val active = r.getAs[Long]("active_registers")
      val zero = r.getAs[Long]("zero_registers")
      assert(active + zero == 256L)
      assert(active > 0L)
      // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma plus the
      // uncorrected small-range bias visible through zero_registers
      val relErr = math.abs(r.getAs[Double]("rel_err"))
      assert(relErr < 0.30, s"rel_err $relErr out of envelope")
      assert(r.getAs[Double]("hll_estimate") > 0.0)
    }
  }

  test("q251: count-min never undercounts and bounds hold at sketch width") {
    val rows = Catalog.byName("q251_cms_heavy_hitters").run(spark, sf).collect()
    assert(rows.nonEmpty, "expected heavy hitters at cnt*2000 >= total")
    rows.foreach { r =>
      val t = r.getAs[Long]("true_cnt")
      val e = r.getAs[Long]("cms_est")
      assert(e >= t, s"CMS undercounted ${r.getAs[String]("token")}: $e < $t")
      assert(r.getAs[Long]("overcount") == e - t)
    }
    // d=4 rows of w=1024: expected overcount N/1024 per row; the min of
    // four should keep at least one heavy hitter inside the 2N/w bound
    assert(rows.exists(_.getAs[Boolean]("within_bound")))
  }

}
