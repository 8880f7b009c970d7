package graft

import org.apache.spark.sql.functions._
import graft.queries.{Catalog, LayoutQueries}

/** q331's unrolled Hilbert walk — the oracle can't catch an algorithmic
  * bug here because BOTH engines run the same generated template, so
  * this spec pins the curve's DEFINING properties on the full 16×16
  * grid (independent of any table): it is a bijection onto [0, 256)
  * and every consecutive pair of cells is Manhattan-adjacent (jump
  * exactly 1 — the locality guarantee Morton lacks; a full Morton grid
  * averages 1.88). Validated once against the textbook xy2d
  * (Wikipedia's C loop) during development; this keeps it true.
  */
class HilbertCurveSpec extends SparkSpec {

  test("hilbert index is a bijection with unit Manhattan steps") {
    import spark.implicits._
    val grid = (0L until 16L).flatMap(x => (0L until 16L).map(y =>
      (x, y))).toDF("x", "y")
    val idx = LayoutQueries.hilbertIndex(
      grid.withColumn("zu", col("x")).withColumn("zt", col("y")),
      Seq("zu", "zt"))
      .select(col("d"), col("zu"), col("zt"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(idx.size == 256, "not a bijection: duplicate d values")
    assert(idx.keys.min == 0L && idx.keys.max == 255L)
    val jumps = (0L until 255L).map { d =>
      val (x1, y1) = idx(d); val (x2, y2) = idx(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }
    assert(jumps.forall(_ == 1L),
      s"non-adjacent consecutive cells at d = ${jumps.zipWithIndex
        .filter(_._1 != 1L).map(_._2).take(5).mkString(",")}")
  }

  test("q331: hilbert beats zorder on mean jump over the events grid") {
    val rows = Catalog.byName("q331_hilbert_layout").run(spark, sf)
      .collect().map(r => r.getAs[String]("layout") ->
        r.getAs[Double]("mean_jump")).toMap
    assert(rows.keySet == Set("zorder", "hilbert"))
    assert(rows("hilbert") <= rows("zorder"),
      s"hilbert ${rows("hilbert")} should not jump farther than " +
        s"zorder ${rows("zorder")}")
  }
}
