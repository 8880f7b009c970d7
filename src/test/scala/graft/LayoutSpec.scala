package graft

import org.apache.spark.sql.functions._
import graft.queries.Catalog

/** Pins for the data-layout advisors (q242/q243): the DuckDB oracle
  * proves cross-engine equality; these pin the physical-design
  * semantics — that the metrics actually discriminate a clustered
  * column from a scattered one, and that Morton order balances both
  * dimensions where single-key sorts forfeit one.
  */
class LayoutSpec extends SparkSpec {

  test("q242: depth bounds hold; time clusters under arrival order, user ids don't") {
    val rows = Catalog.byName("q242_clustering_depth").run(spark, sf)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.keySet == Set("sec", "user_id"))
    rows.values.foreach { r =>
      val n = r.getAs[Long]("n_chunks")
      val avg = r.getAs[Double]("avg_depth")
      val mx = r.getAs[Long]("max_depth")
      assert(n > 1, "need >1 chunk for the audit to mean anything")
      assert(avg >= 1.0 - 1e-9 && avg <= n.toDouble)
      assert(mx >= 1 && mx <= n)
    }
    // event_id order is ~arrival order: ts is clustered, user_id scattered
    val secDepth = rows("sec").getAs[Double]("avg_depth")
    val uidDepth = rows("user_id").getAs[Double]("avg_depth")
    assert(secDepth < uidDepth,
      s"expected time clustered under arrival order: sec=$secDepth uid=$uidDepth")
    assert(uidDepth > 0.5 * rows("user_id").getAs[Long]("n_chunks"),
      s"user_id should be near-fully scattered, got $uidDepth")
  }

  test("q243: single-key sorts win their own dimension; zorder balances both") {
    val rows = Catalog.byName("q243_zorder_layout").run(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("natural", "by_user", "zorder"))
    rows.values.foreach { r =>
      Seq("avg_user_span", "avg_sec_span").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v > 0.0 && v <= 1.0 + 1e-9, s"${r.getAs[String]("layout")}.$c=$v")
      }
    }
    def span(l: String, c: String) = rows(l).getAs[Double](c)
    // each single-key layout wins its own dimension...
    assert(span("by_user", "avg_user_span") < span("natural", "avg_user_span"))
    assert(span("natural", "avg_sec_span") < span("by_user", "avg_sec_span"))
    // ...and zorder's WORSE dimension beats each single-key layout's
    // worse dimension (the balanced-pruning property)
    val zWorst = math.max(span("zorder", "avg_user_span"),
      span("zorder", "avg_sec_span"))
    val natWorst = math.max(span("natural", "avg_user_span"),
      span("natural", "avg_sec_span"))
    val userWorst = math.max(span("by_user", "avg_user_span"),
      span("by_user", "avg_sec_span"))
    assert(zWorst < natWorst && zWorst < userWorst,
      s"zorder worst $zWorst vs natural $natWorst / by_user $userWorst")
  }

  test("q244: bloom accounting closes and the filter actually filters") {
    val r = Catalog.byName("q244_bloom_filter_audit").run(spark, sf)
      .collect().head
    val m = r.getAs[Long]("m_bits")
    val bits = r.getAs[Long]("bits_set")
    val nBuild = r.getAs[Long]("n_build")
    val k = r.getAs[Long]("k_hashes")
    assert(bits > 0 && bits <= math.min(m, nBuild * k))
    val nProbe = r.getAs[Long]("n_probe")
    val nNon = r.getAs[Long]("n_nonmatch")
    val fp = r.getAs[Long]("n_false_pass")
    assert(nNon <= nProbe && fp <= nNon)
    val fpr = r.getAs[Double]("measured_fpr")
    val est = r.getAs[Double]("est_fpr")
    assert(fpr >= 0.0 && fpr <= 1.0 && est >= 0.0 && est <= 1.0)
    // the filter must beat "pass everything" on non-matching keys and
    // the fill-based estimate should be in the measured ballpark
    assert(fpr < 0.9, s"useless filter: fpr=$fpr")
    assert(math.abs(fpr - est) < 0.2, s"measured $fpr vs estimated $est")
  }

  test("q247: advisor identities — widths positive, ceilings consistent") {
    val rows = Catalog.byName("q247_partition_advisor").run(spark, sf)
      .collect()
    assert(rows.map(_.getAs[String]("tbl")).toSet ==
      Set("documents", "events", "embeddings", "lineitem"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val b = r.getAs[Long]("total_bytes")
      val scanP = r.getAs[Long]("scan_partitions")
      val shufP = r.getAs[Long]("shuffle_partitions")
      assert(n > 0 && b > n, s"${r.getAs[String]("tbl")}: b=$b n=$n")
      assert(scanP == (b + 128L * 1024 * 1024 - 1) / (128L * 1024 * 1024))
      assert(shufP == (b + 64L * 1024 * 1024 - 1) / (64L * 1024 * 1024))
      assert(shufP >= scanP) // smaller target can't need fewer partitions
      val avg = r.getAs[Double]("avg_row_bytes")
      assert(math.abs(avg - b.toDouble / n) < 5e-6)
    }
  }

  test("morton interleave: hand-checked bit patterns") {
    import spark.implicits._
    // via the catalog path is indirect; check the bit math directly with
    // the same expression shape the query builds (4 bits per dim)
    val df = Seq((15L, 0L), (0L, 15L), (3L, 3L), (0L, 0L))
      .toDF("zu", "zt")
    val z = (0 until 4).map { i =>
      shiftleft(shiftright(col("zu"), i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(col("zt"), i).bitwiseAND(1), 2 * i))
    }.reduce(_.bitwiseOR(_))
    val got = df.select(z.as("z")).as[Long].collect().toSeq
    assert(got == Seq(170L, 85L, 15L, 0L)) // 10101010, 01010101, 00001111
  }
}
