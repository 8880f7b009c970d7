package graft

import org.apache.spark.sql.functions._
import graft.queries.SamplingQueries

/** q324's Jonckheere–Terpstra J, pinned against a brute-force pair
  * count — the property the oracle gate cannot see because both
  * engines share the census template. J = Σ_{i<j groups} [#(x_i <
  * x_j) + ½#(x_i = x_j)], computed here in half-units over every
  * cross-group value pair on toy data, including the sparse-bucket
  * shape that round 10's review showed the equality join undercounts
  * when a lower group has no census cell at a bucket.
  */
class JonckheereSpec extends SparkSpec {

  /** Brute-force 2·J over raw (group, value) observations. */
  private def bruteJHalf(obs: Seq[(Int, Long)]): Long =
    (for {
      (gi, vi) <- obs
      (gj, vj) <- obs
      if gi < gj
    } yield if (vi < vj) 2L else if (vi == vj) 1L else 0L).sum

  private def censusOf(obs: Seq[(Int, Long)]) = {
    import spark.implicits._
    obs.toDF("g", "v").groupBy("g", "v")
      .agg(count(lit(1)).as("c"))
  }

  private def jHalf(obs: Seq[(Int, Long)]): Long =
    SamplingQueries.jonckheereJHalf(censusOf(obs))
      .collect().head.getLong(0)

  test("sparse buckets: group with no cell at a bucket still credits its below-v count") {
    // The round-10 review's toy: g1 in buckets {0, 2}, g2 {1},
    // g3 {1, 3}. The pre-fix equality join read j_half = 2; the true
    // half-unit pair count is below.
    val obs = Seq((1, 0L), (1, 2L), (2, 1L), (3, 1L), (3, 3L))
    assert(jHalf(obs) == bruteJHalf(obs))
  }

  test("dense grid matches brute force") {
    val obs = for { g <- 1 to 3; v <- 0L to 4L } yield (g, v)
    assert(jHalf(obs) == bruteJHalf(obs))
  }

  test("randomized censuses match brute force") {
    val rng = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val obs = (1 to 40).map(_ => (1 + rng.nextInt(4), rng.nextInt(6).toLong))
      assert(jHalf(obs) == bruteJHalf(obs))
    }
  }

  test("perfect monotone ordering maximizes J") {
    // groups strictly ordered: every cross-group pair counts 2.
    val obs = Seq((1, 0L), (1, 1L), (2, 5L), (2, 6L), (3, 9L))
    assert(jHalf(obs) == bruteJHalf(obs))
    assert(jHalf(obs) == 2L * (2 * 2 + 2 * 1 + 2 * 1))
  }
}
