package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Mixing

/** Pins the mixture semantics: T=1 is the natural mixture, higher T
  * flattens toward uniform, quotas realize exactly (epochs+remainder),
  * and the selection is deterministic and stable across re-runs. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  // 60/30/10 skew over three sources
  private lazy val docs = (1 to 100).map { i =>
    val src = if (i <= 60) "big" else if (i <= 90) "mid" else "small"
    (i.toLong, src, s"text $i")
  }.toDF("doc_id", "source", "text")

  private def planMap(t: Double, budget: Long) =
    Mixing.plan(docs, "source", t, budget).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("T=1 reproduces natural proportions; higher T flattens") {
    val nat = planMap(1.0, 1000L)
    assert(nat("big")._1 == 0.6 && nat("mid")._1 == 0.3 &&
      nat("small")._1 == 0.1)
    val flat = planMap(100.0, 1000L)
    assert(flat("big")._1 < 0.40 && flat("small")._1 > 0.30)
    // order is preserved even as the gap narrows
    assert(flat("big")._1 > flat("mid")._1 &&
      flat("mid")._1 > flat("small")._1)
  }

  test("quota splits into full epochs plus a hash-ranked remainder") {
    val p = planMap(1.0, 1000L) // small: p=0.1 → quota 100 over 10 docs
    assert(p("small")._2 == 100L && p("small")._3 == 10L &&
      p("small")._4 == 0L)
    val m = Mixing.mix(docs, "source", "doc_id", 1.0, 1000L)
    val bySrc = m.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 600L, "mid" -> 300L, "small" -> 100L))
    // every small-source doc appears exactly 10 times
    val copies = m.filter(col("source") === "small")
      .groupBy("doc_id").count().select("count").distinct()
      .as[Long].collect().toSeq
    assert(copies == Seq(10L))
  }

  test("selection is deterministic across runs and salts re-deal") {
    def picks(salt: String) =
      Mixing.mix(docs, "source", "doc_id", 4.0, 90L, salt)
        .select("doc_id", "copy_n").collect().map(r => (r.getLong(0),
          r.getLong(1))).toSet
    assert(picks("") == picks(""))
    assert(picks("") != picks("reshuffle"))
  }

  test("sources rounding to zero copies drop out entirely") {
    // tiny budget: big dominates at T<1, small's quota rounds to 0
    val m = Mixing.mix(docs, "source", "doc_id", 0.3, 3L)
    assert(!m.select("source").distinct().as[String].collect()
      .contains("small"))
  }
}
