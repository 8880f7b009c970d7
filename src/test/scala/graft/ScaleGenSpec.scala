package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.semantic.SimilarityJoins

/** The sf1.0 scale-proof (BENCH_NOTES.md) rests on ScaleGen's shard
  * invariants — this spec makes them checkable instead of asserted:
  * fact tables grow by the factor while dims stay fixed, key spaces are
  * disjoint, within-shard text similarity structure is EXACTLY the
  * base's (injective token rename), and the per-shard embedding
  * transform is orthogonal (norms bit-preserved). */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.generate(spark, sf, dir, factor = 2)
    dir
  }

  test("fact tables scale by the factor, shared dims stay fixed") {
    for (t <- Seq("documents", "events", "lineitem", "embeddings"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ===
        2 * Tables.load(spark, sf, t).count(), t)
    for (t <- Seq("nation", "region"))
      assert(spark.read.parquet(s"$out/$t.parquet").count() ===
        Tables.load(spark, sf, t).count(), t)
  }

  test("shard key spaces and token spaces are disjoint") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() === docs.count())
    val toks = docs
      .withColumn("shard", (col("doc_id") / 10000000L).cast("int"))
      .select(col("shard"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(countDistinct(col("shard")).as("n_shards"))
    assert(toks.filter(col("n_shards") > 1).count() === 0)
  }

  test("within-shard Jaccard pairs equal the base corpus exactly") {
    val base = SimilarityJoins.tokenJaccardJoin(
        Tables.load(spark, sf, "documents"), "source", "text", 0.5)
      .select(col("a_id"), col("b_id"), col("sim"))
      .as[(Long, Long, Double)].collect().toSet
    val shard1 = SimilarityJoins.tokenJaccardJoin(
        spark.read.parquet(s"$out/documents.parquet")
          .filter(col("doc_id") >= 10000000L), "source", "text", 0.5)
      .select(col("a_id") - 10000000L, col("b_id") - 10000000L, col("sim"))
      .as[(Long, Long, Double)].collect().toSet
    assert(shard1 === base)
    assert(base.nonEmpty)
  }

  test("per-shard embedding transform is orthogonal (norms preserved exactly)") {
    val norm = aggregate(col("embedding").cast("array<double>"),
      lit(0.0), (acc, x) => acc + x * x)
    val base = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), norm.as("n0"))
    val shard1 = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"), norm.as("n1"))
    val diff = base.join(shard1, "vec_id")
      .filter(col("n0") =!= col("n1")).count()
    assert(diff === 0)
  }

  test("chaining ScaleGen on its own output refuses (stride collision)") {
    // shard-0 validation sees the chained base's ≥10M ids and refuses
    val err = intercept[IllegalArgumentException] {
      ScaleGen.shard(spark, out, "documents", 0).count()
    }
    assert(err.getMessage.contains("stride"))
  }
}
