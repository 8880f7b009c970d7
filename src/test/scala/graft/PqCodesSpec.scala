package graft

import org.apache.spark.sql.functions._
import graft.semantic.VectorSearch

/** pqSearch must not assume codeword ids are dense 0-based — the
  * round-11 scale sweep broke exactly that (strided shard labels
  * overflowed the positional ADC lookup table). This pins the map-LUT
  * form: relabeling every code by an arbitrary stride+offset changes
  * NOTHING about the returned top-k (same vec_ids, same ADC
  * distances), because the codebook SET is identical up to renaming.
  */
class PqCodesSpec extends SparkSpec {

  test("pqSearch is invariant under code-id renaming (non-dense ids)") {
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint()
    val strided = emb.withColumn("label", col("label") * 1000 + 7)

    def run(e: org.apache.spark.sql.DataFrame) = {
      val books = VectorSearch.pqCodebooks(e, "label", m = 8, dim = 64)
      val encoded = VectorSearch.pqEncode(e, books, m = 8, dim = 64)
      val q = e.filter(col("vec_id") === 0).select(col("embedding"))
      VectorSearch.pqSearch(encoded, books, q, k = 10, m = 8, dim = 64)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }

    val dense = run(emb)
    val sparse = run(strided)
    assert(dense.nonEmpty, "expected a non-empty top-k")
    assert(dense == sparse,
      s"top-k changed under code renaming:\n dense=$dense\n sparse=$sparse")
  }

  test("pqSearch handles fewer non-empty subspaces than m (ceil-division)") {
    // m=4, dim=9 → dsub=3 → only subspaces 0..2 exist; an m-sized LUT
    // would carry a null hole that zip_with pads codes against, nulling
    // every adc_dist (round-11 review finding — latent at the m=8/dim=64
    // call sites, fatal at any dim not divisible into m groups)
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        slice(col("embedding"), 1, 9).as("embedding"))
      .localCheckpoint()
    val books = VectorSearch.pqCodebooks(emb, "label", m = 4, dim = 9)
    val encoded = VectorSearch.pqEncode(emb, books, m = 4, dim = 9)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
    val hits = VectorSearch.pqSearch(encoded, books, q, k = 5, m = 4, dim = 9)
      .collect()
    assert(hits.length == 5, s"expected 5 hits, got ${hits.length}")
    assert(hits.forall(!_.isNullAt(1)),
      "adc_dist is null — the LUT has a hole for a missing subspace")
  }
}
