package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions
import graft.dedup.Dedup

/** The shared-hash-pass signature forms (round-12 verdict item 4: one
  * md5-per-token scan feeds both dedup catchers) must be pure plan
  * changes: bit-identical MinHash signatures and SimHash values to the
  * original per-leg forms, on real corpus text. */
class SignatureParitySpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"), col("source")).limit(500)

  test("minhashSignatureFromHashes == the distinct-token form") {
    // the original form: distinct TOKENS then hash; the shared form:
    // hash (dups kept) then array_distinct — multiplicity-blind under
    // array_min, so the signatures must match slot for slot
    val k = 12
    val orig = docs.select(col("doc_id"),
      transform(sequence(lit(0), lit(k - 1)), i => array_min(transform(
        transform(TextFunctions.distinctTokens(col("text")),
          w => TextFunctions.md5Long(w) % TextFunctions.minhashMod),
        h => (h * TextFunctions.minhashA(i) + i) % TextFunctions.minhashMod)))
        .as("sig"))
    val shared = docs.select(col("doc_id"),
      TextFunctions.minhashSignatureFromHashes(
        TextFunctions.tokenHashes(col("text")), k).as("sig"))
    val a = orig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = shared.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("simhash16FromHashes == the explode/groupBy form") {
    val exploded = Dedup.simhash16(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs.select(col("doc_id"),
        TextFunctions.simhash16FromHashes(
          TextFunctions.tokenHashes(col("text"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exploded.nonEmpty && perRow == exploded)
  }

  test("signatures drops null-text docs like the legacy explode paths") {
    // ADVICE r13: the per-row SimHash degrades a null token array to
    // simhash 0 while the explode forms emit no rows for it — the
    // index pins the legacy DROP semantics via a null filter. Empty
    // text is kept by BOTH paths (split("", " ") is one "" token).
    import spark.implicits._
    val d = Seq((1L, "alpha beta", "s"), (2L, null, "s"), (3L, "", "s"))
      .toDF("doc_id", "text", "source")
    val legacy = Dedup.simhash16(d, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val indexed = d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.text.TextFunctions.simhash16FromHashes(
          graft.text.TextFunctions.tokenHashes(col("text"))).as("simhash"))
    val ids = indexed.collect().map(_.getLong(0)).toSet
    assert(legacy == Set(1L, 3L) && ids == legacy)
    // and the kept rows still agree value-for-value
    val lv = Dedup.simhash16(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iv = indexed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lv == iv)
  }
}
