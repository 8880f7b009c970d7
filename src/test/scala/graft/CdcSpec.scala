package graft

import org.apache.spark.sql.functions._
import graft.dedup.Cdc
import graft.functions.expressions.CdcCutsExpr

class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random ASCII text (LCG over a printable
    * alphabet) — varied enough that the hash residues actually fire. */
  private def synth(seed: Long, n: Int): String = {
    val alpha = "abcdefghijklmnopqrstuvwxyz QWERTYUIOP.,;:0123456789"
    val sb = new StringBuilder
    var x = seed
    for (_ <- 1 to n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb.append(alpha(((x >>> 33) % alpha.length).toInt))
    }
    sb.toString
  }

  /** Reference boundary rule, straight from the scaladoc formula. */
  private def refCuts(t: String): Seq[Int] = {
    val W = CdcCutsExpr.Window
    (W to t.length).filter { i =>
      val h = (0 until W).map(j =>
        (t.charAt(i - W + j).toLong & 0xff) * CdcCutsExpr.Pows(W - 1 - j)).sum
      h % CdcCutsExpr.Prime % CdcCutsExpr.Mask == 0L
    }
  }

  private val doc = synth(42L, 2000)

  test("cuts match the reference formula and average ~Mask chars apart") {
    val got = Seq(doc).toDF("text")
      .select(Cdc.cuts(col("text")).as("c"))
      .as[Seq[Int]].head()
    assert(got == refCuts(doc))
    assert(got.size > 10, s"only ${got.size} cuts in 2000 chars")
    val gaps = (got.head +: got.sliding(2).map(p => p(1) - p(0)).toSeq)
    assert(gaps.sum / gaps.size > 20 && gaps.sum / gaps.size < 200)
  }

  test("chunks reassemble to the document, in order") {
    val chunks = Cdc.chunks(
        Seq((1L, doc), (2L, synth(7L, 300)), (3L, "tiny")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("doc_id"), col("chunk_idx"), col("start"), col("chunk_len"))
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((id, text) <- Seq(1L -> doc, 2L -> synth(7L, 300), 3L -> "tiny")) {
      val cs = chunks(id)
      assert(cs.head._3 == 1)
      // contiguous: each chunk starts where the previous ended
      cs.sliding(2).foreach { case Array(a, b) =>
        assert(b._3 == a._3 + a._4); case _ => }
      assert(cs.map(_._4).sum == text.length)
    }
  }

  test("streaming incremental chunk index equals the batch dup count") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    // identity: Σ_batches (occurrences − hashes new to the index)
    //         = total occurrences − total distinct hashes,
    // independent of how the stream is micro-batched — the invariant
    // that makes the q202 chunk-hash index a correct incremental
    // artifact
    val corpus = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val srcDir = java.nio.file.Files.createTempDirectory("cdc-src").toString
    corpus.repartition(4).write.mode("overwrite").parquet(srcDir)

    val index = scala.collection.mutable.Set.empty[String]
    var dupOcc = 0L
    var batches = 0
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1
        val hs = Cdc.chunks(batch.toDF(), "doc_id", "text")
          .filter(col("chunk_len") >= 20)
          .select(col("chunk_hash")).as[String].collect()
        dupOcc += hs.count(h => !index.add(h))
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()

    val full = Cdc.chunks(corpus, "doc_id", "text")
      .filter(col("chunk_len") >= 20)
      .agg(count(lit(1)).as("n"), countDistinct(col("chunk_hash")).as("d"))
      .as[(Long, Long)].head()
    assert(batches > 2, s"expected several micro-batches, got $batches")
    assert(dupOcc == full._1 - full._2)
    assert(index.size == full._2)
  }

  test("boundaries are edit-local: a prefix insertion preserves tail chunk hashes") {
    val edited = "INSERTED PREFIX >> " + doc
    def hashes(t: String) = Cdc.chunks(Seq((1L, t)).toDF("doc_id", "text"),
        "doc_id", "text")
      .filter(col("chunk_len") >= 20)
      .select(col("chunk_hash")).as[String].collect().toSet
    val common = hashes(doc) intersect hashes(edited)
    // all chunks strictly after the first post-edit boundary realign
    assert(common.size >= hashes(doc).size / 2,
      s"only ${common.size} of ${hashes(doc).size} chunks survived the edit")
  }
}
