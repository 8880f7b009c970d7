package graft

import graft.pipeline.Chunking

/** Pins the chunking arithmetic: coverage with overlap, the short-doc
  * single chunk, the one-new-token boundary, and the overlap guard. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")

  private def chunksOf(n: Int, size: Int, overlap: Int) =
    Chunking.chunk(doc(n), "doc_id", "text", size, overlap)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))

  test("overlapping windows cover the doc; boundaries are exact") {
    val c = chunksOf(100, size = 10, overlap = 2) // stride 8
    // 1 + ceil(90/8) = 13 chunks; last starts at token 97 -> 4 tokens
    assert(c.length == 13)
    assert(c.head._3.startsWith("t1 t2") && c.head._2 == 10)
    assert(c(1)._3.startsWith("t9 t10")) // overlap of 2: restarts at 9
    assert(c.last == ((12, 4, "t97 t98 t99 t100")))
  }

  test("short docs give one whole chunk; one extra token adds a chunk") {
    assert(chunksOf(10, 10, 2).toSeq == Seq((0, 10,
      (1 to 10).map(i => s"t$i").mkString(" "))))
    val c = chunksOf(11, 10, 2)
    assert(c.length == 2 && c.last._2 == 3) // tokens 9,10,11
  }

  test("packSequential cuts bins at the capacity boundary, per group") {
    import org.apache.spark.sql.functions.col
    val chunks = Seq(
      ("a", 0L, 1L, 60), ("a", 1L, 2L, 30), ("a", 2L, 3L, 20),
      ("a", 3L, 4L, 90),   // alone: 90 fits a fresh 100-bin
      ("a", 4L, 5L, 120),  // oversized: bin of its own
      ("a", 5L, 6L, 10),
      ("b", 0L, 7L, 100))  // group b: independent state
      .toDF("group", "ord", "id", "n_tok")
    val out = Chunking.packSequential(chunks, capacity = 100)
      .orderBy(col("group"), col("ord"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4), r.getInt(5)))
    assert(out.toSeq == Seq(
      ("a", 1L, 0L, 60), ("a", 2L, 0L, 90),  // 60+30 fits
      ("a", 3L, 1L, 20),                     // +20 would pass 100 -> new bin
      ("a", 4L, 2L, 90),
      ("a", 5L, 3L, 120),                    // oversized alone
      ("a", 6L, 4L, 10),                     // oversized bin is full -> next
      ("b", 7L, 0L, 100)))
  }

  test("overlap must be smaller than size") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(doc(5), "doc_id", "text", size = 4, overlap = 4)
    }
  }
}
