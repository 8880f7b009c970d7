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

  test("overlap must be smaller than size") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(doc(5), "doc_id", "text", size = 4, overlap = 4)
    }
  }
}
