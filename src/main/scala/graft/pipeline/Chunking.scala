package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Token-window document chunking (training-pipeline mandate — no
  * reference counterpart): split each document into fixed-size token
  * windows with overlap, the preprocessing step between corpus build
  * and tokenization for context-bounded training.
  *
  * Pure per-row array arithmetic — chunk boundaries derive from the
  * token array alone (scan-local; the explode multiplies rows by
  * ~n/stride, never shuffles). Chunk i covers tokens
  * [1 + i·stride, 1 + i·stride + size) with stride = size − overlap;
  * the final partial chunk is kept when it carries at least
  * `minTokens` tokens NOT already covered (i.e. chunks whose start is
  * past the previous chunk's end minus overlap — the ceil-count form
  * below encodes exactly that).
  */
object Chunking {

  /** Number of chunks for an n-token doc: 1 if n <= size, else
    * 1 + ceil((n - size) / stride). Integer arithmetic (no float
    * ceil), identical in the oracle. */
  private def nChunks(n: Column, size: Int, stride: Int): Column = {
    // exact integer division via (x - x mod s) / s — `/` on Columns is
    // double division, exact here because the numerator is divisible
    val num = (n - size + stride - 1).cast("long")
    when(n <= size, lit(1L))
      .otherwise(lit(1L) +
        ((num - pmod(num, lit(stride.toLong))) / stride).cast("long"))
  }

  /** Explode a document into (chunk_id, chunk_text, n_tok) rows.
    * `overlap` must be smaller than `size`. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size,
      s"overlap $overlap must be in [0, size=$size)")
    val stride = size - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks).cast("long")
    val pieces = transform(
      sequence(lit(0L), nChunks(n, size, stride) - 1),
      i => {
        val start = (i * stride + 1).cast("int")
        val piece = slice(toks, start, lit(size))
        struct(i.cast("int").as("chunk_id"),
          org.apache.spark.sql.functions.size(piece).as("n_tok"),
          array_join(piece, " ").as("chunk_text"))
      })
    df.select(col(idCol), explode(pieces).as("c"))
      .select(col(idCol), col("c.chunk_id").as("chunk_id"),
        col("c.n_tok").as("n_tok"), col("c.chunk_text").as("chunk_text"))
  }

  final case class Piece(group: String, ord: Long, id: Long, n_tok: Int)

  /** Sequential sequence packing — the step after chunking: walk each
    * group's chunks in `ord` order and open a new bin whenever the next
    * chunk would overflow `capacity` (how LLM training actually packs:
    * concatenate in order, cut at the context boundary). The recurrence
    * is inherently sequential per group, so it runs as a sorted fold in
    * `flatMapGroups` (the alert-throttle shape): per-group state is two
    * counters, groups (shards/splits) are the parallelism unit. Chunks
    * longer than `capacity` get a bin of their own (truncation is the
    * tokenizer's call, not the packer's). Input columns: group, ord,
    * id, n_tok; output adds bin and bin_fill. */
  def packSequential(chunks: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.select(col("group"), col("ord").cast("long"),
        col("id").cast("long"), col("n_tok").cast("int")).as[Piece]
      .groupByKey(_.group)
      .flatMapGroups { (g, it) =>
        val sorted = it.toSeq.sortBy(p => (p.ord, p.id))
        var bin = 0L
        var fill = 0
        sorted.iterator.map { p =>
          if (fill > 0 && fill + p.n_tok > capacity) { bin += 1; fill = 0 }
          fill += p.n_tok
          (g, p.ord, p.id, p.n_tok, bin, fill)
        }
      }
      .toDF("group", "ord", "id", "n_tok", "bin", "bin_fill")
  }

  /** DuckDB equivalent (oracle side): list of (chunk_id, n_tok, text)
    * structs to UNNEST. */
  object sql {
    def chunks(toks: String, size: Int, overlap: Int): String = {
      val stride = size - overlap
      val nc = s"(CASE WHEN len($toks) <= $size THEN 1 " +
        s"ELSE 1 + (len($toks) - $size + ${stride - 1}) // $stride END)"
      s"list_transform(range(0, $nc), i -> struct_pack(" +
        s"chunk_id := CAST(i AS INT), " +
        s"n_tok := CAST(len(($toks)[i*$stride+1:i*$stride+$size]) AS INT), " +
        s"chunk_text := array_to_string(($toks)[i*$stride+1:i*$stride+$size], ' ')))"
    }
  }
}
