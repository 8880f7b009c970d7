package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import graft.functions.expressions.CdcCutsExpr

/** Content-defined chunking (CDC): split documents at content-local
  * hash boundaries ([[CdcCutsExpr]]) and fingerprint each chunk — the
  * block-level dedup mode (storage-dedup heritage: LBFS/rsync family)
  * that catches SHARED PASSAGES between otherwise-distinct documents,
  * where document-level MinHash (q28) sees low global similarity and
  * fixed token windows (q117) lose alignment after any edit.
  *
  * Scale shape: boundary detection and chunk hashing are one
  * scan-local pass per document (the codegen expression); the explode
  * fans out ~n_chars/64 chunk rows per doc; everything downstream is
  * keyed on chunk_hash — one aggregate, no pairwise comparison
  * anywhere. The chunk-hash frame is the reusable index artifact: an
  * incremental run hashes only the new batch and joins against it.
  */
object Cdc {

  /** Ascending cut end-positions (1-based) — see [[CdcCutsExpr]]. */
  def cuts(text: Column): Column =
    GraftBridge.column(CdcCutsExpr(GraftBridge.expression(text)))

  /** Explode documents into content-defined chunks:
    * (id, chunk_idx, start, chunk_len, chunk_hash). Chunk k spans
    * [start, start+chunk_len); the trailing piece after the last cut is
    * kept when non-empty, so chunks reassemble to the document. */
  def chunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val cutsArr = cuts(t)
    val starts = concat(array(lit(1)), transform(cutsArr, c => c + 1))
    val ends = concat(cutsArr, array(length(t)))
    df.select(col(idCol), t.as("__t"),
        posexplode(zip_with(starts, ends,
          (s, e) => struct(s.as("s"), (e - s + 1).as("len")))))
      .filter(col("col.len") > 0)
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.s").as("start"), col("col.len").as("chunk_len"),
        md5(col("__t").substr(col("col.s"), col("col.len"))).as("chunk_hash"))
  }

  /** DuckDB mirrors (oracle side) — the identical boundary arithmetic,
    * unrolled term by term. `t` is the text column expression. */
  object sql {
    import CdcCutsExpr.{Mask, Prime, Window, Pows}

    /** Ascending cut list for `t` (chars are single-byte by the corpus
      * contract, so character positions equal the expression's byte
      * positions). */
    def cuts(t: String): String = {
      // ord() is INT32 and the low powers fit INT32 too — without the
      // BIGINT cast DuckDB multiplies in 32-bit and overflows
      val terms = (0 until Window).map { j =>
        s"CAST(ord(substr($t, i - ${Window - 1 - j}, 1)) AS BIGINT) * " +
          s"${Pows(Window - 1 - j)}"
      }.mkString(" + ")
      s"list_filter(range($Window, length($t) + 1), " +
        s"i -> (($terms) % $Prime) % $Mask = 0)"
    }

    /** CTE body producing (doc_id, chunk_idx, start, chunk_len,
      * chunk_hash) from `documents` — the twin of [[Cdc.chunks]]. */
    val chunksCtes: String = {
      val c = cuts("text")
      s"""cdc AS (
         |  SELECT doc_id, text,
         |    list_prepend(1, list_transform($c, x -> x + 1)) AS starts,
         |    list_append($c, length(text)) AS ends
         |  FROM documents),
         |chunks AS (
         |  SELECT doc_id, k - 1 AS chunk_idx,
         |    starts[k] AS start, ends[k] - starts[k] + 1 AS chunk_len,
         |    md5(substr(text, starts[k], ends[k] - starts[k] + 1))
         |      AS chunk_hash
         |  FROM cdc, unnest(range(1, len(starts) + 1)) r(k)
         |  WHERE ends[k] - starts[k] + 1 > 0)""".stripMargin
    }
  }
}
