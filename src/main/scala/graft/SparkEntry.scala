package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.queries.Catalog; this object is
  * the thin adapter the driver invokes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's primary path (query_engine.py:334-373): semantic
    * top-k → node detail lookup → ranking scores → ordered response.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val docs = Tables.load(spark, dir, "documents")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
    val topk = graft.semantic.VectorSearch.topK(emb, qv, 20)
    topk.join(docs, topk("vec_id") === docs("doc_id"))
      .withColumn("quality",
        graft.text.TextFunctions.qualityScore(col("text"), col("n_chars")))
      .withColumn("combined", graft.operators.Ranking.combine(Seq(
        (col("sim"), 0.6), (col("quality"), 0.2),
        (graft.text.TextFunctions.lengthScore(col("n_chars")), 0.2))))
      .select(col("doc_id"), col("source"), col("sim"), col("quality"),
        col("combined"))
      .orderBy(col("combined").desc, col("doc_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
