package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. The driver hash-compares the two at sf0.01
  * (BASELINE.md "t2"), sorting columns by name — so every computed
  * column is aliased identically on both sides.
  *
  * `headline` marks the queries Bench times at sf0.1.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

object Catalog {
  /** Ordered inventory — one entry per operator family of SURVEY.md §2. */
  lazy val all: Seq[Q] =
    RelationalQueries.qs ++
      GraphQueries.qs ++
      SimilarityQueries.qs ++
      VectorQueries.qs ++
      TemporalQueries.qs ++
      TextQueries.qs ++
      DedupQueries.qs ++
      AnalyticsQueries.qs ++
      StatsQueries.qs ++
      SynthesisQueries.qs ++
      MutationQueries.qs ++
      MultimodalQueries.qs ++
      StreamingQueries.qs ++
      InsightQueries.qs ++
      QualityQueries.qs ++
      MonitoringQueries.qs ++
      SamplingQueries.qs ++
      SecurityQueries.qs ++
      CurationQueries.qs ++
      GraphAnalyticsQueries.qs ++
      LayoutQueries.qs ++
      SketchQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
