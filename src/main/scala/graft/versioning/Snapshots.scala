package graft.versioning

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot / backup / revert (reference versioning/revision_manager
  * .py:197-288, :322-400 and migration/backup_manager.py:134-311).
  *
  * The reference serializes the whole graph into a JSON blob stored as a
  * vertex; at scale a snapshot is a parquet-materialized, id-tagged copy
  * of the node/edge tables plus a tiny manifest — the lakehouse form of
  * the same contract (create / list / restore / verify). Restore is a
  * partitioned read, not a driver-side deserialization.
  *
  * Layout: `<dir>/<snapshotId>/nodes`, `<dir>/<snapshotId>/edges`,
  * `<dir>/<snapshotId>/manifest` (1-row: id, timestamp, counts,
  * checksum). The checksum is an order-independent distributed hash
  * (sum of per-row xxhash64 over all columns) — the scale analog of
  * backup_manager.py's file checksum (:184-198), verifiable without
  * collecting either table.
  */
object Snapshots {

  /** (rows, checksum) in ONE pass: decimal-sum of per-row xxhash64 (an
    * ANSI long sum overflows) folded back to a long — order-independent
    * and overflow-free. */
  private def countAndChecksum(df: DataFrame): (Long, Long) = {
    val hashed = df.select(
      xxhash64(df.columns.toIndexedSeq.map(c => col(c).cast("string")): _*).as("h"))
    val row = hashed.agg(
      count(lit(1)).as("n"),
      (sum(col("h").cast("decimal(38,0)")) % lit(Long.MaxValue))
        .cast("long").as("c"))
      .head()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1)) // empty → 0
  }

  /** Create a tagged snapshot (revision_manager.py:197-236 /
    * backup_manager.py:134-198). Returns the manifest row. */
  def create(nodes: DataFrame, edges: DataFrame, dir: String,
      snapshotId: String, timestamp: Long): DataFrame = {
    val spark = nodes.sparkSession
    nodes.write.mode("overwrite").parquet(s"$dir/$snapshotId/nodes")
    edges.write.mode("overwrite").parquet(s"$dir/$snapshotId/edges")
    val (nN, nC) = countAndChecksum(spark.read.parquet(s"$dir/$snapshotId/nodes"))
    val (eN, eC) = countAndChecksum(spark.read.parquet(s"$dir/$snapshotId/edges"))
    import spark.implicits._
    val manifest = Seq((snapshotId, timestamp, nN, eN, nC, eC))
      .toDF("snapshot_id", "timestamp", "n_nodes", "n_edges",
        "nodes_checksum", "edges_checksum")
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$snapshotId/manifest")
    manifest
  }

  /** All snapshot manifests, newest first (revision_manager.py:237-258 /
    * backup_manager.py:286-289). An existing-but-empty snapshot dir
    * returns an empty manifest frame (the reference's empty-list
    * behavior) instead of a path-not-found AnalysisException. */
  def list(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long, Long, Long, Long)]
      .toDF("snapshot_id", "timestamp", "n_nodes", "n_edges",
        "nodes_checksum", "edges_checksum")
    try spark.read.parquet(s"$dir/*/manifest")
      .orderBy(col("timestamp").desc, col("snapshot_id"))
    catch {
      // glob matched nothing: no snapshots yet (or no dir at all)
      case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "PATH_NOT_FOUND" => empty
    }
  }

  /** Restore a snapshot's tables (revision_manager.py:260-288 /
    * backup_manager.py:226-284). */
  def restore(spark: SparkSession, dir: String,
      snapshotId: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/$snapshotId/nodes"),
      spark.read.parquet(s"$dir/$snapshotId/edges"))

  /** Verify a snapshot against its manifest (backup checksum check,
    * backup_manager.py:226-254): recompute counts + checksums and
    * compare. Returns true when everything matches. */
  def verify(spark: SparkSession, dir: String, snapshotId: String): Boolean = {
    val (n, e) = restore(spark, dir, snapshotId)
    val m = spark.read.parquet(s"$dir/$snapshotId/manifest").head()
    val (nN, nC) = countAndChecksum(n)
    val (eN, eC) = countAndChecksum(e)
    m.getAs[Long]("n_nodes") == nN && m.getAs[Long]("n_edges") == eN &&
      m.getAs[Long]("nodes_checksum") == nC &&
      m.getAs[Long]("edges_checksum") == eC
  }

  /** Batch revert-to-previous-state (revision_manager.py:322-362): given
    * a revision log with one row per (object, change) carrying the
    * object's post-change values, each object's reverted state is the
    * SECOND-most-recent revision's values; objects with fewer than two
    * revisions keep their current state (`reverted = false`), exactly the
    * reference's not-enough-revisions refusal. The reference loops
    * per-object over queried revisions; here one window pass computes
    * every object's revert at once.
    *
    * Ordering inside an object is (tsCol desc, tieCol desc) — the
    * reference sorts revisions by timestamp descending (:307-308).
    * Returns one row per object: current and reverted values per value
    * column, plus the `reverted` action flag (the reference's revert-log
    * entry, :350-357). */
  def revertToPrevious(revisions: DataFrame, idCol: String, tsCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "revertToPrevious needs at least one value column")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val withPrev = valueCols.foldLeft(
      revisions
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_ts", lead(col(tsCol), 1).over(w))) { (df, v) =>
      df.withColumn(s"__prev_$v", lead(col(v), 1).over(w))
    }
    val reverted = col("prev_ts").isNotNull
    val outCols = Seq(col(idCol)) ++ valueCols.flatMap { v =>
      Seq(col(v).as(s"cur_$v"),
        when(reverted, col(s"__prev_$v")).otherwise(col(v)).as(s"reverted_$v"))
    } :+ reverted.as("reverted")
    withPrev.filter(col("rn") === 1).select(outCols: _*)
  }
}
