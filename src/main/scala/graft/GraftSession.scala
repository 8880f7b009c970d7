package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the engine, in one place.
  *
  * The same settings scale from local[N] to a cluster: AQE owns runtime
  * re-planning (partition coalescing, skew-join splitting — the salting
  * in our similarity joins handles the key-skew AQE can't), shuffle
  * partition count tracks parallelism rather than the 200 default, and
  * graft's native SQL functions are registered up front.
  */
object GraftSession {

  def builder(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    master.map(b.master).getOrElse(b)
  }

  /** Silence the partitionless-window WARN for batch mains: every
    * catalog site that windows without a partition is a documented
    * metadata-/eval-bounded frame (pinned by PlanShapeSpec's window
    * allowlist), so the per-task WARN is pure noise — and in round 9
    * the spam displaced Bench's single stdout result line out of the
    * driver's tail buffer, recording a fully-green round as
    * unparseable. Spec/interactive sessions keep the default level. */
  def quietAuditedWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** Build (or reuse) the session and register graft SQL functions. */
  def get(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession = {
    val spark = builder(appName, master, shufflePartitions).getOrCreate()
    GraftExtensions.register(spark)
    spark
  }
}
