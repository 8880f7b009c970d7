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

  /** Build (or reuse) the session and register graft SQL functions. */
  def get(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession = {
    val spark = builder(appName, master, shufflePartitions).getOrCreate()
    GraftExtensions.register(spark)
    spark
  }
}
