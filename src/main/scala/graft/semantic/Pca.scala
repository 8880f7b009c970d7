package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Dominant-direction analysis of an embedding column (builder mandate):
  * the top principal direction of the centered embedding cloud by
  * fixed-iteration POWER ITERATION, plus the share of total variance it
  * explains — the report behind "all-but-the-top" embedding
  * post-processing (Mu & Viswanath 2018), which decides whether a
  * corpus's embeddings are dominated by one nuisance direction before
  * they are used for retrieval or clustering.
  *
  * The covariance matrix is NEVER materialized: each iteration computes
  * per-vector projections d_i = (x_i − μ)·v and accumulates
  * w = Σ d_i·(x_i − μ) — one linear scan per iteration with a
  * dim-bounded aggregate, the matrix-free power step.
  *
  * Determinism contract: μ uses exact milli-unit integer sums (the
  * KMeans quantization); every per-(vector, dim) contribution to w is
  * quantized to micro-units before the integer sum, so accumulation
  * order cannot drift; dot products and norms fold in index order (the
  * oracle-green q19/q21 parity). Normalization divides by a norm
  * derived from the same integers, so v re-enters the next iteration
  * bit-identical cross-engine.
  */
object Pca {

  /** Exact milli-unit mean vector of `vecCol` as a 1-row frame (mu). */
  def meanVector(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("pos"))
      .agg(sum(round(col("col") * lit(1000), 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("m", col("s") / (lit(1000.0) * col("n")))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), x => x("m")).as("mu"))

  private def centered(vecCol: String): Column =
    zip_with(col(vecCol).cast("array<double>"), col("mu"), (a, b) => a - b)

  /** One matrix-free power step: unnormalized w as a 1-row (w) frame of
    * micro-unit-exact doubles, from the current direction frame (v). */
  def powerStep(vecs: DataFrame, vecCol: String, mu: DataFrame,
      v: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(mu)).crossJoin(broadcast(v))
      .select(VectorFunctions.dot(centered(vecCol), col("v")).as("d"),
        posexplode(centered(vecCol)))
      .groupBy(col("pos"))
      .agg(sum(round(col("col") * col("d") * lit(1000000), 0).cast("long"))
        .as("s"))
      .withColumn("w", col("s") / lit(1000000.0))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(transform(col("pw"), x => x("w")).as("w"))

  /** Normalize a 1-row (w) frame into a unit 1-row (v) frame. */
  def normalized(w: DataFrame): DataFrame =
    w.select(col("w"),
        sqrt(aggregate(col("w"), lit(0.0d), (acc, x) => acc + x * x))
          .as("nrm"))
      .select(transform(col("w"), x => x / col("nrm")).as("v"))

  /** `iterations` power steps from the uniform seed 1/√dim; returns the
    * 1-row (v) unit-direction frame. */
  def topDirection(vecs: DataFrame, vecCol: String, mu: DataFrame,
      dim: Int, iterations: Int): DataFrame = {
    var v = vecs.sparkSession.range(1)
      .select(transform(sequence(lit(1), lit(dim)),
        _ => lit(1.0) / sqrt(lit(dim.toDouble))).as("v"))
    for (_ <- 1 to iterations)
      v = normalized(powerStep(vecs, vecCol, mu, v))
    v
  }

  /** Variance share along `v`: Σ d_i² / Σ ‖x−μ‖², micro-unit exact. */
  def varianceShare(vecs: DataFrame, vecCol: String, mu: DataFrame,
      v: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(mu)).crossJoin(broadcast(v))
      .select(VectorFunctions.dot(centered(vecCol), col("v")).as("d"),
        VectorFunctions.dot(centered(vecCol), centered(vecCol)).as("ss"))
      .agg(sum(round(col("d") * col("d") * lit(1000000), 0).cast("long"))
          .as("top"),
        sum(round(col("ss") * lit(1000000), 0).cast("long")).as("tot"),
        count(lit(1)).as("n"))
      .select(col("n"), (col("top") * lit(1.0) / col("tot"))
        .as("var_share"))
}
