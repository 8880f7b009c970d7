package graft.semantic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Fixed-iteration Lloyd k-means over an embedding column (builder
  * mandate — the corpus-topology map a training pipeline builds to
  * inspect cluster balance, and the same centroid-training loop that
  * seeds the IVF index family in VectorSearch). Deterministic by
  * construction: seeds are the first k vectors by id, distances are
  * index-ordered folds, and every centroid coordinate is an exact
  * integer milli-unit mean, so there is no run-to-run or cross-engine
  * drift anywhere in the iteration.
  *
  * Scale shape: per iteration, ONE broadcast of the k-row centroid
  * frame onto a linear candidate scan (k·n assignment rows — the
  * standard distributed Lloyd multiplier), one per-vector window over
  * k rows (WindowGroupLimit prunes to the argmin), and one
  * (k·dim)-bounded integer aggregate for the update. No stage is
  * quadratic in the corpus; the centroid frame never exceeds k rows.
  *
  * Determinism contract: components are quantized to milli-units
  * (`round(x·1000)`, exact in both engines for the same doubles —
  * positive and negative halves round away from zero identically);
  * centroid means are exact long sums divided once (`s / (1000·n)`);
  * squared-L2 folds run in index order on both engines (the same
  * zip-fold the oracle-green q21 metric enum uses). Ties in the argmin
  * break by cluster id.
  */
object KMeans {

  /** Milli-quantized double array: round(x*1000)/1000, elementwise. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => round(x * lit(1000), 0) / lit(1000.0))

  /** Initial centroids: the k lowest-`idCol` vectors, milli-quantized:
    * (cid, cent) with cid 0..k-1. */
  def seed(vecs: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val w = Window.orderBy(col(idCol))
    vecs.orderBy(col(idCol)).limit(k)
      .select((row_number().over(w) - 1).cast("long").as("cid"),
        quantize(col(vecCol)).as("cent"))
  }

  /** Nearest-centroid assignment: (idCol, cid, sqdist). */
  def assign(vecs: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("sqdist"), col("cid"))
    vecs.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("sqdist", VectorFunctions.squaredL2(col("v"), col("cent")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cid"), col("sqdist"))
  }

  /** One Lloyd update from an assignment: exact milli-unit centroid
    * means, (cid, cent). Clusters that lost every member drop out
    * (k is small and seeds are real points, so this is a corner the
    * caller can ignore; both engines agree either way). */
  def update(vecs: DataFrame, assigned: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vecs.join(assigned.select(col(idCol), col("cid")), Seq(idCol))
      .select(col("cid"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(round(col("col") * lit(1000), 0).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .withColumn("c", col("s") / (lit(1000.0) * col("n")))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("pos"), col("c"))))
        .as("pcs"))
      .select(col("cid"),
        transform(col("pcs"), x => x("c")).as("cent"))

  /** `iterations` Lloyd rounds from the deterministic seed; returns the
    * trained centroid table (cid, cent) — the reusable artifact an
    * incremental pipeline assigns NEW batches against without
    * re-fitting (q172). */
  def fitCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int): DataFrame = {
    var cents = seed(vecs, idCol, vecCol, k)
    for (_ <- 1 to iterations)
      cents = update(vecs, assign(vecs, cents, idCol, vecCol),
        idCol, vecCol)
    cents
  }

  /** `iterations` Lloyd rounds from the deterministic seed; returns the
    * final assignment (idCol, cid, sqdist). */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): DataFrame =
    assign(vecs, fitCentroids(vecs, idCol, vecCol, k, iterations),
      idCol, vecCol)

  /** DuckDB oracle fragments over `embeddings(vec_id, embedding)`. */
  object sql {
    private def quant(v: String) =
      s"list_transform(($v)::DOUBLE[], x -> round(x * 1000) / 1000.0)"
    private def sqdist(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), " +
        "z -> (z[1] - z[2]) * (z[1] - z[2])))"

    /** CTE pair: `cent$i` from `cent${i-1}` via assignment+update. */
    private def iterCtes(i: Int): String =
      s"""asg$i AS (
         |  SELECT vec_id, cid, sqdist FROM (
         |    SELECT e.vec_id, c.cid,
         |      ${sqdist("e.v", "c.cent")} AS sqdist,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqdist("e.v", "c.cent")}, c.cid) AS rn
         |    FROM ev e CROSS JOIN cent${i - 1} c)
         |  WHERE rn = 1),
         |cent$i AS (
         |  SELECT cid, list(c ORDER BY pos) AS cent FROM (
         |    SELECT a.cid, r.pos,
         |      sum(CAST(round(e.v[r.pos] * 1000) AS BIGINT)) /
         |        (1000.0 * count(*)) AS c
         |    FROM asg$i a
         |    JOIN ev e USING (vec_id),
         |      unnest(range(1, len(e.v) + 1)) r(pos)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)""".stripMargin

    /** Full CTE chain ending in `asgF(vec_id, cid, sqdist)` — the
      * oracle twin of [[fit]] over `src` (a table or prior CTE with
      * vec_id + embedding; default the embeddings table). */
    def fitCtes(k: Int, iterations: Int,
        src: String = "embeddings"): String = {
      val base =
        s"""ev AS (
           |  SELECT vec_id, (embedding)::DOUBLE[] AS v FROM $src),
           |cent0 AS (
           |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           |      AS cid,
           |    ${quant("embedding")} AS cent
           |  FROM $src ORDER BY vec_id LIMIT $k)""".stripMargin
      val iters = (1 to iterations).map(iterCtes)
      val fin =
        s"""asgF AS (
           |  SELECT vec_id, cid, sqdist FROM (
           |    SELECT e.vec_id, c.cid,
           |      ${sqdist("e.v", "c.cent")} AS sqdist,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${sqdist("e.v", "c.cent")}, c.cid) AS rn
           |    FROM ev e CROSS JOIN cent$iterations c)
           |  WHERE rn = 1)""".stripMargin
      (base +: iters :+ fin).mkString(",\n")
    }
  }
}
