package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.expressions.{SetJaccardExpr, VectorSimExpr}

/** Session extensions: registers graft's native Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works in
  * any session built `.withExtensions(new GraftExtensions)` — or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[VectorSimExpr].getName, name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => VectorSimExpr(exprs(0), exprs(1), "cos")),
    "vec_dot" -> (exprs => VectorSimExpr(exprs(0), exprs(1), "dot")),
    "vec_l2" -> (exprs => VectorSimExpr(exprs(0), exprs(1), "l2")),
    "set_jaccard" -> (exprs => SetJaccardExpr(exprs(0), exprs(1))))

  /** Register on an already-built session (the `.withExtensions(new
    * GraftExtensions)` builder path covers new sessions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
