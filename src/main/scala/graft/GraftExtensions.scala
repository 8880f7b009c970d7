package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.expressions.{CdcCutsExpr, JaroWinklerExpr, SetJaccardExpr, SetOverlapExpr, VectorSimExpr}

/** Session extensions: registers graft's native Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works in
  * any session built `.withExtensions(new GraftExtensions)` — or call
  * `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, (clazz, builder)) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz, name),
        builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private def unary(name: String, mk: Expression => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name, "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    mk(exprs(0))
  }

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { exprs =>
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name, "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    mk(exprs(0), exprs(1))
  }

  private[graft] val functions
      : Seq[(String, (String, Seq[Expression] => Expression))] = Seq(
    "cosine_sim" -> (classOf[VectorSimExpr].getName,
      binary("cosine_sim", VectorSimExpr(_, _, "cos"))),
    "vec_dot" -> (classOf[VectorSimExpr].getName,
      binary("vec_dot", VectorSimExpr(_, _, "dot"))),
    "vec_l2" -> (classOf[VectorSimExpr].getName,
      binary("vec_l2", VectorSimExpr(_, _, "l2"))),
    "set_jaccard" -> (classOf[SetJaccardExpr].getName,
      binary("set_jaccard", SetJaccardExpr(_, _))),
    "set_overlap" -> (classOf[SetOverlapExpr].getName,
      binary("set_overlap", SetOverlapExpr(_, _))),
    "cdc_cuts" -> (classOf[CdcCutsExpr].getName,
      unary("cdc_cuts", CdcCutsExpr(_))),
    "jaro_winkler" -> (classOf[JaroWinklerExpr].getName,
      binary("jaro_winkler", JaroWinklerExpr(_, _))))

  /** Register on an already-built session (the `.withExtensions(new
    * GraftExtensions)` builder path covers new sessions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, (_, builder)) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
