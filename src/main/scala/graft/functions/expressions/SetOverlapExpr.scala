package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass DISTINCT intersection size of two string arrays as a native
  * codegen expression — the integer numerator the exact-Jaccard /
  * containment family needs (`i`, with `u = |a|+|b|−i` for Jaccard,
  * `min(|a|,|b|)` for containment) when the RATIO itself must stay in
  * exact integer arithmetic (ExactRound) instead of a double.
  *
  * Semantically `size(array_intersect(a, b))` (distinct common
  * elements; null participates as a value, as array_intersect treats
  * it), computed with two hash probes per element and no ArrayData
  * allocation — the same evaluation shape as [[SetJaccardExpr]], which
  * documents the Janino constraints the codegen follows.
  */
case class SetOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"set_overlap expects (array<string>, array<string>), " +
            s"got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) {
      setA.add(if (a.isNullAt(i)) null else a.getUTF8String(i)); i += 1
    }
    val seen = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0L
    i = 0
    while (i < nb) {
      val o = if (b.isNullAt(i)) null else b.getUTF8String(i)
      if (seen.add(o) && setA.contains(o)) inter += 1
      i += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val setA = ctx.freshName("setA"); val seen = ctx.freshName("seen")
      val inter = ctx.freshName("inter")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val o = ctx.freshName("o")
      s"""int $na = $a.numElements(); int $nb = $b.numElements();
         |java.util.HashSet $setA = new java.util.HashSet($na * 2);
         |for (int $i = 0; $i < $na; $i++) {
         |  $setA.add($a.isNullAt($i) ? null : $a.getUTF8String($i));
         |}
         |java.util.HashSet $seen = new java.util.HashSet($nb * 2);
         |long $inter = 0L;
         |for (int $j = 0; $j < $nb; $j++) {
         |  Object $o = $b.isNullAt($j) ? null : $b.getUTF8String($j);
         |  if ($seen.add($o) && $setA.contains($o)) $inter++;
         |}
         |${ev.value} = $inter;""".stripMargin
    })

  override def prettyName: String = "set_overlap"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
