package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token-set Jaccard similarity over two string arrays as a
  * native codegen expression.
  *
  * Semantically identical to
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b)))`
  * with the 0-denominator → 0.0 guard (the Jaccard form used across the
  * reference's similarity joins, ingestion/relationship_extractor
  * .py:264-347): intersection counts DISTINCT common elements, union is
  * |a| + |b| − inter. Built-in `array_intersect` allocates an ArrayData
  * result and gets re-evaluated for every reference to the derived
  * column after projection collapse — this computes the scalar once per
  * pair with two hash probes and no allocation beyond the sets.
  */
case class SetJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"set_jaccard expects (array<string>, array<string>), " +
            s"got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    // null elements participate as a value (array_intersect does too:
    // [null] ∩ [null] = [null]), keeping the builtin-formula equivalence
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
    val uni = (na + nb).toDouble - inter
    if (uni > 0) inter / uni else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Janino: raw types, no generics. EVERY local (including loop
      // variables — Janino scopes for-init declarations to the enclosing
      // block) must be freshName'd: two instances of this expression in
      // one projection otherwise generate colliding locals and the whole
      // projection silently falls back to interpreted mode.
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val setA = ctx.freshName("setA"); val seen = ctx.freshName("seen")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
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
         |double $uni = (double) ($na + $nb) - (double) $inter;
         |${ev.value} = $uni > 0 ? ((double) $inter) / $uni : 0.0d;""".stripMargin
    })

  override def prettyName: String = "set_jaccard"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
