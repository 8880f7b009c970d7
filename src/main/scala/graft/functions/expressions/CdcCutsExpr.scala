package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk-cut positions of a document (the Rabin-style
  * boundary rule behind storage/backup dedup and long-document chunk
  * dedup, cf. LBFS, Muthitacharoen et al. 2001): a cut falls AFTER
  * 1-based character position `i` (i >= [[CdcCutsExpr.Window]]) when the
  * polynomial hash of the trailing [[CdcCutsExpr.Window]]-char window —
  *
  *   h(i) = Σ_{j=0..W−1} code(c_{i−W+1+j}) · B^(W−1−j),
  *   cut ⇔ (h mod 1000000007) mod [[CdcCutsExpr.Mask]] == 0
  *
  * — lands on the zero residue class. Boundaries depend only on LOCAL
  * content, so an insertion early in a document shifts, but does not
  * rewrite, every later chunk — the property that makes chunk-hash
  * dedup robust to edits where fixed-offset blocking is not.
  *
  * Returns the ascending int array of cut end-positions. Per-position
  * recompute is O(W·n) with W = 8 — the same arithmetic the DuckDB
  * oracle unrolls (`graft.dedup.Cdc.sql`), term for term, so the two
  * engines agree bit-for-bit on every boundary. Byte-based: the corpus
  * contract is single-byte (ASCII) text, where byte offsets and DuckDB
  * character offsets coincide (asserted in CdcSpec).
  *
  * Expected chunk length is Mask (64) chars; production CDC adds
  * min/max clamps — a stateful per-doc scan, still scan-local (see the
  * q201 scaladoc for the dial).
  */
case class CdcCutsExpr(child: Expression) extends UnaryExpression {

  import CdcCutsExpr._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_cuts expects string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val out = new java.util.ArrayList[Object]()
    var i = Window - 1 // 0-based end index of the window
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < Window) {
        h += (s.getByte(i - Window + 1 + j) & 0xffL) * Pows(Window - 1 - j)
        j += 1
      }
      if ((h % Prime) % Mask == 0L) out.add(Integer.valueOf(i + 1))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val pows = ctx.addReferenceObj("cdcPows", Pows, "long[]")
      s"""int $n = $s.numBytes();
         |java.util.ArrayList $out = new java.util.ArrayList();
         |for (int $i = ${Window - 1}; $i < $n; $i++) {
         |  long $h = 0L;
         |  for (int $j = 0; $j < $Window; $j++) {
         |    $h += ($s.getByte($i - ${Window - 1} + $j) & 0xffL)
         |      * $pows[${Window - 1} - $j];
         |  }
         |  if (($h % ${Prime}L) % ${Mask}L == 0L) {
         |    $out.add(java.lang.Integer.valueOf($i + 1));
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
         |""".stripMargin
    })

  override def prettyName: String = "cdc_cuts"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCutsExpr {
  /** Rolling-window width in chars. */
  val Window = 8
  /** Polynomial base (chosen with full multiplicative order mod the
    * prime so the 8 window weights stay distinct mod [[Mask]]). */
  val Base = 131L
  /** Modulus applied before the mask — NOT a power of two, so the
    * residue mixes all weight positions (131² ≡ 1 mod 64 would
    * otherwise collapse the weights to {131, 1}). */
  val Prime = 1000000007L
  /** Cut residue class size ⇒ expected chunk length in chars. */
  val Mask = 64L
  /** Base^0 .. Base^(Window−1); max term 126·131⁷ ≈ 8.3e16, the 8-term
    * sum stays far under Long.MaxValue before the single mod. */
  val Pows: Array[Long] =
    Iterator.iterate(1L)(_ * Base).take(Window).toArray
}
