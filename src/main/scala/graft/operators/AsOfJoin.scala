package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with
  * the greatest ordinate ≤ the left ordinate (optionally within a
  * tolerance), per join group. The temporal-alignment operator built-in
  * Spark lacks (point-in-time feature lookup, "state as of event
  * time"); naive formulations are a range join that explodes to
  * |L|·|R| per group or a per-row subquery.
  *
  * Plan shape: the MERGE-SCAN form — union both sides with a side tag,
  * ONE shuffle on the `by` keys, one group-keyed window pass carrying
  * the last-seen right payload forward (`last(_, ignoreNulls)` over
  * rows-preceding). Cost is one exchange + one sort of |L|+|R| rows,
  * independent of match distances — the plan that survives 100 TB,
  * unlike a range join whose bucket width must chase the data.
  *
  * Contract: `right` must be unique per (`by`, `ord`) — pre-aggregate
  * ties (e.g. max_by on a unique id) so the "latest right row" is
  * well-defined; equal ordinates MATCH (right sorts before left at the
  * same ordinate). Matching and gap arithmetic run on `ord` CAST TO
  * LONG — i.e. the ordinate is coerced to integral units (epoch
  * seconds for a timestamp; a double ordinate truncates), and
  * `tolerance`, `asof_ord`, `asof_gap` are all in those units. The
  * left's ord column itself is passed through UNCHANGED (original type
  * and value). Output: all left columns, then each right payload
  * column (null when no match in tolerance), then `asof_ord` (the
  * matched right ordinate, long) and `asof_gap` (left ord − matched
  * ord, long).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
      ord: String, tolerance: Option[Long] = None): DataFrame = {
    val lPay = left.columns.filterNot(by.contains).filterNot(_ == ord).toSeq
    val rPay = right.columns.filterNot(by.contains).filterNot(_ == ord).toSeq
    require(lPay.intersect(rPay).isEmpty,
      s"payload collision: ${lPay.intersect(rPay).mkString(",")}")
    require(!lPay.contains("__ord0"), "reserved column name: __ord0")
    val rStruct = struct(rPay.map(col): _*)
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    // the left payload struct carries the ORIGINAL ord value (__ord0)
    // so the output's ord column keeps its type — the long __ord is
    // only the merge-scan sort/gap key
    def lStruct = struct(lPay.map(col) :+ col(ord).as("__ord0"): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType

    val lu = left.select(by.map(col) ++ Seq(
      col(ord).cast("long").as("__ord"), lit(1).as("__side"),
      lStruct.as("__l"),
      lit(null).cast(rType).as("__r")): _*)
    val ru = right.select(by.map(col) ++ Seq(
      col(ord).cast("long").as("__ord"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__mord",
        last(when(col("__side") === 0, col("__ord")), ignoreNulls = true)
          .over(w))
      .filter(col("__side") === 1)
    val inTol: Column = tolerance match {
      case Some(t) => col("__mord").isNotNull &&
        col("__ord") - col("__mord") <= t
      case None => col("__mord").isNotNull
    }
    matched.select(
      by.map(col) ++ Seq(col("__l")("__ord0").as(ord)) ++
        lPay.map(c => col("__l")(c).as(c)) ++
        rPay.map(c => when(inTol, col("__m")(c)).as(c)) ++ Seq(
          when(inTol, col("__mord")).as("asof_ord"),
          when(inTol, col("__ord") - col("__mord")).as("asof_gap")): _*)
  }
}
