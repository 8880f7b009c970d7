package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Cross-engine-safe fixed-decimal rounding for ratios of bigints.
  *
  * `round(S * 1.0 / D, 6)` is flaky across engines exactly when the
  * true quotient is a terminating decimal whose 7th digit is 5: the
  * binary double sits a hair off the decimal half, DuckDB rounds the
  * BINARY value while Spark's `round` re-reads the shortest DECIMAL
  * representation (BigDecimal.valueOf) and applies HALF_UP — the two
  * can disagree by 1e-6 (observed: 4005220/8e6 = 0.5006525 → Spark
  * 0.500653, DuckDB 0.500652). The round-7 advice flagged this class
  * for regr_slope; q174 hit it with plain integer sums.
  *
  * The fix computes the rounded quotient in PURE INTEGER arithmetic —
  * `(2·S·10^d + D) div (2·D)` is round-half-up(S·10^d / D) for
  * non-negative S — and divides by 10^d once at the end, so both
  * engines materialize the identical double. Caller contract: S ≥ 0,
  * D > 0, and 2·S·10^d fits a long (S ≤ ~4.6e12 at d=6 — per-group
  * sums of micro-unit scores stay far below that; corpus-wide sums
  * should pre-divide).
  */
object ExactRound {

  private def intDiv(a: Column, b: Column): Column =
    GraftBridge.column(IntegralDivide(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** round-half-up(num/den, 6) as an exact double; num ≥ 0, den > 0
    * bigint columns. */
  def ratio6(num: Column, den: Column): Column =
    intDiv(num * lit(2000000L) + den, den * lit(2L)) / lit(1e6)

  /** Same, when `num` is ALREADY in micro units (so the quotient
    * num/den is micro-scaled): round-half-up(num/den) / 1e6. */
  def microMean6(microSum: Column, den: Column): Column =
    intDiv(microSum * lit(2L) + den, den * lit(2L)) / lit(1e6)

  /** round-half-up(num/den · 1e6) kept as a micro-unit LONG — for
    * quantizing a per-row exact ratio BEFORE an integer sum feeding
    * [[microMean6]] (mean-of-rounded, shuffle-order-proof). */
  def micro6(num: Column, den: Column): Column =
    intDiv(num * lit(2000000L) + den, den * lit(2L))

  /** round-half-up(microSum/den) kept as a micro-unit LONG — the long
    * form of [[microMean6]], for results that feed further integer
    * arithmetic instead of being reported. */
  def meanMicro(microSum: Column, den: Column): Column =
    intDiv(microSum * lit(2L) + den, den * lit(2L))

  /** DuckDB twins (same integer forms). */
  object sql {
    def ratio6(num: String, den: String): String =
      s"((2 * ($num) * 1000000 + ($den)) // (2 * ($den))) / 1e6"
    def microMean6(microSum: String, den: String): String =
      s"((2 * ($microSum) + ($den)) // (2 * ($den))) / 1e6"
    def micro6(num: String, den: String): String =
      s"((2 * ($num) * 1000000 + ($den)) // (2 * ($den)))"
    def meanMicro(microSum: String, den: String): String =
      s"((2 * ($microSum) + ($den)) // (2 * ($den)))"
  }
}
