package graft.query

/** Request-normalization rewrites (reference query/query_optimizer.py).
  * Catalyst already does the planner's work (pushdown, pruning, join
  * selection, CBO); the only reference rewrites with domain semantics —
  * not execution strategy — are these clamps, kept as API-layer
  * normalization exactly as SURVEY §4.1 concluded.
  */
object RequestNormalizer {

  /** Similarity-threshold tuning: clamp into [0.6, 0.85]
    * (query_optimizer.py:235-242). */
  def clampThreshold(t: Double): Double = math.min(0.85, math.max(0.6, t))

  /** Depth limiting: traversals deeper than 3 with large/unbounded limits
    * are clamped to 3 (query_optimizer.py:244-247). */
  def clampDepth(depth: Int, limit: Option[Int]): Int =
    if (depth > 3 && limit.forall(_ > 1000)) 3 else depth

  /** Cost model (query_optimizer.py:330-459): additive per-step costs.
    * Retained for explanation output only — Spark's CBO owns real
    * planning decisions. */
  def estimateCost(nFilters: Int, usesVector: Boolean, depth: Int,
      nAggs: Int, nSorts: Int, paginates: Boolean): Double = {
    val base = 0.1 * nFilters +
      (if (usesVector) 2.0 else 0.0) +
      (if (depth > 0) 1.5 * depth else 0.0) +
      0.5 * nAggs + 0.3 * nSorts +
      (if (paginates) 0.1 else 0.0)
    base
  }
}
