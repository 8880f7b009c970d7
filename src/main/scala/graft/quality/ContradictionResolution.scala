package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed contradiction detection + resolution strategies
  * (quality/contradiction_resolution.py:110-700). Detection pairs nodes
  * within a domain and probes the four typed pattern axes (factual /
  * numerical / temporal / qualitative, :118-145); per the reference's
  * arithmetic the pattern confidence (:252-283) does not depend on WHICH
  * pattern matched (+0.3 always fires; the strong/negation boosts read
  * only the contents), so the "most significant" contradiction is the
  * first matching pattern in dict order — mirrored here as an ordered
  * CASE chain. Severity (:285-313) tiers type base + confidence +
  * content length. Conflicting claims (:315-327) are the first sentence
  * containing either pattern word.
  *
  * Resolution implements the HYBRID strategy (:555-602): the authority /
  * temporal / confidence legs (:384-530) decide on REAL per-node columns
  * (the reference stubs them to constants :604-617), each resolved leg
  * votes conf×weight (authority 0.4, temporal 0.3, confidence 0.3) for
  * its winner, ties prefer the first-resolved leg's winner (Python max
  * over insertion order). No leg resolved → requires_review, confidence
  * 0 (:649-663).
  *
  * DIVERGENCE: case_id omits the reference's int(time.time()) suffix
  * (nondeterministic); pairs are scoped within `domain` like the other
  * quality detectors (the reference receives one domain's node list).
  *
  * Scale: within-domain self-join (blocked on the domain key); all
  * scoring is per-pair column arithmetic inside the join projection.
  * BOUNDED-GROUP CONTRACT: the domain key blocks cross-domain pairs but
  * one skewed domain would still pair O(n²) within itself, so detection
  * considers at most `maxPerDomain` nodes per domain — the first N by
  * `ord`, mirroring the reference's candidate slice of the first 100
  * nodes handed to the detector (enhanced_mcp_endpoint.py:612
  * `nodes[:100]`). Same contract as the bounded-group analyses q62/q75.
  */
object ContradictionResolution {

  /** Reference candidate bound (enhanced_mcp_endpoint.py:612). */
  val DefaultMaxPerDomain = 100

  /** (axis, positive, negative) in reference dict/list order (:118-145). */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("factual", "is", "is not"), ("factual", "true", "false"),
    ("factual", "exists", "does not exist"),
    ("factual", "has", "does not have"), ("factual", "can", "cannot"),
    ("factual", "will", "will not"),
    ("numerical", "increase", "decrease"),
    ("numerical", "more than", "less than"),
    ("numerical", "higher", "lower"), ("numerical", "greater", "smaller"),
    ("temporal", "before", "after"), ("temporal", "earlier", "later"),
    ("temporal", "past", "future"), ("temporal", "old", "new"),
    ("qualitative", "good", "bad"), ("qualitative", "positive", "negative"),
    ("qualitative", "beneficial", "harmful"),
    ("qualitative", "effective", "ineffective"))

  val StrongIndicators: Seq[String] =
    Seq("definitely", "certainly", "always", "never", "absolutely")
  val NegationIndicators: Seq[String] =
    Seq("not", "never", "cannot", "impossible", "false")

  val TypeSeverity: Map[String, Double] = Map("factual" -> 0.8,
    "numerical" -> 0.7, "temporal" -> 0.5, "qualitative" -> 0.4)

  private def patternMatch(lc1: Column, lc2: Column, pos: String,
      neg: String): Column =
    (lc1.contains(pos) && lc2.contains(neg)) ||
      (lc1.contains(neg) && lc2.contains(pos))

  /** First sentence (re.split order) containing either pattern word,
    * trimmed and capped at 200; content[:100]+"..." fallback (:315-327). */
  private def claimFor(content: Column, pos: String, neg: String): Column = {
    val m = filter(split(content, "[.!?]+"),
      s => lower(s).contains(pos) || lower(s).contains(neg))
    when(size(m) > 0, substring(trim(element_at(m, 1)), 1, 200))
      .otherwise(concat(substring(content, 1, 100), lit("...")))
  }

  /** Detect + hybrid-resolve over
    * `nodes(node_id, ord, domain, content, authority, ts, confidence)`
    * (authority/confidence doubles, ts a date/timestamp; nullable). One
    * row per contradicting within-domain pair. */
  def resolve(nodes: DataFrame,
      maxPerDomain: Int = DefaultMaxPerDomain): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // candidate bound: first maxPerDomain nodes per domain by ord (the
    // reference's list-position slice); the window shuffles on the same
    // domain key the pair join needs, so this adds no extra exchange
    val capped = nodes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("ord"))))
      .filter(col("__rn") <= maxPerDomain).drop("__rn")
    val cols = Seq("node_id", "ord", "content", "authority", "ts",
      "confidence")
    val a = capped.select(col("domain") +: cols.map(c => col(c).as(s"a_$c")): _*)
    val b = capped.select(col("domain") +: cols.map(c => col(c).as(s"b_$c")): _*)
    val lc1 = lower(col("a_content"))
    val lc2 = lower(col("b_content"))

    val bestIdx = Patterns.zipWithIndex
      .foldLeft(when(lit(false), -1)) { case (w, ((_, p, n), i)) =>
        w.when(patternMatch(lc1, lc2, p, n), i)
      }.otherwise(-1)

    def byIdx(f: ((String, String, String)) => Column): Column =
      Patterns.zipWithIndex.foldLeft(when(lit(false), lit(null))) {
        case (w, (pat, i)) => w.when(col("best_idx") === i, f(pat))
      }

    val strongHit = StrongIndicators
      .map(w => lc1.contains(w) || lc2.contains(w)).reduce(_ || _)
    val negCount = NegationIndicators
      .map(w => when(lc1.contains(w) || lc2.contains(w), 1).otherwise(0))
      .reduce(_ + _)

    val pairs = a.join(b, Seq("domain"))
      .filter(col("a_ord") < col("b_ord"))
      .withColumn("best_idx", bestIdx)
      .filter(col("best_idx") >= 0)
      .withColumn("contradiction_type", byIdx(p => lit(p._1)))
      .withColumn("conf", least(
        lit(0.8) + when(strongHit, 0.1).otherwise(0.0) +
          least(negCount * lit(0.05), lit(0.2)), lit(1.0)))
      .withColumn("claim_1", byIdx(p => claimFor(col("a_content"), p._2, p._3)))
      .withColumn("claim_2", byIdx(p => claimFor(col("b_content"), p._2, p._3)))
      .withColumn("context", byIdx(p => lit(
        s"${p._1} contradiction involving ('${p._2}', '${p._3}')")))
      .withColumn("sev_score", byIdx(p => lit(TypeSeverity(p._1))) +
        col("conf") * 0.2 +
        least((length(col("a_content")) + length(col("b_content"))) /
          lit(1000.0) * 0.1, lit(0.2)))
      .withColumn("severity",
        when(col("sev_score") >= 0.8, "critical")
          .when(col("sev_score") >= 0.6, "high")
          .when(col("sev_score") >= 0.4, "medium").otherwise("low"))

    // hybrid legs: each resolved leg votes conf×weight for its winner;
    // leg ties prefer node1 (Python max takes the first maximum)
    val authRes = greatest(col("a_authority"), col("b_authority")) > 0.7
    val authWin = when(col("b_authority") > col("a_authority"),
      col("b_node_id")).otherwise(col("a_node_id"))
    val authScore = greatest(col("a_authority"), col("b_authority")) * 0.4
    val tempRes = col("a_ts").isNotNull || col("b_ts").isNotNull
    val tempWin = when(col("a_ts").isNull && col("b_ts").isNotNull,
      col("b_node_id"))
      .when(col("b_ts").isNull, col("a_node_id"))
      .when(col("b_ts") > col("a_ts"), col("b_node_id"))
      .otherwise(col("a_node_id"))
    val tempScore = lit(0.7) * 0.3
    val confRes = greatest(col("a_confidence"), col("b_confidence")) > 0.7
    val confWin = when(col("b_confidence") > col("a_confidence"),
      col("b_node_id")).otherwise(col("a_node_id"))
    val confScore = greatest(col("a_confidence"), col("b_confidence")) * 0.3

    def votes(target: Column): Column =
      when(authRes && authWin === target, authScore).otherwise(0.0) +
        when(tempRes && tempWin === target, tempScore).otherwise(0.0) +
        when(confRes && confWin === target, confScore).otherwise(0.0)
    val s1 = votes(col("a_node_id"))
    val s2 = votes(col("b_node_id"))
    val firstWin = coalesce(when(authRes, authWin), when(tempRes, tempWin),
      when(confRes, confWin))
    val anyRes = authRes || tempRes || confRes
    val target = when(!anyRes, lit(null).cast("string"))
      .when(s1 > s2, col("a_node_id"))
      .when(s2 > s1, col("b_node_id"))
      .otherwise(firstWin)

    pairs
      .withColumn("resolution_status",
        when(anyRes, "resolved").otherwise("requires_review"))
      .withColumn("strategy_used", lit("hybrid_approach"))
      .withColumn("action_type",
        when(anyRes, "hybrid_resolution").otherwise(lit(null).cast("string")))
      .withColumn("target_node", target)
      .withColumn("resolution_confidence",
        when(anyRes, least(greatest(s1, s2), lit(1.0))).otherwise(0.0))
      .withColumn("final_recommendation",
        when(anyRes, concat(lit("Accept "), target,
          lit(" based on hybrid analysis")))
          .otherwise("Contradiction requires human expert review"))
      .select(
        concat(lit("contradiction_"), col("a_node_id"), lit("_"),
          col("b_node_id")).as("case_id"),
        col("a_node_id").as("node_1"), col("b_node_id").as("node_2"),
        col("contradiction_type"), col("severity"),
        col("conf").as("confidence"), col("claim_1"), col("claim_2"),
        col("context"), col("resolution_status"), col("strategy_used"),
        col("action_type"), col("target_node"),
        col("resolution_confidence"), col("final_recommendation"))
  }
}
