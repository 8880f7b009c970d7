package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.{TextFunctions => TF}

/** Cross-validation claims pipeline (quality/cross_validation.py:98-780):
  * FactualClaimExtractor (:105-250) pulls typed claims out of node
  * content with the reference's regex pattern table, scores each claim's
  * confidence from indicator words / digits / length, dedups on the
  * normalized text (first extraction wins) and drops low-quality claims;
  * EvidenceCollector (:258-578) pairs each claim against corpus nodes,
  * gates on word-overlap relevance (Jaccard + exact-phrase boost ≥ 0.3),
  * classifies each piece of evidence supporting / contradicting /
  * neutral from indicator words and "not <word>" negations, scores node
  * reliability from source tier + confidence metadata, and keeps the
  * top 20 by relevance×reliability; ValidationAnalyzer (:580-780)
  * combines the evidence into a consensus score, validation status,
  * confidence level and a human-readable summary per claim.
  *
  * DIVERGENCES (documented, same spirit as q98):
  *  - claim_id uses md5(claim_text) where the reference uses Python's
  *    process-seeded hash() (nondeterministic across runs).
  *  - among same-pattern captures whose lowercased text collides, ties
  *    break lexicographically rather than by match position (observable
  *    only for mixed-case duplicate claims inside one node).
  *  - negation probes use literal "not <word>" containment; the
  *    reference's `not\s+` regex differs only on multi-whitespace text.
  *  - evidence search is scoped within `domain` (the reference's engine
  *    receives one domain's corpus) and BOUNDED-GROUP capped at
  *    [[ContradictionResolution.DefaultMaxPerDomain]] candidate nodes
  *    per domain (first N by `ord`), the enhanced_mcp_endpoint.py:612
  *    candidate-slice precedent; the reference bounds the same stage
  *    with its semantic-search limit=30.
  *  - reliability's freshness leg (age vs datetime.now(), :516-527) is
  *    dropped: it is nondeterministic by construction; nodes here carry
  *    no timestamp metadata, which is the reference's no-op path.
  *
  * Scale shape: claim extraction is per-row regex arithmetic inside the
  * scan; the evidence stage is a within-domain equi-join (domain-capped,
  * codegen set-Jaccard per pair) followed by a per-claim top-20 window;
  * analysis is one partial-aggregatable groupBy(claim_id).
  */
object CrossValidation {

  /** (claim_type, group-1 regex) in reference dict/list order
    * (:105-123); compiled case-insensitive like re.IGNORECASE. */
  val ClaimPatterns: Seq[(String, String)] = Seq(
    ("factual", """([A-Z][^.!?]*(?:is|are|was|were|has|have)[^.!?]*)"""),
    ("factual", """([A-Z][^.!?]*(?:can|will|would|should|must)[^.!?]*)"""),
    ("factual", """([A-Z][^.!?]*(?:causes?|leads? to|results? in)[^.!?]*)"""),
    ("numerical", """([^.!?]*\b\d+(?:\.\d+)?(?:%|kg|meters?|seconds?|""" +
      """minutes?|hours?|days?|years?|dollars?)\b[^.!?]*)"""),
    ("numerical", """([^.!?]*\b(?:approximately|about|around|over|under)\s+\d+[^.!?]*)"""),
    ("temporal", """([^.!?]*\b(?:in|during|since|before|after)\s+\d{4}[^.!?]*)"""),
    ("temporal", """([^.!?]*\b(?:yesterday|today|tomorrow|recently|currently)[^.!?]*)"""),
    ("relational", """([^.!?]*\b(?:related to|connected to|part of|belongs to)[^.!?]*)"""),
    ("relational", """([^.!?]*\b(?:similar to|different from|compared to)[^.!?]*)"""))

  /** Confidence indicator tiers (:125-130). */
  val HighIndicators: Seq[String] =
    Seq("confirmed", "verified", "established", "proven", "documented")
  val MediumIndicators: Seq[String] =
    Seq("likely", "probable", "suggests", "indicates", "appears")
  val LowIndicators: Seq[String] =
    Seq("possibly", "might", "could", "seems", "unclear", "unconfirmed")

  /** Evidence classification indicator lists (:443-466). */
  val ContradictionIndicators: Seq[String] = Seq("however", "but",
    "although", "despite", "contrary to", "in contrast",
    "on the other hand", "nevertheless", "contradicts")
  val SupportIndicators: Seq[String] = Seq("confirms", "supports",
    "validates", "agrees", "consistent with", "furthermore", "moreover",
    "in addition", "similarly", "likewise")

  /** Evidence kept per claim after relevance×reliability ranking
    * (:289 `evidence[:20]`). */
  val MaxEvidencePerClaim = 20

  private def anyContains(lowered: Column, words: Seq[String]): Column =
    words.map(lowered.contains(_)).reduce(_ || _)

  private def wordsOf(text: Column): Column =
    filter(split(text, """\s+"""), w => length(w) > 0)

  /** Extract + score + dedup + quality-filter claims (:142-250) over
    * `nodes(node_id, ord, domain, content, conf_meta)`. Returns
    * (claim_id, node_id, domain, claim_type, claim_text, confidence)
    * plus the node's content/conf_meta carried for the evidence stage. */
  def extractClaims(nodes: DataFrame): DataFrame = {
    val legs = ClaimPatterns.zipWithIndex.map { case ((ct, pat), pi) =>
      nodes.select(col("node_id"), col("ord"), col("domain"), col("content"),
        col("conf_meta"), lit(ct).as("claim_type"), lit(pi).as("pi"),
        explode(regexp_extract_all(col("content"), lit("(?i)" + pat),
          lit(1))).as("raw"))
    }
    val raw = legs.reduce(_ unionByName _)
      .withColumn("claim_text", trim(col("raw"))).drop("raw")
      .filter(length(col("claim_text")) > 10) // min claim length (:185)
      .distinct()
    // dedup on normalized text, first pattern wins (:220-234); the >15
    // dedup gate subsumes the quality filter's >=15 (:236-250)
    val w = Window.partitionBy(col("node_id"), lower(col("claim_text")))
      .orderBy(col("pi"), col("claim_text"))
    val lc = lower(col("claim_text"))
    // confidence (:195-218): base + per-tier indicator adjustment +
    // digits + detail, clamped to [0.1, 1.0]; addition order mirrors the
    // reference's sequential += so float results are bit-identical
    val conf = greatest(lit(0.1), least(
      lit(0.5) +
        when(anyContains(lc, HighIndicators), 0.3).otherwise(0.0) +
        when(anyContains(lc, MediumIndicators), 0.1).otherwise(0.0) -
        when(anyContains(lc, LowIndicators), 0.2).otherwise(0.0) +
        when(col("claim_text").rlike("[0-9]"), 0.1).otherwise(0.0) +
        when(size(wordsOf(col("claim_text"))) > 8, 0.1).otherwise(0.0),
      lit(1.0)))
    raw.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && length(col("claim_text")) > 15)
      .withColumn("confidence", conf)
      .filter(col("confidence") >= 0.3 &&
        size(wordsOf(col("claim_text"))) >= 3)
      .select(
        concat(col("node_id"), lit("_"), col("claim_type"), lit("_"),
          md5(col("claim_text"))).as("claim_id"),
        col("node_id"), col("ord"), col("domain"), col("claim_type"),
        col("claim_text"), col("confidence"))
  }

  /** Pair claims with same-domain corpus nodes (excluding the claim's
    * own node), gate on relevance ≥ 0.3, classify support type, score
    * reliability, extract the best-sentence snippet, keep the top
    * [[MaxEvidencePerClaim]] by relevance×reliability (:258-578).
    * `corpus` is `nodes(node_id, ord, domain, content, conf_meta)`. */
  def collectEvidence(claims: DataFrame, corpus: DataFrame,
      maxPerDomain: Int = ContradictionResolution.DefaultMaxPerDomain)
      : DataFrame = {
    val capped = corpus
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("ord"))))
      .filter(col("__rn") <= maxPerDomain)
      .select(col("domain"), col("node_id").as("ev_id"),
        col("ord").as("ev_ord"), col("content").as("ev_content"),
        col("conf_meta").as("ev_conf"))
    val pairs = claims.join(capped, Seq("domain"))
      .filter(col("ev_id") =!= col("node_id"))

    val claimLc = lower(col("claim_text"))
    val contentLc = lower(col("ev_content"))
    val cw = array_distinct(wordsOf(claimLc))
    val tw = array_distinct(wordsOf(contentLc))
    // relevance (:425-441): word-set Jaccard + exact-phrase boost
    val relevance = least(
      TF.jaccardSim(cw, tw) +
        when(contentLc.contains(claimLc), 0.3).otherwise(0.0), lit(1.0))

    // support classification (:443-510): indicator sums then negation
    // probes then the high-relevance support boost, in reference order
    val ordWords = wordsOf(claimLc)
    def negHit(i: Int): Column =
      size(ordWords) >= i &&
        contentLc.contains(concat(lit("not "), element_at(ordWords, i)))
    val cScore = ContradictionIndicators
      .map(w => when(contentLc.contains(w), 0.2).otherwise(0.0))
      .reduce(_ + _) +
      (1 to 3).map(i => when(negHit(i), 0.3).otherwise(0.0)).reduce(_ + _)
    val sScore = SupportIndicators
      .map(w => when(contentLc.contains(w), 0.2).otherwise(0.0))
      .reduce(_ + _) +
      when(col("relevance") > 0.6, 0.3).otherwise(0.0)

    // reliability (:512-540): base + source tier + confidence metadata
    // (freshness leg dropped — header DIVERGENCES)
    val srcLc = lower(col("domain"))
    val reliability = greatest(lit(0.1), least(
      lit(0.5) +
        when(anyContains(srcLc, Seq("journal", "research", "academic")), 0.2)
          .when(anyContains(srcLc, Seq("wiki", "blog", "forum")), -0.1)
          .otherwise(0.0) +
        (col("ev_conf") - 0.5) * 0.4, lit(1.0)))

    // best-sentence snippet (:542-578): first strict-max word overlap
    // over sentences of length ≥ 10, fallback content[:200]+"..."
    val sentences = filter(
      transform(split(col("ev_content"), "[.!?]+"), s => trim(s)),
      s => length(s) >= 10)
    val best = aggregate(sentences,
      struct(lit(0).as("ov"), lit("").as("snip")),
      (acc, s) => {
        val ov = size(array_intersect(cw,
          array_distinct(wordsOf(lower(s)))))
        when(ov > acc.getField("ov"), struct(ov.as("ov"), s.as("snip")))
          .otherwise(acc)
      })
    val snippet = when(best.getField("snip") === "",
      concat(substring(col("ev_content"), 1, 200), lit("...")))
      .otherwise(when(length(best.getField("snip")) > 200,
        concat(substring(best.getField("snip"), 1, 200), lit("...")))
        .otherwise(best.getField("snip")))

    val scored = pairs
      .withColumn("relevance", relevance)
      .filter(col("relevance") >= 0.3)
      .withColumn("c_score", cScore)
      .withColumn("s_score", sScore)
      .withColumn("support_type",
        when(col("c_score") > col("s_score") && col("c_score") > 0.3,
          "contradicting")
          .when(col("s_score") > col("c_score") && col("s_score") > 0.3,
            "supporting")
          .otherwise("neutral"))
      .withColumn("support_conf",
        when(col("support_type") === "contradicting", col("c_score"))
          .when(col("support_type") === "supporting", col("s_score"))
          .otherwise(greatest(col("c_score"), col("s_score"))))
      .withColumn("reliability", reliability)
      .withColumn("snippet", snippet)
    scored
      .withColumn("ern", row_number().over(
        Window.partitionBy(col("claim_id"))
          .orderBy((col("relevance") * col("reliability")).desc,
            col("ev_ord"))))
      .filter(col("ern") <= MaxEvidencePerClaim)
      .select(col("claim_id"), col("ev_id"), col("ev_ord"),
        col("relevance"), col("reliability"), col("support_type"),
        col("support_conf"), col("snippet"))
  }

  /** Combine evidence into per-claim validation results (:580-780):
    * consensus from reliability×confidence weights, status from
    * consensus + high-quality-evidence count, confidence level from
    * average evidence quality + consensus strength, plus the
    * human-readable summary. Claims with zero surviving evidence take
    * the reference's no-evidence path (insufficient / very_low / 0.5). */
  def analyze(claims: DataFrame, evidence: DataFrame): DataFrame = {
    val agg = evidence.groupBy(col("claim_id")).agg(
      count(lit(1)).as("n_ev"),
      count(when(col("support_type") === "supporting", 1)).as("n_sup"),
      count(when(col("support_type") === "contradicting", 1)).as("n_con"),
      count(when(col("support_type") === "neutral", 1)).as("n_neu"),
      sum(when(col("support_type") === "supporting",
        col("reliability") * col("support_conf")).otherwise(0.0)).as("sw"),
      sum(when(col("support_type") === "contradicting",
        col("reliability") * col("support_conf")).otherwise(0.0)).as("cw"),
      count(when(col("reliability") > 0.6, 1)).as("hq"),
      avg(col("reliability")).as("ar"),
      avg(col("support_conf")).as("ac"))

    val joined = claims.join(agg, Seq("claim_id"), "left")
      .withColumn("n_ev", coalesce(col("n_ev"), lit(0L)))
      .withColumn("n_sup", coalesce(col("n_sup"), lit(0L)))
      .withColumn("n_con", coalesce(col("n_con"), lit(0L)))
      .withColumn("n_neu", coalesce(col("n_neu"), lit(0L)))

    val consensus = when(col("n_sup") === 0 && col("n_con") === 0, 0.5)
      .when(col("sw") + col("cw") === 0.0, 0.5)
      .otherwise(col("sw") / (col("sw") + col("cw")))
    val status = when(col("n_ev") === 0, "insufficient")
      .when(col("hq") < 2, "insufficient")
      .when(col("consensus") >= 0.75, "validated")
      .when(col("consensus") <= 0.25, "conflicted")
      .when(col("consensus") >= 0.4 && col("consensus") <= 0.6, "conflicted")
      .otherwise("insufficient")
    val confScore = (col("ar") + col("ac")) / 2 * 0.6 +
      abs(col("consensus") - 0.5) * 2 * 0.4
    val level = when(col("n_ev") === 0, "very_low")
      .when(col("conf_score") >= 0.85, "high")
      .when(col("conf_score") >= 0.6, "medium")
      .when(col("conf_score") >= 0.3, "low")
      .otherwise("very_low")

    val part1 = concat(lit("Validation of claim: "),
      substring(col("claim_text"), 1, 100), lit("..."))
    val part2 = when(col("n_sup") > 0 && col("n_con") > 0,
      concat(lit("Found "), col("n_sup").cast("string"),
        lit(" supporting and "), col("n_con").cast("string"),
        lit(" contradicting sources")))
      .when(col("n_sup") > 0,
        concat(lit("Found "), col("n_sup").cast("string"),
          lit(" supporting sources with no contradictions")))
      .when(col("n_con") > 0,
        concat(lit("Found "), col("n_con").cast("string"),
          lit(" contradicting sources with no support")))
      .otherwise("No clear supporting or contradicting evidence found")
    val part3 = when(col("consensus") >= 0.75,
      "Strong consensus supports the claim")
      .when(col("consensus") <= 0.25, "Strong consensus contradicts the claim")
      .otherwise("Mixed or insufficient evidence for consensus")

    joined
      .withColumn("consensus", consensus)
      .withColumn("conf_score", confScore)
      .select(
        col("claim_id"), col("node_id").as("source_node_id"),
        col("claim_type"), col("claim_text"),
        col("confidence").as("claim_confidence"),
        col("n_sup").as("n_supporting"), col("n_con").as("n_contradicting"),
        col("n_neu").as("n_neutral"),
        col("consensus").as("consensus_score"),
        status.as("validation_status"),
        level.as("confidence_level"),
        concat(part1, lit(". "), part2, lit(". "), part3, lit("."))
          .as("validation_summary"))
  }
}
