package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-reliability scoring (quality/source_reliability.py:86-1060):
  * normalize + classify the source string (SourceIdentifier :189-250),
  * score authority against a known-domain database plus type/content/
  * metadata indicators (AuthorityAnalyzer :286-464), per-source
  * consistency (ConsistencyAnalyzer :483-570), and publication/update/
  * content freshness (FreshnessAnalyzer :575-770), combined into a
  * confidence-weighted overall score and reliability level
  * (SourceReliabilityEngine :1008-1040).
  *
  * Faithful quirks preserved:
  *  - a source NOT in the authority database makes the reference's
  *    np.average(scores, weights) raise on length mismatch (:306-332 —
  *    3 scores vs 4 weights), so authority degrades to the error metric
  *    (score 0.3, confidence 0.1, weight 0.0) for every unknown-domain
  *    source;
  *  - the consistency sub-scores are the reference's own placeholder
  *    constants 0.7/0.75/0.8 (:537-570) — but the same-source lookup,
  *    a stub returning [] there (:533), is REAL here (a groupBy count
  *    on the normalized identifier), so the ≥2-nodes branch actually
  *    runs;
  *  - classification order is the reference's dict order, so e.g.
  *    "blog post" classifies as news_media ("post" is a news pattern
  *    checked before user_generated's "blog").
  *
  * DIVERGENCE: the reference caches by source identifier (:836-841), so
  * later nodes of a source inherit the FIRST node's content/metadata
  * scores; here every node is scored on its own row (the cache is a
  * perf artifact, not a semantic).
  *
  * Scale shape: everything is per-row column arithmetic except one
  * groupBy(count) on the identifier joined back — the natural
  * partial-aggregate + shuffle-on-key plan.
  */
object SourceReliability {

  /** Source-type patterns, reference dict order (:93-170); first listed
    * type with any pattern matching the lowercased source wins. */
  val TypePatterns: Seq[(String, Seq[String])] = Seq(
    "academic" -> Seq("""\.edu/""", "journal", "research", "academic",
      "university", """\.org.*research""", "peer.?review", "publication",
      "doi:", "arxiv", "pubmed", """scholar\.google"""),
    "governmental" -> Seq("""\.gov/""", """\.mil/""", "government",
      "ministry", "department", "agency", "official", """state\.""",
      "federal", "national"),
    "news_media" -> Seq("news", "times", "post", "herald", "guardian",
      "reuters", "associated.?press", "cnn", "bbc", "npr", "journalism"),
    "professional" -> Seq("association", "institute", "society",
      "professional", "industry", "trade", """\.org.*professional"""),
    "reference" -> Seq("encyclopedia", "dictionary", "reference",
      "britannica", "wikipedia", "reference.?work"),
    "user_generated" -> Seq("wiki", "blog", "forum", "reddit",
      "stackoverflow", "user.?generated", "community", "discussion"),
    "commercial" -> Seq("""\.com/""", "company", "corporation", "business",
      "marketing", "product", "service", "commercial"))

  val SourceTypes: Seq[String] =
    TypePatterns.map(_._1) :+ "unknown"

  // authority database (:268-292)
  val HighAuthority: Seq[String] = Seq("nature.com", "science.org",
    "nejm.org", "thelancet.com", "ieee.org", "acm.org", "springer.com",
    "elsevier.com", "nih.gov", "who.int", "cdc.gov", "fda.gov")
  val MediumAuthority: Seq[String] = Seq("wikipedia.org", "britannica.com",
    "reuters.com", "bbc.com", "npr.org", "pbs.org", "smithsonian.edu")
  val QuestionableMarkers: Seq[String] =
    Seq("tabloid", "conspiracy", "unverified", "clickbait")

  // content-authority probes (:388-414); the "high indicator" probe list
  // is the DOMAIN database — the reference scans content for domains
  val CitationPats: Seq[String] = Seq("""\[[0-9]+\]""",
    """\([^)]*\d{4}[^)]*\)""", "doi:", """et al\.""")
  val MethodologyWords: Seq[String] =
    Seq("method", "methodology", "experiment", "study", "analysis")

  // content-freshness indicator lists (:732-748)
  val RecentIndicators: Seq[String] = Seq("current", "recent", "latest",
    "now", "today", "this year", "2024", "2023")
  val OutdatedIndicators: Seq[String] = Seq("legacy", "deprecated",
    "obsolete", "outdated", "former", "previous")

  /** Reference metadata fields, typed; absent → null (`Meta()`). */
  final case class Meta(
      sourceType: Column, author: Column, publication: Column,
      institution: Column, peerReviewed: Column,
      publicationDate: Column, createdAt: Column, date: Column,
      timestamp: Column, updatedAt: Column, modifiedAt: Column,
      lastUpdated: Column)
  object Meta {
    private def noS: Column = lit(null).cast("string")
    private def noTs: Column = lit(null).cast("date")
    def apply(): Meta = Meta(noS, noS, noS, noS,
      lit(null).cast("boolean"), noTs, noTs, noTs, noTs, noTs, noTs, noTs)
  }

  /** Normalize a source string (:212-231): URLs → host+path with query/
    * fragment dropped and trailing slashes stripped; DOI citations →
    * `doi:<id>`; anything else whitespace-collapsed and capped at 200. */
  def normalizeIdentifier(src: Column): Column = {
    val doi = regexp_extract(src, """(?i)doi:\s*([^\s,]+)""", 1)
    when(src.startsWith("http://") || src.startsWith("https://"),
        regexp_replace(regexp_extract(src, "^https?://([^?#]*)", 1), "/+$", ""))
      .when(lower(src).contains("doi:") && doi =!= "",
        concat(lit("doi:"), doi))
      .otherwise(substring(regexp_replace(trim(src), """\s+""", " "), 1, 200))
  }

  /** Classify on the LOWERCASED raw source string (:233-250); a valid
    * metadata source_type short-circuits the patterns. */
  def classify(src: Column, metaType: Column): Column = {
    val lowered = lower(src)
    val chain = TypePatterns.foldLeft(when(lit(false), "never")) {
      case (w, (t, pats)) => w.when(lowered.rlike(pats.mkString("|")), t)
    }.otherwise("unknown")
    coalesce(when(metaType.isin(SourceTypes: _*), metaType), chain)
  }

  /** Authority-database tier (:352-371): high 0.9 / medium 0.7 /
    * questionable 0.2 / null (checked on the lowercased identifier). */
  def dbScore(identifier: Column): Column = {
    val idLower = lower(identifier)
    def anyOf(ds: Seq[String]): Column =
      ds.map(idLower.contains(_)).reduce(_ || _)
    when(anyOf(HighAuthority), 0.9)
      .when(anyOf(MediumAuthority), 0.7)
      .when(anyOf(QuestionableMarkers), 0.2)
      .otherwise(lit(null).cast("double"))
  }

  /** Type authority tiers (:373-386). */
  def typeScore(srcType: Column): Column =
    when(srcType === "academic", 0.9).when(srcType === "governmental", 0.8)
      .when(srcType === "professional", 0.7).when(srcType === "news_media", 0.6)
      .when(srcType === "reference", 0.7).when(srcType === "user_generated", 0.3)
      .when(srcType === "commercial", 0.4).otherwise(0.5)

  /** Content authority indicators (:388-414): +0.1 per known high-
    * authority domain in the content, +0.05 per citation pattern, +0.02
    * per methodology word, from a 0.5 base, capped at 1. */
  def contentScore(text: Column): Column = {
    val lowered = lower(text)
    val domains = HighAuthority
      .map(d => when(lowered.contains(d), 0.1).otherwise(0.0)).reduce(_ + _)
    val cites = CitationPats
      .map(p => when(text.rlike(p), 0.05).otherwise(0.0)).reduce(_ + _)
    val meth = MethodologyWords
      .map(w => when(lowered.contains(w), 0.02).otherwise(0.0)).reduce(_ + _)
    least(lit(0.5) + domains + cites + meth, lit(1.0))
  }

  /** Metadata authority indicators (:416-439). */
  def metadataScore(m: Meta): Column = {
    val authorCred = when(m.author.isNotNull &&
      Seq("dr.", "ph.d", "professor", "phd")
        .map(lower(m.author).contains(_)).reduce(_ || _), 0.2).otherwise(0.0)
    val pubCred = when(m.publication.isNotNull &&
      Seq("journal", "review", "proceedings")
        .map(lower(m.publication).contains(_)).reduce(_ || _), 0.1).otherwise(0.0)
    val inst = when(m.institution.isNotNull, 0.1).otherwise(0.0)
    val peer = when(m.peerReviewed === true, 0.2).otherwise(0.0)
    least(lit(0.5) + authorCred + pubCred + inst + peer, lit(1.0))
  }

  private def ageDays(now: Column, ts: Column): Column = datediff(now, ts)

  /** Publication-date freshness tiers (:654-691); null when no
    * publication-ish timestamp field is present. */
  def publicationFreshness(now: Column, m: Meta): Column = {
    val ts = coalesce(m.publicationDate, m.createdAt, m.date, m.timestamp)
    val age = ageDays(now, ts)
    when(ts.isNull, lit(null).cast("double"))
      .when(age <= 30, 1.0).when(age <= 90, 0.9).when(age <= 180, 0.7)
      .when(age <= 365, 0.5).when(age <= 730, 0.3).otherwise(0.1)
  }

  /** Update freshness tiers (:693-729). */
  def updateFreshness(now: Column, m: Meta): Column = {
    val ts = coalesce(m.updatedAt, m.modifiedAt, m.lastUpdated)
    val age = ageDays(now, ts)
    when(ts.isNull, lit(null).cast("double"))
      .when(age <= 7, 1.0).when(age <= 30, 0.9).when(age <= 90, 0.7)
      .when(age <= 180, 0.5).otherwise(0.3)
  }

  /** Content temporal-relevance indicators (:731-761), clamped to
    * [0.1, 1.0]. */
  def contentFreshness(text: Column): Column = {
    val lowered = lower(text)
    def cnt(ws: Seq[String]): Column =
      ws.map(w => when(lowered.contains(w), 1).otherwise(0)).reduce(_ + _)
    val recent = cnt(RecentIndicators)
    val outdated = cnt(OutdatedIndicators)
    val s = lit(0.5) +
      when(recent > 0, least(recent * lit(0.1), lit(0.3))).otherwise(0.0) -
      when(outdated > 0, least(outdated * lit(0.1), lit(0.3))).otherwise(0.0)
    greatest(lit(0.1), least(s, lit(1.0)))
  }

  /** Assess a frame. Adds:
    * source_identifier, source_type, n_same_source,
    * authority_score/confidence/weight, consistency_score/confidence,
    * freshness_score/confidence, reliability_score, reliability_level,
    * assessment_confidence. */
  def assess(df: DataFrame, srcCol: String, textCol: String, now: Column,
      m: Meta): DataFrame = {
    val src = col(srcCol)
    val text = col(textCol)

    val withId = df
      .withColumn("source_identifier", normalizeIdentifier(src))
      .withColumn("source_type", classify(src, m.sourceType))
    val counts = withId.groupBy(col("source_identifier"))
      .agg(count(lit(1)).as("n_same_source"))
    val joined = withId.join(counts, Seq("source_identifier"))

    val db = dbScore(col("source_identifier"))
    val knownDomain = (HighAuthority ++ MediumAuthority)
      .map(d => lower(col("source_identifier")).contains(d)).reduce(_ || _)
    // success path: np.average(4 scores, weights [.4,.2,.2,.2]);
    // evidence count is always 4 there, so the evidence boost is the
    // capped 0.2. db miss → the reference's exception path (see header).
    val authority = db * 0.4 + typeScore(col("source_type")) * 0.2 +
      contentScore(text) * 0.2 + metadataScore(m) * 0.2
    val authorityConf = least(lit(0.5) +
      when(knownDomain, 0.3).otherwise(0.0) +
      when(col("source_type").isin("academic", "governmental"), 0.2)
        .otherwise(0.0) + lit(0.2), lit(1.0))

    val pubF = publicationFreshness(now, m)
    val updF = updateFreshness(now, m)
    val contF = contentFreshness(text)
    val nFresh = when(pubF.isNotNull, 1).otherwise(0) +
      when(updF.isNotNull, 1).otherwise(0) + lit(1)
    val freshScore =
      (coalesce(pubF, lit(0.0)) + coalesce(updF, lit(0.0)) + contF) / nFresh

    joined
      .withColumn("authority_score", when(db.isNull, 0.3).otherwise(authority))
      .withColumn("authority_confidence",
        when(db.isNull, 0.1).otherwise(authorityConf))
      .withColumn("authority_weight", when(db.isNull, 0.0).otherwise(0.3))
      .withColumn("consistency_score",
        when(col("n_same_source") < 2, 0.6).otherwise((0.7 + 0.75 + 0.8) / 3))
      .withColumn("consistency_confidence",
        when(col("n_same_source") < 2, 0.3)
          .otherwise(least(col("n_same_source") / lit(10.0), lit(1.0))))
      .withColumn("freshness_score", freshScore)
      .withColumn("freshness_confidence", when(nFresh >= 2, 0.8).otherwise(0.5))
      .withColumn("reliability_score", {
        val num = col("authority_score") * col("authority_weight") *
            col("authority_confidence") +
          col("consistency_score") * lit(0.2) * col("consistency_confidence") +
          col("freshness_score") * lit(0.15) * col("freshness_confidence")
        val den = col("authority_weight") * col("authority_confidence") +
          lit(0.2) * col("consistency_confidence") +
          lit(0.15) * col("freshness_confidence")
        greatest(lit(0.0), least(num / den, lit(1.0)))
      })
      .withColumn("reliability_level",
        when(col("reliability_score") >= 0.9, "highly_reliable")
          .when(col("reliability_score") >= 0.7, "reliable")
          .when(col("reliability_score") >= 0.5, "moderately_reliable")
          .when(col("reliability_score") >= 0.3, "questionable")
          .otherwise("unreliable"))
      .withColumn("assessment_confidence", {
        val avg = (col("authority_confidence") + col("consistency_confidence") +
          col("freshness_confidence")) / 3
        val reliable = when(col("authority_confidence") > 0.7, 1).otherwise(0) +
          when(col("consistency_confidence") > 0.7, 1).otherwise(0) +
          when(col("freshness_confidence") > 0.7, 1).otherwise(0)
        least(avg + least(reliable * lit(0.1), lit(0.2)), lit(1.0))
      })
  }
}
