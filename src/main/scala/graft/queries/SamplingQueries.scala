package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.Lineage.LineageOps
import graft.pipeline.Sampling

/** Deterministic sampling / split family (training-pipeline mandate):
  * reproducible train/val/test assignment and per-group quota sampling
  * over the documents corpus. No reference counterpart — the oracle
  * gate checks the portable-hash arithmetic agrees across engines,
  * which is the whole point of hash-keyed sampling.
  */
object SamplingQueries {

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  private def bucketSql(key: String, buckets: Int, salt: String) =
    Sampling.sql.hashBucket(key, buckets, salt)

  // -- q111: train/val/test split assignment, 98/1/1 by doc_id hash.
  //          Per-key, so appends never reassign existing rows.
  private def q111(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 98, "val" -> 1, "test" -> 1), salt = "v1")
          .as("split"))
      .orderBy(col("doc_id"))

  private val q111Sql =
    s"""SELECT doc_id, source,
       |  CASE WHEN ${bucketSql("doc_id", 100, "v1")} < 98 THEN 'train'
       |       WHEN ${bucketSql("doc_id", 100, "v1")} < 99 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // -- q112: per-source quota sample — the 10 docs of each source with
  //          the smallest (hash, doc_id); stable under appends to other
  //          sources.
  private def q112(s: SparkSession, dir: String): DataFrame =
    Sampling.quotaSample(docs(s, dir), col("source"), col("doc_id"),
        quota = 10, salt = "v1")
      .select(col("source"), col("doc_id"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))

  private val q112Sql =
    s"""SELECT source, doc_id, sample_rank FROM (
       |  SELECT source, doc_id, CAST(row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY ${bucketSql("doc_id", 1000000000, "v1")}, doc_id)
       |    AS INT) AS sample_rank
       |  FROM documents)
       |WHERE sample_rank <= 10
       |ORDER BY source, sample_rank""".stripMargin

  // -- q115: benchmark decontamination — training docs sharing word
  //          8-grams with the held-out set (source 'src0' stands in as
  //          the benchmark). Inverted-index join on hashed shingles;
  //          the oracle replays the identical hash arithmetic.
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.pipeline.Decontaminate.sharedNgrams(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"),
        "doc_id", "text", n = 8, minShared = 1L)
      .select(col("train_id"), col("bench_id"), col("n_shared"))
      .orderBy(col("train_id"), col("bench_id"))
  }

  private val q115Sql = {
    val sh = graft.pipeline.Decontaminate.sql
      .shingleHashes("string_split(text, ' ')", 8)
    s"""WITH sh AS (
       |  SELECT doc_id, source, unnest($sh) AS g_id FROM documents),
       |t AS (SELECT doc_id AS train_id, g_id FROM sh WHERE source <> 'src0'),
       |b AS (SELECT doc_id AS bench_id, g_id FROM sh WHERE source = 'src0')
       |SELECT train_id, bench_id, count(*) AS n_shared
       |FROM t JOIN b USING (g_id)
       |GROUP BY 1, 2 HAVING count(*) >= 1
       |ORDER BY train_id, bench_id""".stripMargin
  }

  // -- q116: end-to-end corpus build — the composition a training-data
  //          pipeline actually runs: quality gate -> exact dedup (keep
  //          the smallest doc_id per canonical token-set key) -> split
  //          assignment -> per-(source, split) manifest. Every leg is an
  //          existing operator; the gate checks the composition.
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("dkey"))
    docs(s, dir)
      .withColumn("quality", TF.qualityScore(col("text"), col("n_chars")))
      .filter(col("quality") >= 0.75)
      .withColumn("dkey",
        md5(array_join(array_sort(TF.distinctTokens(col("text"))), " ")))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .withColumn("split", Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 98, "val" -> 1, "test" -> 1), salt = "v1"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TF.tokens(col("text")))).as("n_tokens"),
        round(avg(col("quality")), 6).as("avg_quality"))
      .orderBy(col("source"), col("split"))
  }

  private val q116Sql = {
    import graft.text.{TextFunctions => TF}
    val quality = TF.sql.qualityScore("text", "n_chars")
    s"""WITH gated AS (
       |  SELECT doc_id, source, text, $quality AS quality,
       |    md5(array_to_string(list_sort(${TF.sql.distinctTokens("text")}), ' ')) AS dkey
       |  FROM documents WHERE $quality >= 0.75),
       |kept AS (
       |  SELECT *, min(doc_id) OVER (PARTITION BY dkey) AS keep_id FROM gated),
       |assigned AS (
       |  SELECT source, quality, ${TF.sql.tokenCount("text")} AS n_toks,
       |    CASE WHEN ${bucketSql("doc_id", 100, "v1")} < 98 THEN 'train'
       |         WHEN ${bucketSql("doc_id", 100, "v1")} < 99 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM kept WHERE doc_id = keep_id)
       |SELECT source, split, count(*) AS n_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |  round(avg(quality), 6) AS avg_quality
       |FROM assigned GROUP BY 1, 2 ORDER BY source, split""".stripMargin
  }

  // -- q117: token-window chunking (64-token windows, 16 overlap) — the
  //          context-bounding step between corpus build and tokenization.
  //          Chunk text is verified via its fingerprint (content-exact
  //          without shipping the text through the compare).
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    graft.pipeline.Chunking.chunk(docs(s, dir), "doc_id", "text",
        size = 64, overlap = 16)
      .select(col("doc_id"), col("chunk_id"), col("n_tok"),
        TF.fingerprint(col("chunk_text")).as("fp"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val q117Sql = {
    import graft.text.{TextFunctions => TF}
    val ch = graft.pipeline.Chunking.sql
      .chunks("string_split(text, ' ')", 64, 16)
    s"""WITH c AS (
       |  SELECT doc_id, unnest($ch, recursive := true) FROM documents)
       |SELECT doc_id, chunk_id, n_tok,
       |  ${TF.sql.fingerprint("chunk_text")} AS fp
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  // -- q125: PII scrub (pipeline mandate, no reference counterpart) —
  //          per-kind detection counts + redaction, verified through the
  //          md5 of the redacted text. The synthetic corpus carries no
  //          PII, so a deterministic doc_id-derived tail plants emails /
  //          phones / SSNs / IPs / card numbers that BOTH engines build
  //          identically; the scrub itself is pure per-row regex.
  private def q125(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.PiiScrub
    def pad4(c: org.apache.spark.sql.Column) =
      lpad((c % 10000).cast("string"), 4, "0")
    val id = col("doc_id")
    val aug = docs(s, dir).select(id, concat(
      col("text"),
      when(id % 3 === 0, concat(lit(" contact user"), id.cast("string"),
        lit("@example.com"))).otherwise(""),
      when(id % 5 === 0, concat(lit(" call 555-010-"), pad4(id)))
        .otherwise(""),
      when(id % 7 === 0, concat(lit(" ssn 123-45-"), pad4(id)))
        .otherwise(""),
      when(id % 4 === 0, concat(lit(" from 10.0."),
        (id % 256).cast("string"), lit("."), (id % 100).cast("string")))
        .otherwise(""),
      when(id % 11 === 0, concat(lit(" card 4111-1111-1111-"), pad4(id)))
        .otherwise("")).as("text"))
    aug.select(col("doc_id"),
        PiiScrub.count(col("text"), "email").as("n_email"),
        PiiScrub.count(col("text"), "card").as("n_card"),
        PiiScrub.count(col("text"), "ssn").as("n_ssn"),
        PiiScrub.count(col("text"), "phone").as("n_phone"),
        PiiScrub.count(col("text"), "ip").as("n_ip"),
        md5(PiiScrub.redact(col("text"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  private val q125Sql = {
    import graft.pipeline.PiiScrub
    val pats = PiiScrub.patterns.map(_._2)
    val (em, cd, ssn, ph, ip) = (pats(0), pats(1), pats(2), pats(3), pats(4))
    val redacted = PiiScrub.patterns.foldLeft("text") {
      case (expr, (_, pat, mask)) =>
        s"regexp_replace($expr, '$pat', '$mask', 'g')"
    }
    s"""WITH aug AS (
       |  SELECT doc_id, text
       |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id
       |         || '@example.com' ELSE '' END
       |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-010-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |       ELSE '' END
       |    || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |       ELSE '' END
       |    || CASE WHEN doc_id % 4 = 0 THEN ' from 10.0.'
       |         || CAST(doc_id % 256 AS VARCHAR) || '.'
       |         || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
       |    || CASE WHEN doc_id % 11 = 0 THEN ' card 4111-1111-1111-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |       ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$cd')) AS INT) AS n_card,
       |  CAST(len(regexp_extract_all(text, '$ssn')) AS INT) AS n_ssn,
       |  CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phone,
       |  CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ip,
       |  md5($redacted) AS redacted_md5
       |FROM aug ORDER BY doc_id""".stripMargin
  }

  // -- q127: temperature-scaled mixture plan over the skewed lang
  //          column (218 en … 64 fr at sf0.01), T=2 flattens toward
  //          uniform. `realized` counts actual copies emitted by the
  //          mix() epoch-explode — the oracle derives the same number
  //          arithmetically (full_epochs·n + remainder = quota), so the
  //          two engines confirm the quota through different paths.
  private def q127(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Mixing
    val d = docs(s, dir)
    val realized = Mixing.mix(d, "lang", "doc_id", 2.0, 1000L)
      .groupBy(col("lang").as("source"))
      .agg(count(lit(1)).as("realized"))
    Mixing.plan(d, "lang", 2.0, 1000L)
      .join(realized, Seq("source"), "left")
      .withColumn("realized", coalesce(col("realized"), lit(0L)))
      .orderBy(col("source"))
  }

  private val q127Sql =
    """WITH counts AS (
      |  SELECT lang AS source, count(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (SELECT sum(n_docs) AS n_total FROM counts),
      |w AS (
      |  SELECT source, n_docs, pow(n_docs * 1.0 / n_total, 1.0 / 2.0) AS w
      |  FROM counts, tot),
      |ws AS (SELECT sum(w) AS w_sum FROM w),
      |q AS (
      |  SELECT source, n_docs, w / w_sum AS p,
      |    CAST(round(w / w_sum * 1000) AS BIGINT) AS quota FROM w, ws)
      |SELECT source, n_docs, round(p, 6) AS p, quota,
      |  quota // n_docs AS full_epochs, quota % n_docs AS remainder,
      |  (quota // n_docs) * n_docs + quota % n_docs AS realized
      |FROM q ORDER BY source""".stripMargin

  // -- q132: split-leakage audit — the train/eval overlap report a
  //          pipeline publishes after splitting (GPT-3/PaLM-style
  //          contamination tables): for each val/test document of the
  //          q111 assignment, how many TRAIN documents share 8-token
  //          word n-grams with it, and how hard is the worst overlap.
  //          Pure composition: q111's deterministic split feeds q115's
  //          inverted-index join; eval docs with zero overlap still
  //          report (left join), because "no leakage" is the result
  //          that matters. leaked >= 3 shared shingles separates real
  //          near-dup leakage from single-phrase collisions here.
  private def q132(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("split",
      Sampling.splitColumn(col("doc_id"),
        Seq("train" -> 98, "val" -> 1, "test" -> 1), salt = "v1"))
    val shared = graft.pipeline.Decontaminate.sharedNgrams(
        d.filter(col("split") === "train"),
        d.filter(col("split") =!= "train"),
        "doc_id", "text", n = 8, minShared = 1L)
      .withColumnRenamed("bench_id", "eval_id")
    d.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_id"), col("split"))
      .join(shared, Seq("eval_id"), "left")
      .groupBy(col("eval_id"), col("split"))
      .agg(count(col("train_id")).as("n_train_docs"),
        coalesce(sum(col("n_shared")), lit(0L)).as("total_shared"),
        coalesce(max(col("n_shared")), lit(0L)).as("max_shared"))
      .withColumn("leaked", col("max_shared") >= 3L)
      .orderBy(col("eval_id"))
  }

  private val q132Sql = {
    val sh = graft.pipeline.Decontaminate.sql
      .shingleHashes("string_split(text, ' ')", 8)
    s"""WITH sp AS (
       |  SELECT doc_id, text,
       |    CASE WHEN ${bucketSql("doc_id", 100, "v1")} < 98 THEN 'train'
       |         WHEN ${bucketSql("doc_id", 100, "v1")} < 99 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |sh AS (SELECT doc_id, split, unnest($sh) AS g_id FROM sp),
       |t AS (SELECT doc_id AS train_id, g_id FROM sh WHERE split = 'train'),
       |e AS (SELECT doc_id AS eval_id, g_id FROM sh WHERE split <> 'train'),
       |pair AS (
       |  SELECT eval_id, train_id, count(*) AS n_shared
       |  FROM e JOIN t USING (g_id) GROUP BY 1, 2)
       |SELECT s.doc_id AS eval_id, s.split,
       |  count(p.train_id) AS n_train_docs,
       |  CAST(coalesce(sum(p.n_shared), 0) AS BIGINT) AS total_shared,
       |  coalesce(max(p.n_shared), 0) AS max_shared,
       |  coalesce(max(p.n_shared), 0) >= 3 AS leaked
       |FROM sp s LEFT JOIN pair p ON p.eval_id = s.doc_id
       |WHERE s.split <> 'train'
       |GROUP BY 1, 2 ORDER BY eval_id""".stripMargin
  }

  // -- q133: per-source curriculum buckets — decile the corpus by
  //          bigram-LM difficulty (q129's cross-entropy) WITHIN each
  //          source and report per-bucket stats, the assignment a
  //          curriculum-ordered training run consumes. Partitioned
  //          ntile, not a global one: per-source windows scale (the
  //          global-order form would collapse to one partition). The
  //          decile boundary doubles are bit-identical cross-engine
  //          (position-ordered fold, see NgramLm), so the ntile
  //          assignment is too; min/max ppl are order statistics, so
  //          no shuffle-order float summation leaks into the output.
  private def q133(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{NgramLm, Repetition}
    val d = docs(s, dir)
    val toks = d.select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("ce"), col("doc_id"))
    NgramLm.score(toks)
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("bucket", ntile(10).over(w))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams") + 1L).as("n_tokens"),
        round(min(exp(col("ce"))), 6).as("min_ppl"),
        round(max(exp(col("ce"))), 6).as("max_ppl"))
      .orderBy(col("source"), col("bucket"))
  }

  private val q133Sql =
    s"""WITH ${graft.text.NgramLm.sql.scoreCtes},
       |bk AS (
       |  SELECT a.doc_id, d.source, a.n_bigrams, a.ce,
       |    ntile(10) OVER (PARTITION BY d.source ORDER BY a.ce, a.doc_id)
       |      AS bucket
       |  FROM lmagg a JOIN documents d USING (doc_id))
       |SELECT source, CAST(bucket AS INT) AS bucket,
       |  count(*) AS n_docs,
       |  CAST(sum(n_bigrams + 1) AS BIGINT) AS n_tokens,
       |  round(min(exp(ce)), 6) AS min_ppl,
       |  round(max(exp(ce)), 6) AS max_ppl
       |FROM bk GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  // -- q134: token-budget data selection — keep the highest-quality
  //          documents until a global token budget is exhausted
  //          (data-pruning under budget). The selection key is
  //          INTEGER quality milli-units (round(quality*1000), ties by
  //          doc_id) so ordering and the running total are exact
  //          integer arithmetic on both engines. Two-phase plan, not a
  //          global cumsum window: quality∈[0,1] means ≤1001 distinct
  //          keys, so phase 1 aggregates tokens per key (the only
  //          unpartitioned window runs over that ≤1001-row frame) and
  //          phase 2 adds a PER-KEY doc_id-ordered window — nothing
  //          sequential ever sees the full corpus, which is what makes
  //          this survive 100 TB where `sum() OVER (ORDER BY ...)`
  //          over all rows cannot. The oracle takes the global-cumsum
  //          road, proving the two-phase decomposition exact.
  private val TokenBudget = 15000L

  private def q134(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val W = org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"),
      round(TF.qualityScore(col("text"), col("n_chars")) * 1000)
        .cast("long").as("q_milli"),
      TF.tokenCount(col("text")).cast("long").as("n_tok"))
    val perKey = d.groupBy(col("q_milli"))
      .agg(sum(col("n_tok")).as("key_tokens"))
    val before = W.orderBy(col("q_milli").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val cum = perKey.withColumn("tokens_before",
      coalesce(sum(col("key_tokens")).over(before), lit(0L)))
    val within = W.partitionBy(col("q_milli")).orderBy(col("doc_id"))
    d.join(cum.select(col("q_milli"), col("tokens_before")), Seq("q_milli"))
      .withColumn("cum_tokens",
        col("tokens_before") + sum(col("n_tok")).over(within))
      .filter(col("cum_tokens") <= TokenBudget)
      .select(col("doc_id"), col("q_milli"), col("n_tok"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  private val q134Sql = {
    import graft.text.{TextFunctions => TF}
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(round(${TF.sql.qualityScore("text", "n_chars")} * 1000)
       |      AS BIGINT) AS q_milli,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_tok
       |  FROM documents),
       |sel AS (
       |  SELECT doc_id, q_milli, n_tok,
       |    CAST(sum(n_tok) OVER (ORDER BY q_milli DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM d)
       |SELECT doc_id, q_milli, n_tok, cum_tokens
       |FROM sel WHERE cum_tokens <= $TokenBudget
       |ORDER BY doc_id""".stripMargin
  }

  // -- q138: batch padding-waste analysis — length-bucketed batching
  //          efficiency: docs bucketed by power-of-2 token-length bins
  //          (bucket = bit-length of n_tok, an exact INTEGER stand-in
  //          for floor(log2)+1 — no libm log2 whose last bit could
  //          differ cross-engine), then per-bucket padded-token cost if
  //          every doc pads to the bucket max, waste vs actual tokens.
  //          The report a batching curator reads to pick bucket
  //          boundaries before packing (q117's chunker feeds this).
  //          Scale shape: one scan + one aggregate whose output is
  //          bounded by the bit-length of the longest document (~dozens
  //          of rows at any corpus size); everything else is arithmetic
  //          on that bounded frame.
  private def q138(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val d = docs(s, dir).select(
      TF.tokenCount(col("text")).cast("long").as("n_tok"))
    d.withColumn("bucket", length(bin(col("n_tok"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        max(col("n_tok")).as("max_tok"))
      .withColumn("padded_tok", col("n_docs") * col("max_tok"))
      .withColumn("waste_tok", col("padded_tok") - col("sum_tok"))
      .withColumn("waste_rate",
        round(col("waste_tok") * lit(1.0) / col("padded_tok"), 6))
      .orderBy(col("bucket"))
  }

  private val q138Sql = {
    import graft.text.{TextFunctions => TF}
    s"""WITH d AS (
       |  SELECT CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_tok
       |  FROM documents),
       |b AS (
       |  SELECT length(bin(n_tok)) AS bucket, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS sum_tok, max(n_tok) AS max_tok
       |  FROM d GROUP BY 1)
       |SELECT bucket, n_docs, sum_tok, max_tok,
       |  n_docs * max_tok AS padded_tok,
       |  n_docs * max_tok - sum_tok AS waste_tok,
       |  round((n_docs * max_tok - sum_tok) * 1.0 / (n_docs * max_tok), 6)
       |    AS waste_rate
       |FROM b ORDER BY bucket""".stripMargin
  }

  // -- q139: corpus filter funnel — the survival report a pipeline run
  //          prints: per-source counts of documents surviving each gate
  //          applied IN ORDER (language -> repetition -> perplexity ->
  //          quality), composing q32's language ID, q128's Gopher-style
  //          repetition rules, q129's bigram-LM perplexity cut and
  //          q33's quality score into one aggregation pass. Docs under
  //          2 tokens have no repetition/LM stats and fail those gates
  //          (left-join null -> false on both engines). Every gate
  //          compares ROUNDED milli/6-decimal values so the boolean is
  //          bit-identical cross-engine (same contract as the source
  //          queries). Scale shape: all gates are scan-local column
  //          arithmetic except the LM join (vocab-bounded model frames,
  //          broadcast — q129's shape); output is #sources rows.
  private def q139(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{NgramLm, Repetition, TextFunctions => TF}
    val d = docs(s, dir)
    val toks = d.select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
      .filter(size(col("l")) >= 2)
    val rep = toks
      .withColumn("ws", Repetition.runStats(col("l")))
      .withColumn("bs", Repetition.runStats(Repetition.bigrams(col("l"))))
      .withColumn("n_words", size(col("l")).cast("long"))
      .withColumn("n_bi", (size(col("l")) - 1).cast("long"))
      .select(col("doc_id"),
        ((round(Repetition.topShare(col("ws"), col("n_words")), 6) <= 0.12d) &&
          (round(Repetition.dupFraction(col("bs"), col("n_bi")), 6) <= 0.10d))
          .as("rep_ok"))
    val lm = NgramLm.score(toks).select(col("doc_id"),
      (round(exp(col("ce")), 6) <= 18.0d).as("ppl_ok"))
    d.select(col("doc_id"), col("source"),
        (TF.langId(col("text")) === lit("en")).as("lang_ok"),
        (round(TF.qualityScore(col("text"), col("n_chars")), 6) >= 0.5d)
          .as("q_ok"))
      .join(rep, Seq("doc_id"), "left")
      .join(lm, Seq("doc_id"), "left")
      .select(col("source"), col("lang_ok"), col("q_ok"),
        coalesce(col("rep_ok"), lit(false)).as("rep_ok"),
        coalesce(col("ppl_ok"), lit(false)).as("ppl_ok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("lang_ok") && col("rep_ok"), 1L).otherwise(0L))
          .as("n_rep"),
        sum(when(col("lang_ok") && col("rep_ok") && col("ppl_ok"), 1L)
          .otherwise(0L)).as("n_ppl"),
        sum(when(col("lang_ok") && col("rep_ok") && col("ppl_ok") &&
          col("q_ok"), 1L).otherwise(0L)).as("n_final"))
      .withColumn("survival_rate",
        round(col("n_final") * lit(1.0) / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  private val q139Sql = {
    import graft.text.{NgramLm, TextFunctions => TF}
    s"""WITH ${NgramLm.sql.scoreCtes},
       |words AS (SELECT doc_id, unnest(l) AS w FROM scoped),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
       |wagg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS topw
       |  FROM wc GROUP BY 1),
       |bi AS (
       |  SELECT doc_id, l[i] || ' ' || l[i+1] AS b
       |  FROM scoped, unnest(range(1, len(l))) r(i)),
       |bc AS (SELECT doc_id, b, count(*) AS c FROM bi GROUP BY 1, 2),
       |bagg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi,
       |    coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dupb
       |  FROM bc GROUP BY 1),
       |rep AS (
       |  SELECT doc_id,
       |    round(topw * 1.0 / n_words, 6) <= 0.12
       |      AND round(dupb * 1.0 / n_bi, 6) <= 0.10 AS rep_ok
       |  FROM wagg JOIN bagg USING (doc_id)),
       |flags AS (
       |  SELECT d.source,
       |    (${TF.sql.langId("text")} = 'en') AS lang_ok,
       |    (round(${TF.sql.qualityScore("text", "n_chars")}, 6) >= 0.5)
       |      AS q_ok,
       |    coalesce(r.rep_ok, false) AS rep_ok,
       |    coalesce(round(exp(g.ce), 6) <= 18.0, false) AS ppl_ok
       |  FROM documents d
       |  LEFT JOIN rep r USING (doc_id)
       |  LEFT JOIN lmagg g USING (doc_id))
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
       |  CAST(sum(CASE WHEN lang_ok AND rep_ok THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_rep,
       |  CAST(sum(CASE WHEN lang_ok AND rep_ok AND ppl_ok THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_ppl,
       |  CAST(sum(CASE WHEN lang_ok AND rep_ok AND ppl_ok AND q_ok
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
       |  round(sum(CASE WHEN lang_ok AND rep_ok AND ppl_ok AND q_ok
       |    THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS survival_rate
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }

  // -- q141: output shard manifest — the write plan a corpus build ends
  //          with: walk the documents in doc_id order and start a new
  //          output shard every ShardTokens tokens (a doc belongs to the
  //          shard its FIRST token lands in, the sequence-writer
  //          convention, so shards are contiguous doc_id ranges). The
  //          assignment needs an exclusive global token prefix-sum, which
  //          a `sum() OVER (ORDER BY doc_id)` cannot provide at scale
  //          (one sequential pass over the corpus) — so it is computed as
  //          a TWO-LEVEL prefix sum: per-range token totals (range =
  //          doc_id div 1024) cumsum'd over the small boundary frame,
  //          plus a doc_id-ordered window WITHIN each range. Nothing
  //          sequential ever sees more than corpus/1024 rows (recursive
  //          application squares the compression if the boundary frame
  //          itself outgrows a partition). The oracle takes the global
  //          cumsum road, proving the decomposition exact. shard_id uses
  //          integer `div`, never float division, so the boundary doc of
  //          every shard is bit-identical cross-engine.
  private val ShardTokens = 4096L
  private val RangeWidth = 1024L

  private def q141(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val W = org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("rng", expr(s"doc_id div $RangeWidth"))
    val beforeRange = W.orderBy(col("rng"))
      .rowsBetween(W.unboundedPreceding, -1)
    val rangeCum = d.groupBy(col("rng"))
      .agg(sum(col("n_tok")).as("range_tokens"))
      .withColumn("range_before",
        coalesce(sum(col("range_tokens")).over(beforeRange), lit(0L)))
    val within = W.partitionBy(col("rng")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    d.join(rangeCum.select(col("rng"), col("range_before")), Seq("rng"))
      .withColumn("tokens_before",
        col("range_before") + coalesce(sum(col("n_tok")).over(within), lit(0L)))
      .withColumn("shard_id", expr(s"tokens_before div $ShardTokens"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  private val q141Sql = {
    import graft.text.{TextFunctions => TF}
    s"""WITH d AS (
       |  SELECT doc_id, CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tokens_before
       |  FROM d)
       |SELECT tokens_before // $ShardTokens AS shard_id,
       |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin
  }

  // -- q203: packed-sequence manifest — GPT-style concat-stream packing
  //          (documents laid end-to-end in doc_id order, cut every
  //          PackLen tokens): for every packed sequence, its token
  //          fill, how many documents touch it, how many start in it,
  //          and how many continue past it (the attention-fragmentation
  //          statistic packing trades against q138's padding waste).
  //          Two-phase exact cumsum like q134 — phase 1 aggregates
  //          tokens per 100-doc shard (the only unpartitioned window
  //          runs over the shard frame, corpus/100 rows), phase 2 is a
  //          per-shard doc-ordered window; the oracle drives the same
  //          numbers off a global cumsum, proving the decomposition.
  //          Each doc then explodes into its [first_seq, last_seq]
  //          range (fan-out = spans, ≈ n_seqs + n_docs rows) and one
  //          keyed rollup builds the manifest. Everything integer.
  private val PackLen = 512L

  private def q203(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val W = org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("shard", expr("doc_id div 100"))
    val perShard = d.groupBy(col("shard"))
      .agg(sum(col("n_tok")).as("shard_tokens"))
    val before = W.orderBy(col("shard"))
      .rowsBetween(W.unboundedPreceding, -1)
    val shardCum = perShard.withColumn("shard_before",
      coalesce(sum(col("shard_tokens")).over(before), lit(0L)))
    val within = W.partitionBy(col("shard")).orderBy(col("doc_id"))
    val spans = d
      .join(shardCum.select(col("shard"), col("shard_before")), Seq("shard"))
      .withColumn("cum_before",
        col("shard_before") + sum(col("n_tok")).over(within) - col("n_tok"))
      .withColumn("s0", expr(s"cum_before div $PackLen"))
      .withColumn("s1", expr(s"(cum_before + n_tok - 1) div $PackLen"))
    spans.select(col("cum_before"), col("n_tok"), col("s0"), col("s1"),
        explode(sequence(col("s0"), col("s1"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(
        sum(least(col("cum_before") + col("n_tok"),
            (col("seq_id") + 1) * PackLen) -
          greatest(col("cum_before"), col("seq_id") * PackLen))
          .as("n_tokens"),
        count(lit(1)).as("n_docs"),
        sum(when(col("s0") === col("seq_id"), 1L).otherwise(0L))
          .as("n_starting"),
        sum(when(col("s1") > col("seq_id"), 1L).otherwise(0L))
          .as("n_crossing"))
      .orderBy(col("seq_id"))
  }

  private val q203Sql = {
    import graft.text.{TextFunctions => TF}
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_tok
       |  FROM documents
       |  WHERE ${TF.sql.tokenCount("text")} > 0),
       |c AS (
       |  SELECT doc_id, n_tok,
       |    CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) - n_tok AS cum_before
       |  FROM d),
       |spans AS (
       |  SELECT cum_before, n_tok,
       |    cum_before // $PackLen AS s0,
       |    (cum_before + n_tok - 1) // $PackLen AS s1
       |  FROM c),
       |x AS (
       |  SELECT cum_before, n_tok, s0, s1, seq_id
       |  FROM spans, unnest(range(s0, s1 + 1)) r(seq_id))
       |SELECT seq_id,
       |  CAST(sum(least(cum_before + n_tok, (seq_id + 1) * $PackLen)
       |    - greatest(cum_before, seq_id * $PackLen)) AS BIGINT)
       |    AS n_tokens,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN s0 = seq_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_starting,
       |  CAST(sum(CASE WHEN s1 > seq_id THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_crossing
       |FROM x GROUP BY seq_id
       |ORDER BY seq_id""".stripMargin
  }

  // -- q210: blocklist screening — the lexicon-gate every public
  //          pipeline runs beside PII scrubbing (q125): token-boundary
  //          matches against a fixed blocklist, per-document hit counts
  //          for the quarantine queue plus the distinct terms that
  //          fired. The lexicon is a bounded constant (real pipelines
  //          ship lists like LDNOOBW — the demo lexicon here picks
  //          terms of the synthetic corpus vocabulary, plus one absent
  //          term exercising the zero path); matching is one scan-local
  //          regexp per term — cost is lexicon × corpus, linear in
  //          both, no shuffle before the rollup.
  private val Blocklist = Seq("slow", "dup", "big", "merge", "vector",
    "stale")

  private def q210(s: SparkSession, dir: String): DataFrame = {
    val hits = Blocklist.map { w =>
      size(regexp_extract_all(lower(col("text")),
        lit("\\b" + w + "\\b"), lit(0))).cast("long").as(s"h_$w")
    }
    val total = Blocklist.map(w => col(s"h_$w")).reduce(_ + _)
    val terms = concat_ws(",",
      Blocklist.map(w => when(col(s"h_$w") > 0, lit(w))): _*)
    docs(s, dir)
      .select(col("doc_id") +: col("source") +: hits: _*)
      .withColumn("n_hits", total)
      .filter(col("n_hits") > 0)
      .withColumn("terms", terms)
      .select(col("doc_id"), col("source"), col("n_hits"), col("terms"))
      .orderBy(col("doc_id"))
  }

  private val q210Sql = {
    val hitExprs = Blocklist.map(w =>
      s"len(regexp_extract_all(lower(text), '\\b$w\\b')) AS h_$w")
      .mkString(",\n    ")
    val total = Blocklist.map(w => s"h_$w").mkString(" + ")
    val terms = "concat_ws(','," + Blocklist.map(w =>
      s" CASE WHEN h_$w > 0 THEN '$w' END").mkString(",") + ")"
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    $hitExprs
       |  FROM documents)
       |SELECT doc_id, source, CAST($total AS BIGINT) AS n_hits,
       |  $terms AS terms
       |FROM h WHERE $total > 0
       |ORDER BY doc_id""".stripMargin
  }

  // -- q222: Neyman allocation plan — how to split a fixed quality-audit
  //          sampling budget across sources: n_h ∝ N_h·σ_h (Neyman 1934,
  //          the variance-optimal stratified allocation) vs the naive
  //          proportional n_h ∝ N_h, over doc-length spread as the
  //          variance proxy. High-variance sources get audited harder —
  //          the statistically-correct version of "sample more where
  //          the corpus is weird". Determinism: N·Σx²−(Σx)² is an exact
  //          integer per source, so N_h·σ_h = sqrt of an exact integer;
  //          the only cross-source double sum folds in source order
  //          over the #sources-bounded frame; proportional allocation
  //          is pure integer round-half-up. Scale shape: one scan to
  //          per-source integer moments, everything after is
  //          #sources-row. (Contract: Σ n_chars² per source must fit a
  //          long — pre-scale to kilochars past ~10¹² docs·chars².)
  private val AuditBudget = 1000L

  private def q222(s: SparkSession, dir: String): DataFrame = {
    val st = docs(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sxx"))
      .withColumn("w",
        sqrt((col("n_docs") * col("sxx") - col("sx") * col("sx"))
          .cast("double")))
    val tot = st
      .agg(sort_array(collect_list(struct(col("source"), col("w"))))
          .as("ws"),
        sum(col("n_docs")).as("n_tot"))
      .select(aggregate(col("ws"), lit(0.0d), (a, x) => a + x("w"))
          .as("total_w"),
        col("n_tot"))
    st.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("w") / col("n_docs"), 6).as("sd_len"),
        floor(lit(AuditBudget.toDouble) * col("w") / col("total_w") +
          lit(0.5)).cast("long").as("alloc_neyman"),
        expr(s"(2 * $AuditBudget * n_docs + n_tot) div (2 * n_tot)")
          .as("alloc_prop"))
      .orderBy(col("source"))
  }

  private val q222Sql =
    s"""WITH st AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS sx,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM documents GROUP BY source),
       |w AS (
       |  SELECT source, n_docs,
       |    sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) AS w
       |  FROM st),
       |tot AS (
       |  SELECT sum(w ORDER BY source) AS total_w,
       |    CAST(sum(n_docs) AS BIGINT) AS n_tot
       |  FROM w)
       |SELECT source, n_docs,
       |  round(w / n_docs, 6) AS sd_len,
       |  CAST(floor($AuditBudget.0 * w / total_w + 0.5) AS BIGINT)
       |    AS alloc_neyman,
       |  (2 * $AuditBudget * n_docs + n_tot) // (2 * n_tot) AS alloc_prop
       |FROM w, tot ORDER BY source""".stripMargin

  // -- q248: Poisson-bootstrap confidence intervals — the resampling
  //          that works at 100 TB (Chamandy et al., "Estimating
  //          uncertainty for massive data streams", 2012): instead of
  //          drawing B full resamples, each row gets an independent
  //          Poisson(1) weight per replicate, so one pass computes all
  //          B replicate means. Here: 95% CI for mean document length
  //          per source, B = 64. Determinism: the Poisson draw is the
  //          inverse CDF applied to the portable integer hash
  //          (hashBucket(doc_id, 10^6, salt=b) against FIXED integer
  //          thresholds — pure integer compares, no float RNG);
  //          replicate means are exact-integer Σw·x / Σw; the CI
  //          bounds are exact order statistics (2nd / 63rd of the 64
  //          sorted replicate means) — no interpolation, both engines
  //          index the same sorted list. Scale shape: the ×64 explode
  //          feeds a (source, replicate)-keyed aggregate with map-side
  //          partial combine, so the shuffle carries #sources×64 rows
  //          per partition, not ×64 the data; the sort/index runs on
  //          64-element arrays.
  private val BootB = 64
  // P(Poisson(1) <= k) * 1e6, k = 0..6: u >= threshold[k] => w > k
  private val PoisCdf = Seq(367879L, 735759L, 919699L, 981012L,
    996340L, 999406L, 999917L)

  private def q248(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("source"),
      col("n_chars"))
    val rep = base.withColumn("b",
      explode(sequence(lit(0), lit(BootB - 1))))
      .withColumn("u",
        Sampling.hashBucket(concat(col("doc_id"), lit(":"), col("b")),
          1000000, "boot"))
      .withColumn("w", PoisCdf.map(t =>
        when(col("u") >= t, 1L).otherwise(0L)).reduce(_ + _))
    val repMeans = rep.groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("ws"), sum(col("w") * col("n_chars")).as("wx"))
      .filter(col("ws") > 0)
      .select(col("source"),
        (col("wx").cast("double") / col("ws")).as("m"))
    val ci = repMeans.groupBy(col("source"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(col("source"), size(col("ms")).cast("long").as("n_replicates"),
        round(element_at(col("ms"), 2), 6).as("ci_lo"),
        round(element_at(col("ms"), BootB - 1), 6).as("ci_hi"))
    val point = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"))
      .select(col("source"), col("n_docs"),
        graft.functions.ExactRound.ratio6(col("sx"), col("n_docs"))
          .as("mean_len"))
    point.join(ci, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_replicates"),
        col("mean_len"), col("ci_lo"), col("ci_hi"))
      .orderBy(col("source"))
  }

  private val q248Sql = {
    val u = bucketSql("(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))",
      1000000, "boot")
    val w = PoisCdf.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH rep AS (
       |  SELECT source, n_chars, b, $u AS u
       |  FROM documents, unnest(range(0, $BootB)) r(b)),
       |rw AS (SELECT source, n_chars, b, $w AS w FROM rep),
       |rm AS (
       |  SELECT source, b,
       |    CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS BIGINT) AS m
       |  FROM rw GROUP BY 1, 2
       |  HAVING sum(w) > 0),
       |ci AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_replicates,
       |    round(list_sort(list(m))[2], 6) AS ci_lo,
       |    round(list_sort(list(m))[${BootB - 1}], 6) AS ci_hi
       |  FROM rm GROUP BY source),
       |pt AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    ${graft.functions.ExactRound.sql.ratio6("sum(n_chars)", "count(*)")}
       |      AS mean_len
       |  FROM documents GROUP BY source)
       |SELECT pt.source, n_docs, n_replicates, mean_len, ci_lo, ci_hi
       |FROM pt JOIN ci USING (source)
       |ORDER BY source""".stripMargin
  }

  // -- q267: A/B conversion test — the two-proportion experiment
  //          readout (pooled z-test + per-arm Wilson 1927 score
  //          intervals) with a deterministic hash-split assignment
  //          (the q111 splitColumn machinery as the bucketing layer an
  //          experimentation platform runs). Determinism: arms and
  //          conversions are exact integer counts; every float step
  //          (divisions, sqrt) is written as the IDENTICAL expression
  //          text on both engines over those exact integers — sqrt is
  //          correctly rounded per IEEE-754, so unlike ln it needs no
  //          quantization. Scale shape: one scan → per-user flag →
  //          2-row arm aggregate; the pooled 1-row frame is a
  //          broadcast stats cross.
  private val AbZ = "CAST(1.96 AS DOUBLE)"

  // Shared expression text: both engines evaluate the IDENTICAL string
  // over exact integer (na, ka, nb, kb) / (n_users, n_conv) inputs.
  // nullif guards the degenerate pooled-rate-0-or-1 regeneration: both
  // engines then yield NULL rather than Spark throwing under ANSI mode.
  private val abZExpr =
    s"""((CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb) /
       | nullif(sqrt((CAST(ka + kb AS DOUBLE) / (na + nb)) *
       |   (1 - CAST(ka + kb AS DOUBLE) / (na + nb)) *
       |   (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 0))"""
      .stripMargin.replace("\n", " ")

  private def abWilson(sign: String): String =
    s"""((CAST(n_conv AS DOUBLE) / n_users +
       |  $AbZ * $AbZ / (2 * n_users) $sign
       |  $AbZ * sqrt(CAST(n_conv AS DOUBLE) / n_users *
       |    (1 - CAST(n_conv AS DOUBLE) / n_users) / n_users +
       |    $AbZ * $AbZ / (CAST(4 AS DOUBLE) * n_users * n_users))) /
       | (1 + $AbZ * $AbZ / n_users))""".stripMargin.replace("\n", " ")

  private def q267(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Sampling
    val users = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 95,
        1L).otherwise(0L)).as("conv"))
      .withColumn("variant",
        when(Sampling.hashBucket(col("user_id"), 2, "ab") === 0L, "A")
          .otherwise("B"))
    val arms = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val pooled = arms.agg(
      max(when(col("variant") === "A", col("n_users"))).as("na"),
      max(when(col("variant") === "A", col("n_conv"))).as("ka"),
      max(when(col("variant") === "B", col("n_users"))).as("nb"),
      max(when(col("variant") === "B", col("n_conv"))).as("kb"))
    arms.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_users"), col("n_conv"),
        graft.functions.ExactRound.ratio6(col("n_conv"), col("n_users"))
          .as("conv_rate"),
        expr(s"round(${abWilson("-")}, 6)").as("wilson_lo"),
        expr(s"round(${abWilson("+")}, 6)").as("wilson_hi"),
        expr(s"round($abZExpr, 6)").as("z_score"),
        expr(s"abs($abZExpr) > $AbZ").as("significant"))
      .orderBy(col("variant"))
  }

  private lazy val q267Sql = {
    import graft.functions.{ExactRound => ER}
    import graft.pipeline.Sampling
    val h = Sampling.sql.hashBucket("user_id", 2, "ab")
    s"""WITH users AS (
       |  SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' AND value > 95
       |        THEN 1 ELSE 0 END) AS conv,
       |    CASE WHEN $h = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id),
       |arms AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(conv) AS BIGINT) AS n_conv
       |  FROM users GROUP BY 1),
       |pooled AS (
       |  SELECT max(CASE WHEN variant = 'A' THEN n_users END) AS na,
       |    max(CASE WHEN variant = 'A' THEN n_conv END) AS ka,
       |    max(CASE WHEN variant = 'B' THEN n_users END) AS nb,
       |    max(CASE WHEN variant = 'B' THEN n_conv END) AS kb
       |  FROM arms)
       |SELECT variant, n_users, n_conv,
       |  ${ER.sql.ratio6("n_conv", "n_users")} AS conv_rate,
       |  round(${abWilson("-")}, 6) AS wilson_lo,
       |  round(${abWilson("+")}, 6) AS wilson_hi,
       |  round($abZExpr, 6) AS z_score,
       |  abs($abZExpr) > $AbZ AS significant
       |FROM arms CROSS JOIN pooled
       |ORDER BY variant""".stripMargin
  }

  // -- q270: Welch's unequal-variance t-test (Welch 1947) + Cohen's d
  //          per source — "does this source's quality distribution
  //          differ from the rest of the corpus, and by how much?":
  //          the statistical screen behind q127's mixing decisions.
  //          Determinism: per-doc quality quantizes to micro-unit longs
  //          (the q237 feature), so every per-source (n, Σq, Σq²) and
  //          the global triple are exact integers; the t/d formulas
  //          run as the IDENTICAL expression text on both engines over
  //          those integers (the q267 contract — means/variances/sqrt
  //          are correctly-rounded IEEE ops on exact operands). t and
  //          d are scale-invariant, so micro units cancel. Bound:
  //          Σq² ≤ n·10¹² must fit a long — exact to ~9e6 docs per
  //          run; sample beyond. Scale shape: one scan → 4-row source
  //          aggregate × broadcast 1-row corpus totals.
  private val WtZ = 1.96

  private def q270(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    import graft.text.{TextFunctions => TF}
    val q = docs(s, dir).select(col("source"),
      round(TF.qualityScore(col("text"), col("n_chars")) * lit(1e6), 0)
        .cast("long").as("qm"))
    val per = q.groupBy(col("source")).agg(count(lit(1)).as("n1"),
      sum(col("qm")).as("s1"), sum(col("qm") * col("qm")).as("ss1"))
    val tot = per.agg(sum(col("n1")).as("nn"), sum(col("s1")).as("ts"),
      sum(col("ss1")).as("tss"))
    val m1 = "(CAST(s1 AS DOUBLE) / n1)"
    val m2 = "(CAST(ts - s1 AS DOUBLE) / (nn - n1))"
    val v1 = s"((CAST(ss1 AS DOUBLE) - $m1 * s1) / (n1 - 1))"
    val v2 = s"((CAST(tss - ss1 AS DOUBLE) - $m2 * (ts - s1)) / (nn - n1 - 1))"
    val t = s"(($m1 - $m2) / sqrt($v1 / n1 + $v2 / (nn - n1)))"
    val dP = s"(((n1 - 1) * $v1 + (nn - n1 - 1) * $v2) / (nn - 2))"
    val cohen = s"(($m1 - $m2) / sqrt($dP))"
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n1").as("n_docs"),
        ExactRound.microMean6(col("s1"), col("n1")).as("mean_quality"),
        expr(s"round($t, 6)").as("t_welch"),
        expr(s"round($cohen, 6)").as("cohens_d"),
        expr(s"abs($t) > $WtZ").as("significant"))
      .orderBy(col("source"))
  }

  private val q270Sql = {
    import graft.functions.{ExactRound => ER}
    import graft.text.{TextFunctions => TF}
    val m1 = "(CAST(s1 AS DOUBLE) / n1)"
    val m2 = "(CAST(ts - s1 AS DOUBLE) / (nn - n1))"
    val v1 = s"((CAST(ss1 AS DOUBLE) - $m1 * s1) / (n1 - 1))"
    val v2 = s"((CAST(tss - ss1 AS DOUBLE) - $m2 * (ts - s1)) / (nn - n1 - 1))"
    val t = s"(($m1 - $m2) / sqrt($v1 / n1 + $v2 / (nn - n1)))"
    val dP = s"(((n1 - 1) * $v1 + (nn - n1 - 1) * $v2) / (nn - 2))"
    val cohen = s"(($m1 - $m2) / sqrt($dP))"
    s"""WITH q AS (
       |  SELECT source,
       |    CAST(round(${TF.sql.qualityScore("text", "n_chars")} * 1e6, 0)
       |      AS BIGINT) AS qm
       |  FROM documents),
       |per AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n1,
       |    CAST(sum(qm) AS BIGINT) AS s1,
       |    CAST(sum(qm * qm) AS BIGINT) AS ss1
       |  FROM q GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(s1) AS BIGINT) AS ts,
       |    CAST(sum(ss1) AS BIGINT) AS tss
       |  FROM per)
       |SELECT source, n1 AS n_docs,
       |  ${ER.sql.microMean6("s1", "n1")} AS mean_quality,
       |  round($t, 6) AS t_welch,
       |  round($cohen, 6) AS cohens_d,
       |  abs($t) > $WtZ AS significant
       |FROM per CROSS JOIN tot
       |ORDER BY source""".stripMargin
  }

  // -- q271: CUPED variance reduction (Deng et al. 2013, "Improving
  //          the sensitivity of online controlled experiments by
  //          utilizing pre-experiment data") on the q267 experiment:
  //          the covariate is each user's PRE-period activity count
  //          (first half of the observed time range, integer midpoint
  //          split), the metric is the POST-period count; θ =
  //          cov(x,y)/var(x) from corpus-wide exact integer sums, and
  //          each arm reports its raw vs CUPED-adjusted mean plus the
  //          achieved variance reduction ρ². Determinism: per-user x/y
  //          are integer counts; all moment sums are exact longs (the
  //          cross-moment bound n·Σxy fits a long to ~1e9 user-events
  //          — beyond, pre-scale the counts); θ/ρ²/adjusted means are
  //          identical expression text over integer differences on
  //          both engines. Scale shape: one scan → user aggregate →
  //          2-row arm rollup × broadcast 1-row moments.
  private def q271(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("unix_timestamp(ts)").as("sec"))
    val mid = ev.agg(expr("(min(sec) + max(sec)) div 2").as("mid"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("sec") <= col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("sec") > col("mid"), 1L).otherwise(0L)).as("y"))
      .withColumn("variant",
        when(Sampling.hashBucket(col("user_id"), 2, "ab") === 0L, "A")
          .otherwise("B"))
    val mom = users.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    val arms = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("na"), sum(col("x")).as("sxa"),
        sum(col("y")).as("sya"))
    val theta = "(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))"
    val rho2 = "((CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)) / " +
      "(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)))"
    val meanx = "(CAST(sx AS DOUBLE) / n)"
    val madj = s"(CAST(sya AS DOUBLE) / na - $theta * " +
      s"(CAST(sxa AS DOUBLE) / na - $meanx))"
    arms.crossJoin(broadcast(mom))
      .select(col("variant"), col("na").as("n_users"),
        ExactRound.ratio6(col("sxa"), col("na")).as("mean_pre"),
        ExactRound.ratio6(col("sya"), col("na")).as("mean_post"),
        expr(s"round($madj, 6)").as("mean_post_adj"),
        expr(s"round($theta, 6)").as("theta"),
        expr(s"round($rho2, 6)").as("var_reduction"))
      .orderBy(col("variant"))
  }

  private val q271Sql = {
    import graft.functions.{ExactRound => ER}
    val h = Sampling.sql.hashBucket("user_id", 2, "ab")
    val theta = "(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))"
    val rho2 = "((CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)) / " +
      "(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)))"
    val meanx = "(CAST(sx AS DOUBLE) / n)"
    val madj = s"(CAST(sya AS DOUBLE) / na - $theta * " +
      s"(CAST(sxa AS DOUBLE) / na - $meanx))"
    s"""WITH ev AS (
       |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |  FROM events),
       |mid AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM ev),
       |users AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN sec <= mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN sec > mid THEN 1 ELSE 0 END) AS BIGINT) AS y,
       |    CASE WHEN $h = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM ev CROSS JOIN mid GROUP BY user_id),
       |mom AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM users),
       |arms AS (
       |  SELECT variant, CAST(count(*) AS BIGINT) AS na,
       |    CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
       |  FROM users GROUP BY 1)
       |SELECT variant, na AS n_users,
       |  ${ER.sql.ratio6("sxa", "na")} AS mean_pre,
       |  ${ER.sql.ratio6("sya", "na")} AS mean_post,
       |  round($madj, 6) AS mean_post_adj,
       |  round($theta, 6) AS theta,
       |  round($rho2, 6) AS var_reduction
       |FROM arms CROSS JOIN mom
       |ORDER BY variant""".stripMargin
  }

  // -- q274: inter-labeler agreement (Cohen 1960 kappa) between two
  //          independent rule-based quality labelers, per source — the
  //          label-noise screen run before trusting any single
  //          heuristic to train the q173 classifier: raw agreement po
  //          overstates consensus when both labelers mostly say "keep",
  //          kappa discounts the chance-agreement floor pe. Labeler A:
  //          composite quality score > 0.5; labeler B: lexical
  //          diversity > 0.5 with ≥ 100 chars. Determinism: the 2×2
  //          confusion cells are exact integer counts (label compares
  //          are IEEE-identical divisions of integers); po/pe/kappa
  //          run as identical expression text over those longs, with
  //          nullif guarding the degenerate pe = 1 corpus. Scale:
  //          one scan → 4 conditional sums per source.
  private def q274(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val lab = docs(s, dir).select(col("source"),
      (TF.qualityScore(col("text"), col("n_chars")) > lit(0.5)).as("la"),
      (TF.tokenDiversity(col("text")) > lit(0.5) &&
        col("n_chars") >= 100).as("lb"))
    val cells = lab.groupBy(col("source")).agg(
      sum(when(col("la") && col("lb"), 1L).otherwise(0L)).as("ka"),
      sum(when(col("la") && !col("lb"), 1L).otherwise(0L)).as("kb"),
      sum(when(!col("la") && col("lb"), 1L).otherwise(0L)).as("kc"),
      sum(when(!col("la") && !col("lb"), 1L).otherwise(0L)).as("kd"))
    val n = "(ka + kb + kc + kd)"
    val po = s"(CAST(ka + kd AS DOUBLE) / $n)"
    val pe = s"(CAST((ka + kb) * (ka + kc) + (kc + kd) * (kb + kd) " +
      s"AS DOUBLE) / ($n * $n))"
    val kappa = s"(($po - $pe) / nullif(1 - $pe, 0))"
    cells.select(col("source"),
      expr(s"$n").as("n_docs"),
      col("ka").as("both_pos"), col("kd").as("both_neg"),
      (col("kb") + col("kc")).as("disagree"),
      expr(s"round($po, 6)").as("po"),
      expr(s"round($pe, 6)").as("pe"),
      expr(s"round($kappa, 6)").as("kappa"))
      .orderBy(col("source"))
  }

  private val q274Sql = {
    import graft.text.{TextFunctions => TF}
    val la = s"(${TF.sql.qualityScore("text", "n_chars")} > 0.5)"
    val lb = s"(${TF.sql.tokenDiversity("text")} > 0.5 AND n_chars >= 100)"
    val n = "(ka + kb + kc + kd)"
    val po = s"(CAST(ka + kd AS DOUBLE) / $n)"
    val pe = s"(CAST((ka + kb) * (ka + kc) + (kc + kd) * (kb + kd) " +
      s"AS DOUBLE) / ($n * $n))"
    val kappa = s"(($po - $pe) / nullif(1 - $pe, 0))"
    s"""WITH lab AS (
       |  SELECT source, $la AS la, $lb AS lb FROM documents),
       |cells AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN la AND lb THEN 1 ELSE 0 END) AS BIGINT) AS ka,
       |    CAST(sum(CASE WHEN la AND NOT lb THEN 1 ELSE 0 END) AS BIGINT) AS kb,
       |    CAST(sum(CASE WHEN NOT la AND lb THEN 1 ELSE 0 END) AS BIGINT) AS kc,
       |    CAST(sum(CASE WHEN NOT la AND NOT lb THEN 1 ELSE 0 END) AS BIGINT) AS kd
       |  FROM lab GROUP BY 1)
       |SELECT source, $n AS n_docs, ka AS both_pos, kd AS both_neg,
       |  kb + kc AS disagree,
       |  round($po, 6) AS po, round($pe, 6) AS pe, round($kappa, 6) AS kappa
       |FROM cells ORDER BY source""".stripMargin
  }

  // -- q278: robust per-source quality location — 10% two-sided
  //          TRIMMED mean and WINSORIZED mean (Tukey; Huber 1981)
  //          next to the raw mean: the outlier-proof location a
  //          mixing decision should read when a source ships a few
  //          boilerplate or garbage extremes. Determinism: micro-unit
  //          integer scores ranked under the TOTAL order (qm, doc_id);
  //          k = n div 10 rows cut per side; winsorized sum =
  //          trimmed_sum + k·(lo + hi) with lo/hi the exact boundary
  //          order statistics — all integer arithmetic, means via
  //          microMean6. Scale shape: one per-source sort (the same
  //          shape as every quantile query) + one keyed rollup.
  private def q278(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    import graft.text.{TextFunctions => TF}
    val W = org.apache.spark.sql.expressions.Window
    val q = docs(s, dir).select(col("source"), col("doc_id"),
      round(TF.qualityScore(col("text"), col("n_chars")) * lit(1e6), 0)
        .cast("long").as("qm"))
    val w = W.partitionBy(col("source")).orderBy(col("qm"), col("doc_id"))
    val ranked = q
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(W.partitionBy(col("source"))))
      .withColumn("k", expr("n div 10"))
    ranked.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"), max(col("k")).as("k"),
        sum(col("qm")).as("sall"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"),
          col("qm")).otherwise(0L)).as("strim"),
        max(when(col("rn") === col("k") + 1, col("qm"))).as("lo"),
        max(when(col("rn") === col("n") - col("k"), col("qm"))).as("hi"))
      .select(col("source"), col("n_docs"),
        ExactRound.microMean6(col("sall"), col("n_docs")).as("mean_q"),
        ExactRound.microMean6(col("strim"),
          col("n_docs") - lit(2L) * col("k")).as("trimmed_mean"),
        ExactRound.microMean6(
          col("strim") + col("k") * (col("lo") + col("hi")),
          col("n_docs")).as("winsorized_mean"),
        (col("lo") / lit(1e6)).as("q_lo"),
        (col("hi") / lit(1e6)).as("q_hi"))
      .orderBy(col("source"))
  }

  private val q278Sql = {
    import graft.functions.{ExactRound => ER}
    import graft.text.{TextFunctions => TF}
    s"""WITH q AS (
       |  SELECT source, doc_id,
       |    CAST(round(${TF.sql.qualityScore("text", "n_chars")} * 1e6, 0)
       |      AS BIGINT) AS qm
       |  FROM documents),
       |ranked AS (
       |  SELECT source, qm,
       |    row_number() OVER (PARTITION BY source ORDER BY qm, doc_id)
       |      AS rn,
       |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
       |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) // 10 AS k
       |  FROM q),
       |agg AS (
       |  SELECT source, max(n) AS n_docs, max(k) AS k,
       |    CAST(sum(qm) AS BIGINT) AS sall,
       |    CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN qm ELSE 0 END)
       |      AS BIGINT) AS strim,
       |    max(CASE WHEN rn = k + 1 THEN qm END) AS lo,
       |    max(CASE WHEN rn = n - k THEN qm END) AS hi
       |  FROM ranked GROUP BY 1)
       |SELECT source, n_docs,
       |  ${ER.sql.microMean6("sall", "n_docs")} AS mean_q,
       |  ${ER.sql.microMean6("strim", "n_docs - 2 * k")} AS trimmed_mean,
       |  ${ER.sql.microMean6("strim + k * (lo + hi)", "n_docs")}
       |    AS winsorized_mean,
       |  lo / 1e6 AS q_lo, hi / 1e6 AS q_hi
       |FROM agg ORDER BY source""".stripMargin
  }

  // -- q283: shard mixing audit — is the q141 doc-order sharding an
  //          unbiased sample of the corpus, or does doc_id correlate
  //          with source? Per shard: its source distribution's
  //          Jensen–Shannon divergence against the corpus distribution
  //          (the q155 drift machinery pointed at the SHARD axis) plus
  //          the dominant-source share. A training loader reading
  //          shards sequentially sees exactly this mixing quality.
  //          Determinism: counts are exact; per-source JS terms are
  //          IEEE doubles of exact count ratios summed in source order
  //          (sorted-fold ↔ ordered-aggregate, the q155 equivalence).
  //          Scale shape: the q141 two-phase cumsum assigns shards;
  //          the JS grid is (#shards × #sources) — metadata-bounded.
  private def q283(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    import graft.text.{TextFunctions => TF}
    val W = org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("doc_id"), col("source"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("rng", expr(s"doc_id div $RangeWidth"))
    val beforeRange = W.orderBy(col("rng"))
      .rowsBetween(W.unboundedPreceding, -1)
    val rangeCum = d.groupBy(col("rng"))
      .agg(sum(col("n_tok")).as("range_tokens"))
      .withColumn("range_before",
        coalesce(sum(col("range_tokens")).over(beforeRange), lit(0L)))
    val within = W.partitionBy(col("rng")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val sharded = d.join(rangeCum.select(col("rng"), col("range_before")),
        Seq("rng"))
      .withColumn("tokens_before",
        col("range_before") + coalesce(sum(col("n_tok")).over(within), lit(0L)))
      .withColumn("shard_id", expr(s"tokens_before div $ShardTokens"))
    val sc = sharded.groupBy(col("shard_id"), col("source"))
      .agg(count(lit(1)).as("c"))
    val st = sc.groupBy(col("shard_id")).agg(sum(col("c")).as("t"),
      count(lit(1)).as("n_sources_present"), max(col("c")).as("cmax"))
    val corp = d.groupBy(col("source")).agg(count(lit(1)).as("cs"))
    val ct = corp.agg(sum(col("cs")).as("ctot"))
    val grid = st.select(col("shard_id"), col("t"))
      .crossJoin(broadcast(corp)).crossJoin(broadcast(ct))
      .join(sc, Seq("shard_id", "source"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
    val p = "(CAST(c0 AS DOUBLE) / t)"
    val q = "(CAST(cs AS DOUBLE) / ctot)"
    val m = s"(($p + $q) / 2)"
    val jsT = s"(0.5 * (CASE WHEN c0 > 0 THEN $p * ln($p / $m) ELSE 0.0 END)" +
      s" + 0.5 * ($q * ln($q / $m)))"
    grid
      .withColumn("js_t", expr(jsT))
      .groupBy(col("shard_id"))
      .agg(max(col("t")).as("n_docs"),
        sort_array(collect_list(struct(col("source"), col("js_t"))))
          .as("js"))
      .join(st.select(col("shard_id"), col("n_sources_present"),
        col("cmax"), col("t")), Seq("shard_id"))
      .select(col("shard_id"), col("n_docs"), col("n_sources_present"),
        round(aggregate(col("js"), lit(0.0d), (acc, x) => acc + x("js_t")), 6)
          .as("js_vs_corpus"),
        ExactRound.ratio6(col("cmax"), col("t")).as("top_share"))
      .orderBy(col("shard_id"))
  }

  private val q283Sql = {
    import graft.functions.{ExactRound => ER}
    import graft.text.{TextFunctions => TF}
    val p = "(CAST(c0 AS DOUBLE) / t)"
    val q = "(CAST(cs AS DOUBLE) / ctot)"
    val m = s"(($p + $q) / 2)"
    val jsT = s"(0.5 * (CASE WHEN c0 > 0 THEN $p * ln($p / $m) ELSE 0.0 END)" +
      s" + 0.5 * ($q * ln($q / $m)))"
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CAST(${TF.sql.tokenCount("text")} AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, n_tok,
       |    CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS tokens_before
       |  FROM d),
       |sh AS (SELECT tokens_before // $ShardTokens AS shard_id, source
       |       FROM c),
       |sc AS (SELECT shard_id, source, CAST(count(*) AS BIGINT) AS c
       |       FROM sh GROUP BY 1, 2),
       |st AS (SELECT shard_id, CAST(sum(c) AS BIGINT) AS t,
       |         CAST(count(*) AS BIGINT) AS n_sources_present,
       |         CAST(max(c) AS BIGINT) AS cmax
       |       FROM sc GROUP BY 1),
       |corp AS (SELECT source, CAST(count(*) AS BIGINT) AS cs
       |         FROM d GROUP BY 1),
       |ct AS (SELECT CAST(sum(cs) AS BIGINT) AS ctot FROM corp),
       |grid AS (
       |  SELECT st.shard_id, st.t, corp.source, corp.cs, ct.ctot,
       |    coalesce(sc.c, 0) AS c0
       |  FROM st CROSS JOIN corp CROSS JOIN ct
       |  LEFT JOIN sc ON sc.shard_id = st.shard_id
       |    AND sc.source = corp.source)
       |SELECT g.shard_id, max(st.t) AS n_docs,
       |  max(st.n_sources_present) AS n_sources_present,
       |  round(sum($jsT ORDER BY g.source), 6) AS js_vs_corpus,
       |  ${ER.sql.ratio6("max(st.cmax)", "max(st.t)")} AS top_share
       |FROM (SELECT shard_id, source, cs, ctot, c0 FROM grid) g
       |JOIN st ON st.shard_id = g.shard_id
       |GROUP BY g.shard_id
       |ORDER BY g.shard_id""".stripMargin
  }

  // -- q284: source n-gram overlap matrix — corpus diversity between
  //          sources (the self-BLEU idea, Zhu et al. 2018, in exact
  //          set form): distinct word-4-gram sets per source, pairwise
  //          shared counts, Jaccard and containment per unordered
  //          source pair. Reads as "which dumps tell the same
  //          stories" — the cross-source complement to q135's
  //          duplicate-flow matrix (doc-level) at the n-gram level.
  //          Scale shape: the shingle inverted index is per-source
  //          DISTINCT, so every posting list is bounded by #sources;
  //          pair work is Σ df² ≤ #sources²·|vocab| — never
  //          corpus-quadratic. Exact integer counts; ratios are
  //          ExactRound.
  private val SoN = 4

  private def q284(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    import graft.text.{TextFunctions => TF}
    val sh = docs(s, dir).select(col("source"),
        explode(array_distinct(transform(
          graft.pipeline.Decontaminate.wordShingles(
            TF.tokens(col("text")), SoN),
          g => TF.md5Long(g)))).as("g_id"))
      .distinct()
      .truncateLineage()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = sh.select(col("g_id"), col("source").as("source_lo"))
      .join(sh.select(col("g_id"), col("source").as("source_hi")), Seq("g_id"))
      .filter(col("source_lo") < col("source_hi"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("source").as("source_lo"), col("n").as("n_lo")),
        Seq("source_lo"))
      .join(sizes.select(col("source").as("source_hi"), col("n").as("n_hi")),
        Seq("source_hi"))
      .select(col("source_lo"), col("source_hi"), col("n_lo"), col("n_hi"),
        col("shared"),
        ExactRound.ratio6(col("shared"),
          col("n_lo") + col("n_hi") - col("shared")).as("jaccard"),
        ExactRound.ratio6(col("shared"), least(col("n_lo"), col("n_hi")))
          .as("containment"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  private val q284Sql = {
    import graft.functions.{ExactRound => ER}
    import graft.text.{TextFunctions => TF}
    val grams = graft.pipeline.Decontaminate.sql
      .shingleHashes(TF.sql.tokens("text"), SoN)
    s"""WITH sh AS (
       |  SELECT DISTINCT source, g_id
       |  FROM (SELECT source, unnest($grams) AS g_id FROM documents) t),
       |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |          FROM sh GROUP BY 1),
       |shared AS (
       |  SELECT a.source AS source_lo, b.source AS source_hi,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM sh a JOIN sh b ON a.g_id = b.g_id AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_lo, source_hi, lo.n AS n_lo, hi.n AS n_hi, shared,
       |  ${ER.sql.ratio6("shared", "lo.n + hi.n - shared")} AS jaccard,
       |  ${ER.sql.ratio6("shared", "least(lo.n, hi.n)")} AS containment
       |FROM shared
       |JOIN sizes lo ON lo.source = source_lo
       |JOIN sizes hi ON hi.source = source_hi
       |ORDER BY source_lo, source_hi""".stripMargin
  }

  // -- q285: Mann–Whitney U rank-sum test (Mann & Whitney 1947) per
  //          source vs the rest of the corpus over doc length — the
  //          nonparametric complement to q270's Welch t: detects a
  //          source whose length DISTRIBUTION shifted even when means
  //          agree, with no normality assumption. Because every
  //          source-vs-rest comparison shares the same combined
  //          population (the corpus), the rank table is computed ONCE
  //          on the value census and every source reads its rank-sum
  //          off it — #sources passes over one bounded grid, not
  //          #sources re-rankings. Tie-corrected normal z.
  //          Determinism: doubled average ranks (2·cumb + cnt + 1) are
  //          exact integers, so rank-sums/U/tie terms are integer
  //          arithmetic; z/auc are single-row double formulas over
  //          those integers, round6. Scale shape: one scan → value
  //          census (bounded by the n_chars domain, not |docs|); the
  //          rank window runs on that metadata-sized grid (audited
  //          partitionless-window site); per-source rollup is one
  //          keyed agg + a 1-row totals broadcast. Long arithmetic
  //          holds to N ~ 2e6 (the N³ tie-variance term); above that
  //          promote the totals to decimal.
  /** Shared Mann–Whitney/Kruskal–Wallis rank census over doc length
    * (q285, q302, q303): ONE value census ranks the whole corpus, and
    * every per-source statistic reads off it — #sources passes over a
    * domain-bounded grid, never a re-ranking. Doubled average ranks
    * d = 2·cumb + cnt + 1 are exact integers, so the returned frames
    * are pure longs: per source (r2 = Σd, n1), global (nn = N,
    * tt = Σ(t³−t) tie mass, dd = Σd² with Σd = N(N+1) implied).
    * Long headroom: dd ≤ 4N³ holds to N ~ 1.3e6 docs; promote the
    * census counts to decimal beyond that. */
  private def mwRankCensus(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("source"), col("n_chars").as("v"))
    val glob = d.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cumb", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val bySrc = d.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c_sv"))
    val r = bySrc.join(glob, "v")
      .groupBy(col("source")).agg(
        sum(col("c_sv") * (lit(2L) * col("cumb") + col("cnt") + lit(1L)))
          .as("r2"),
        sum(col("c_sv")).as("n1"))
    val dcol = lit(2L) * col("cumb") + col("cnt") + lit(1L)
    val tot = glob.agg(sum(col("cnt")).as("nn"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tt"),
      sum(col("cnt") * dcol * dcol).as("dd"))
    (r, tot)
  }

  /** DuckDB twin of [[mwRankCensus]] — CTE block ending in `r`/`tot`. */
  private val mwRankCtes =
    """d AS (SELECT source, n_chars AS v FROM documents),
      |gv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY v),
      |g2 AS (SELECT v, cnt, CAST(coalesce(sum(cnt) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS cumb FROM gv),
      |bysrc AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c_sv
      |  FROM d GROUP BY 1, 2),
      |r AS (SELECT source,
      |    CAST(sum(c_sv * (2*cumb + cnt + 1)) AS BIGINT) AS r2,
      |    CAST(sum(c_sv) AS BIGINT) AS n1
      |  FROM bysrc JOIN g2 USING (v) GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn,
      |    CAST(sum(cnt*cnt*cnt - cnt) AS BIGINT) AS tt,
      |    CAST(sum(cnt * (2*cumb + cnt + 1) * (2*cumb + cnt + 1))
      |      AS BIGINT) AS dd
      |  FROM g2)""".stripMargin

  private def q285(s: SparkSession, dir: String): DataFrame = {
    val (r, tot) = mwRankCensus(s, dir)
    r.crossJoin(broadcast(tot))
      .select(col("source"), col("n1"),
        (col("r2") - col("n1") * (col("n1") + lit(1L))).as("u2"),
        expr("round(CAST(r2 - n1*(n1+1) AS DOUBLE) / (2.0*n1*(nn-n1)), 6)")
          .as("auc"),
        expr("round((CAST(r2 - n1*(n1+1) AS DOUBLE) - CAST(n1*(nn-n1) AS DOUBLE)) / " +
          "nullif(2.0*sqrt(n1*(nn-n1) * ((nn+1.0)*nn*(nn-1.0) - tt) / " +
          "(12.0*nn*(nn-1.0))), 0), 6)").as("z"))
      .orderBy(col("source"))
  }

  private val q285Sql =
    s"""WITH $mwRankCtes
      |SELECT source, n1, CAST(r2 - n1*(n1+1) AS BIGINT) AS u2,
      |  round(CAST(r2 - n1*(n1+1) AS DOUBLE) / (2.0*n1*(nn-n1)), 6) AS auc,
      |  round((CAST(r2 - n1*(n1+1) AS DOUBLE) - CAST(n1*(nn-n1) AS DOUBLE)) /
      |    nullif(2.0*sqrt(n1*(nn-n1) * ((nn+1.0)*nn*(nn-1.0) - tt) /
      |    (12.0*nn*(nn-1.0))), 0), 6) AS z
      |FROM r, tot ORDER BY source""".stripMargin

  // -- q286: Fleiss' kappa (Fleiss 1971) across THREE independent
  //          rule-based labelers, per source — q274's pairwise Cohen
  //          kappa generalized to a rater panel: the screen a labeling
  //          pipeline runs before trusting majority-vote labels. With
  //          binary categories and 3 raters, an item's agreement
  //          P_i depends only on k = #raters saying "keep"
  //          (P_i = (k² + (3−k)² − 3) / 6), so the whole statistic
  //          reduces to a per-source census of k ∈ {0..3} — one scan,
  //          four conditional sums, no per-pair work. Labelers: A =
  //          composite quality > 0.5; B = lexical diversity > 0.5 with
  //          ≥ 100 chars; C = ≥ 20 whitespace tokens. Determinism:
  //          exact integer census; P̄/pe/kappa are single-row double
  //          formulas over the counts, round6, nullif-guarded.
  private def q286(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val k = docs(s, dir).select(col("source"),
      ((TF.qualityScore(col("text"), col("n_chars")) > lit(0.5)).cast("int") +
        (TF.tokenDiversity(col("text")) > lit(0.5) &&
          col("n_chars") >= 100).cast("int") +
        (size(TF.tokens(col("text"))) >= 20).cast("int")).as("k"))
    val cells = k.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("k")).as("sumk"),
      sum(col("k") * col("k") + (lit(3) - col("k")) * (lit(3) - col("k")))
        .as("sumsq"))
    // P̄ = Σ(k² + (3−k)² − 3) / (6N) = (sumsq − 3N) / (6N);
    // p = sumk/(3N); pe = p² + (1−p)²
    cells.select(col("source"), col("n_docs"),
        expr("round(CAST(sumsq - 3*n_docs AS DOUBLE) / (6.0*n_docs), 6)")
          .as("p_bar"),
        expr("round(CAST(sumk AS DOUBLE) / (3.0*n_docs), 6)").as("p_keep"),
        expr("round(((CAST(sumsq - 3*n_docs AS DOUBLE) / (6.0*n_docs)) - " +
          "(pow(CAST(sumk AS DOUBLE) / (3.0*n_docs), 2) + " +
          "pow(1 - CAST(sumk AS DOUBLE) / (3.0*n_docs), 2))) / " +
          "nullif(1 - (pow(CAST(sumk AS DOUBLE) / (3.0*n_docs), 2) + " +
          "pow(1 - CAST(sumk AS DOUBLE) / (3.0*n_docs), 2)), 0), 6)")
          .as("fleiss_kappa"))
      .orderBy(col("source"))
  }

  private val q286Sql = {
    import graft.text.{TextFunctions => TF}
    val la = s"(${TF.sql.qualityScore("text", "n_chars")} > 0.5)"
    val lb = s"(${TF.sql.tokenDiversity("text")} > 0.5 AND n_chars >= 100)"
    val lc = s"(len(${TF.sql.tokens("text")}) >= 20)"
    s"""WITH kk AS (
       |  SELECT source,
       |    (CASE WHEN $la THEN 1 ELSE 0 END +
       |     CASE WHEN $lb THEN 1 ELSE 0 END +
       |     CASE WHEN $lc THEN 1 ELSE 0 END) AS k
       |  FROM documents),
       |cells AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(k) AS BIGINT) AS sumk,
       |    CAST(sum(k*k + (3-k)*(3-k)) AS BIGINT) AS sumsq
       |  FROM kk GROUP BY 1)
       |SELECT source, n_docs,
       |  round(CAST(sumsq - 3*n_docs AS DOUBLE) / (6.0*n_docs), 6) AS p_bar,
       |  round(CAST(sumk AS DOUBLE) / (3.0*n_docs), 6) AS p_keep,
       |  round(((CAST(sumsq - 3*n_docs AS DOUBLE) / (6.0*n_docs)) -
       |    (pow(CAST(sumk AS DOUBLE) / (3.0*n_docs), 2) +
       |    pow(1 - CAST(sumk AS DOUBLE) / (3.0*n_docs), 2))) /
       |    nullif(1 - (pow(CAST(sumk AS DOUBLE) / (3.0*n_docs), 2) +
       |    pow(1 - CAST(sumk AS DOUBLE) / (3.0*n_docs), 2)), 0), 6)
       |    AS fleiss_kappa
       |FROM cells ORDER BY source""".stripMargin
  }

  // -- q289: 1-D Wasserstein-1 (earth mover's) distance between each
  //          source's length distribution and the corpus — the drift
  //          metric with UNITS (expected chars moved per doc), where
  //          q182's PSI and q225's KS are bin-relative: a source
  //          whose docs run 40 chars longer reads as ~40 here. EMD₁ =
  //          ∫|F_s − F|dx, integrated exactly over the merged value
  //          grid: per consecutive distinct value, |F_s − F| × gap.
  //          Determinism: with F_s = cum_s/n_s and F = cum/N, each
  //          term is |cum_s·N − cum·n_s| · Δv — pure integer
  //          arithmetic summed exactly; the final divide by n_s·N is
  //          one double, round6. Long headroom: terms ≤ n_s·N·Δv ~
  //          3e14 at sf1.0 (ANSI would fail loudly, not wrap); promote
  //          to decimal beyond ~10⁷ docs. Scale shape: one scan →
  //          value census (domain-bounded, the audited partitionless
  //          grid) → #sources × #values grid with per-source
  //          partitioned cumsums — never a per-doc pair.
  private def q289(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir).select(col("source"), col("n_chars").as("v"))
    val wv = Window.orderBy(col("v"))
    val gv = d.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap", coalesce(lead(col("v"), 1).over(wv) - col("v"),
        lit(0L)))
    val srcs = d.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val bySrc = d.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c_sv"))
    val tot = gv.agg(max(col("cum")).as("n_total"))
    val ws = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    srcs.crossJoin(broadcast(gv)).crossJoin(broadcast(tot))
      .join(bySrc, Seq("source", "v"), "left")
      .withColumn("cum_s",
        sum(coalesce(col("c_sv"), lit(0L))).over(ws))
      .groupBy(col("source")).agg(
        max(col("n_src")).as("n_docs"),
        max(col("n_total")).as("n_total"),
        sum(expr("abs(cum_s * n_total - cum * n_src) * gap")).as("num"))
      .select(col("source"), col("n_docs"),
        expr("round(CAST(num AS DOUBLE) / " +
          "(CAST(n_docs AS DOUBLE) * n_total), 6)").as("emd_chars"))
      .orderBy(col("source"))
  }

  private val q289Sql =
    """WITH d AS (SELECT source, n_chars AS v FROM documents),
      |gv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY v),
      |g2 AS (SELECT v, cnt,
      |    CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(coalesce(lead(v, 1) OVER (ORDER BY v) - v, 0) AS BIGINT)
      |      AS gap
      |  FROM gv),
      |srcs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
      |  FROM d GROUP BY 1),
      |bysrc AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c_sv
      |  FROM d GROUP BY 1, 2),
      |grid AS (
      |  SELECT s.source, s.n_src, g.v, g.cum, g.gap,
      |    CAST(sum(coalesce(b.c_sv, 0)) OVER (PARTITION BY s.source
      |      ORDER BY g.v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_s
      |  FROM srcs s CROSS JOIN g2 g
      |  LEFT JOIN bysrc b ON b.source = s.source AND b.v = g.v)
      |SELECT source, max(n_src) AS n_docs,
      |  round(CAST(sum(abs(cum_s * (SELECT max(cum) FROM g2)
      |      - cum * n_src) * gap) AS DOUBLE) /
      |    (CAST(max(n_src) AS DOUBLE) * (SELECT max(cum) FROM g2)), 6)
      |    AS emd_chars
      |FROM grid GROUP BY source ORDER BY source""".stripMargin

  // ---- shared one-way-F machinery (q301, q306): given per-group
  //      exact integer moments (n_g, s_g = Σx, q_g = Σx²), the F
  //      statistic comes out of two milli-floored per-group double
  //      terms summed as longs (mean-of-rounded, shuffle-order-proof):
  //      SSB term  n_g·(s_g/n_g − S/N)²  and  SSW term  q_g − s_g²/n_g.
  //      Every double op is IEEE ×/÷/− over exact longs, so both
  //      engines floor the identical value. Long headroom: s_g² stays
  //      double-exact to s_g ~ 9.4e7 (≈10⁸ char-mass per group);
  //      milli terms ≤ ~6e16 at sf1.0 — promote to decimal beyond.
  private def oneWayF(grouped: DataFrame): DataFrame = {
    val tot = grouped.agg(sum(col("n_g")).as("nn"),
      sum(col("s_g")).as("ss"), sum(col("q_g")).as("qq"))
    grouped.crossJoin(broadcast(tot))
      .select(col("nn"),
        expr("CAST(floor(n_g * (CAST(s_g AS DOUBLE)/n_g - " +
          "CAST(ss AS DOUBLE)/nn) * (CAST(s_g AS DOUBLE)/n_g - " +
          "CAST(ss AS DOUBLE)/nn) * 1000) AS BIGINT)").as("b_milli"),
        expr("CAST(floor((q_g - CAST(s_g AS DOUBLE) * s_g / n_g) * 1000) " +
          "AS BIGINT)").as("w_milli"))
      .groupBy().agg(sum(col("b_milli")).as("ssb_milli"),
        sum(col("w_milli")).as("ssw_milli"),
        count(lit(1)).as("k"), max(col("nn")).as("nn"))
      .select(col("nn").as("n_docs"), col("k").as("n_groups"),
        (col("k") - 1L).as("df_between"),
        (col("nn") - col("k")).as("df_within"),
        col("ssb_milli"), col("ssw_milli"),
        expr("round((ssb_milli / 1e3 / (k - 1)) / " +
          "nullif(ssw_milli / 1e3 / (nn - k), 0), 6)").as("f_stat"),
        expr("round(CAST(ssb_milli AS DOUBLE) / " +
          "nullif(CAST(ssb_milli + ssw_milli AS DOUBLE), 0), 6)")
          .as("eta_sq"))
  }

  /** DuckDB twin of [[oneWayF]]: SELECT over a CTE `g(source, n_g,
    * s_g, q_g)` — emit as the query tail after the caller's CTEs. */
  private val oneWayFSql =
    """tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
      |    CAST(sum(s_g) AS BIGINT) AS ss FROM g),
      |terms AS (
      |  SELECT nn,
      |    CAST(floor(n_g * (CAST(s_g AS DOUBLE)/n_g -
      |      CAST(ss AS DOUBLE)/nn) * (CAST(s_g AS DOUBLE)/n_g -
      |      CAST(ss AS DOUBLE)/nn) * 1000) AS BIGINT) AS b_milli,
      |    CAST(floor((q_g - CAST(s_g AS DOUBLE) * s_g / n_g) * 1000)
      |      AS BIGINT) AS w_milli
      |  FROM g CROSS JOIN tot),
      |agg AS (
      |  SELECT CAST(sum(b_milli) AS BIGINT) AS ssb_milli,
      |    CAST(sum(w_milli) AS BIGINT) AS ssw_milli,
      |    CAST(count(*) AS BIGINT) AS k, CAST(max(nn) AS BIGINT) AS nn
      |  FROM terms)
      |SELECT nn AS n_docs, k AS n_groups,
      |  CAST(k - 1 AS BIGINT) AS df_between,
      |  CAST(nn - k AS BIGINT) AS df_within, ssb_milli, ssw_milli,
      |  round((ssb_milli / 1e3 / (k - 1)) /
      |    nullif(ssw_milli / 1e3 / (nn - k), 0), 6) AS f_stat,
      |  round(CAST(ssb_milli AS DOUBLE) /
      |    nullif(CAST(ssb_milli + ssw_milli AS DOUBLE), 0), 6) AS eta_sq
      |FROM agg""".stripMargin

  // -- q301: one-way ANOVA F-test of doc length across sources
  //          (Fisher) — the parametric mean-shift screen a mixing
  //          report runs next to q285's distribution test: F >> 1
  //          says at least one source's MEAN length differs beyond
  //          within-source variance. Built on [[oneWayF]]'s exact
  //          integer moments; one scan → #sources-row grid → 1 row.
  private def q301(s: SparkSession, dir: String): DataFrame =
    oneWayF(docs(s, dir).groupBy(col("source")).agg(
      count(lit(1)).as("n_g"), sum(col("n_chars")).as("s_g"),
      sum(col("n_chars") * col("n_chars")).as("q_g")))

  private val q301Sql =
    s"""WITH g AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_g,
       |    CAST(sum(n_chars) AS BIGINT) AS s_g,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q_g
       |  FROM documents GROUP BY 1),
       |$oneWayFSql""".stripMargin

  // -- q302: Kruskal–Wallis H test (Kruskal & Wallis 1952) of doc
  //          length across ALL sources at once — q285's two-sample
  //          rank test generalized to k groups, computed through the
  //          ANOVA-on-midranks identity H = (N−1)·SSB_d/SST_d over
  //          DOUBLED average ranks (which absorbs the tie correction
  //          exactly, since SST is taken over the realized midranks).
  //          Reads the shared [[mwRankCensus]]: mean doubled rank is
  //          N+1 exactly, SST_d = Σd² − N(N+1)² is pure longs, and
  //          each group's SSB term n_g·(r2_g/n_g − (N+1))² is one
  //          IEEE double milli-floored before the integer sum.
  //          ε² = (H − k + 1)/(N − k) is the effect size. Scale
  //          shape: identical to q285 — census grid, never a re-rank.
  private def q302(s: SparkSession, dir: String): DataFrame = {
    val (r, tot) = mwRankCensus(s, dir)
    r.crossJoin(broadcast(tot))
      .select(col("nn"), col("dd"),
        expr("CAST(floor(n1 * (CAST(r2 AS DOUBLE)/n1 - (nn + 1)) * " +
          "(CAST(r2 AS DOUBLE)/n1 - (nn + 1)) * 1000) AS BIGINT)")
          .as("b_milli"))
      .groupBy().agg(sum(col("b_milli")).as("ssb_milli"),
        count(lit(1)).as("k"), max(col("nn")).as("nn"),
        max(col("dd")).as("dd"))
      .select(col("nn").as("n_docs"), col("k").as("n_groups"),
        (col("k") - 1L).as("dof"),
        expr("round((nn - 1) * (ssb_milli / 1e3) / " +
          "nullif(CAST(dd - nn * (nn + 1) * (nn + 1) AS DOUBLE), 0), 6)")
          .as("h_stat"),
        expr("round(((nn - 1) * (ssb_milli / 1e3) / " +
          "nullif(CAST(dd - nn * (nn + 1) * (nn + 1) AS DOUBLE), 0) " +
          "- k + 1) / nullif(CAST(nn - k AS DOUBLE), 0), 6)")
          .as("epsilon_sq"))
  }

  private val q302Sql =
    s"""WITH $mwRankCtes,
      |terms AS (
      |  SELECT nn, dd,
      |    CAST(floor(n1 * (CAST(r2 AS DOUBLE)/n1 - (nn + 1)) *
      |      (CAST(r2 AS DOUBLE)/n1 - (nn + 1)) * 1000) AS BIGINT)
      |      AS b_milli
      |  FROM r CROSS JOIN tot),
      |agg AS (
      |  SELECT CAST(sum(b_milli) AS BIGINT) AS ssb_milli,
      |    CAST(count(*) AS BIGINT) AS k, CAST(max(nn) AS BIGINT) AS nn,
      |    CAST(max(dd) AS BIGINT) AS dd
      |  FROM terms)
      |SELECT nn AS n_docs, k AS n_groups, CAST(k - 1 AS BIGINT) AS dof,
      |  round((nn - 1) * (ssb_milli / 1e3) /
      |    nullif(CAST(dd - nn * (nn + 1) * (nn + 1) AS DOUBLE), 0), 6)
      |    AS h_stat,
      |  round(((nn - 1) * (ssb_milli / 1e3) /
      |    nullif(CAST(dd - nn * (nn + 1) * (nn + 1) AS DOUBLE), 0)
      |    - k + 1) / nullif(CAST(nn - k AS DOUBLE), 0), 6) AS epsilon_sq
      |FROM agg""".stripMargin

  // ---- q303 p-value kernel: two-sided normal p from a micro-
  //      quantized |z| via Abramowitz & Stegun 26.2.19 —
  //      2·(1−Φ(a)) = (1 + d₁a + … + d₆a⁶)^(−16), |err| < 3e-7.
  //      Chosen over erf/exp forms because it is ×/÷-ONLY: every op
  //      is IEEE correctly-rounded, so Spark and DuckDB materialize
  //      bit-identical doubles (libm exp differs in the last ulp
  //      across engines; multiplication cannot).
  private def pKernelY(az: String): String =
    s"(1 + 0.0498673470*$az + 0.0211410061*($az*$az) + " +
      s"0.0032776263*(($az*$az)*$az) + " +
      s"0.0000380036*(($az*$az)*($az*$az)) + " +
      s"0.0000488906*((($az*$az)*($az*$az))*$az) + " +
      s"0.0000053830*((($az*$az)*($az*$az))*($az*$az)))"

  // -- q303: Benjamini–Hochberg FDR control (Benjamini & Hochberg
  //          1995) over the per-source Mann–Whitney screens — the
  //          multiple-testing step a per-source audit NEEDS once it
  //          runs #sources simultaneous tests: at α=0.05, BH admits
  //          the largest rank k* with p₍ᵢ₎ ≤ i·α/m and rejects ranks
  //          ≤ k*; adjusted p is the suffix-min of p·m/i. p-values
  //          come from the ×/÷-only A&S kernel above over the
  //          micro-quantized |z| (see [[pKernelY]]), so the sort
  //          order, suffix min and rejection set are bit-identical
  //          across engines; reported p's are micro-floored longs.
  //          Scale shape: the windowed frame is the #sources test
  //          table (metadata-sized, audited partitionless site);
  //          everything upstream is the shared census.
  private def q303(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (r, tot) = mwRankCensus(s, dir)
    val z = r.crossJoin(broadcast(tot))
      .select(col("source"), col("n1"),
        expr("(CAST(r2 - n1*(n1+1) AS DOUBLE) - " +
          "CAST(n1*(nn-n1) AS DOUBLE)) / " +
          "nullif(2.0*sqrt(n1*(nn-n1) * ((nn+1.0)*nn*(nn-1.0) - tt) / " +
          "(12.0*nn*(nn-1.0))), 0)").as("z"))
      .withColumn("az",
        expr("floor(abs(coalesce(z, 0.0)) * 1000000) / 1e6"))
      .withColumn("y", expr(pKernelY("az")))
      .withColumn("y4", expr("(y*y)*(y*y)"))
      .withColumn("p", expr("1.0 / ((y4*y4)*(y4*y4))"))
    val ranked = z
      .withColumn("p_rank",
        row_number().over(Window.orderBy(col("p"), col("source")))
          .cast("long"))
      .withColumn("m_tests", count(lit(1)).over(Window.partitionBy()))
    ranked
      .withColumn("p_adj", min(least(lit(1.0),
          col("p") * col("m_tests") / col("p_rank")))
        .over(Window.orderBy(col("p_rank").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("kstar", max(when(
          col("p") * col("m_tests") * lit(20.0) <= col("p_rank"),
          col("p_rank"))).over(Window.partitionBy()))
      .select(col("source"), col("n1"), round(col("z"), 6).as("z"),
        expr("CAST(floor(p * 1000000) AS BIGINT)").as("p_micro"),
        col("p_rank"), col("m_tests"),
        expr("CAST(floor(p_adj * 1000000) AS BIGINT)").as("p_adj_micro"),
        (col("p_rank") <= coalesce(col("kstar"), lit(0L)))
          .cast("int").as("reject_05"))
      .orderBy(col("p_rank"))
  }

  private val q303Sql = {
    val y = pKernelY("az")
    s"""WITH $mwRankCtes,
      |z AS (
      |  SELECT source, n1,
      |    (CAST(r2 - n1*(n1+1) AS DOUBLE) - CAST(n1*(nn-n1) AS DOUBLE)) /
      |    nullif(2.0*sqrt(n1*(nn-n1) * ((nn+1.0)*nn*(nn-1.0) - tt) /
      |    (12.0*nn*(nn-1.0))), 0) AS z
      |  FROM r CROSS JOIN tot),
      |a AS (SELECT source, n1, z,
      |    floor(abs(coalesce(z, 0.0)) * 1000000) / 1e6 AS az FROM z),
      |yy AS (SELECT source, n1, z, $y AS y FROM a),
      |y4t AS (SELECT source, n1, z, (y*y)*(y*y) AS y4 FROM yy),
      |pp AS (SELECT source, n1, z, 1.0 / ((y4*y4)*(y4*y4)) AS p
      |  FROM y4t),
      |rk AS (SELECT source, n1, z, p,
      |    CAST(row_number() OVER (ORDER BY p, source) AS BIGINT)
      |      AS p_rank,
      |    CAST(count(*) OVER () AS BIGINT) AS m_tests
      |  FROM pp),
      |adj AS (SELECT *,
      |    min(least(1.0, p * m_tests / p_rank)) OVER (
      |      ORDER BY p_rank DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_adj,
      |    max(CASE WHEN p * m_tests * 20.0 <= p_rank
      |      THEN p_rank END) OVER () AS kstar
      |  FROM rk)
      |SELECT source, n1, round(z, 6) AS z,
      |  CAST(floor(p * 1000000) AS BIGINT) AS p_micro, p_rank, m_tests,
      |  CAST(floor(p_adj * 1000000) AS BIGINT) AS p_adj_micro,
      |  CAST(CASE WHEN p_rank <= coalesce(kstar, 0) THEN 1 ELSE 0 END
      |    AS INT) AS reject_05
      |FROM adj ORDER BY p_rank""".stripMargin
  }

  // -- q304: Hellinger / Bhattacharyya shard audit — per source, how
  //          far its LANGUAGE mix sits from the corpus mix, on the
  //          bounded [0,1] Hellinger metric (√(1−BC), BC = Σ√(pᵢqᵢ)).
  //          Complements q283's JSD (source mix per shard) on the
  //          orthogonal axis. A cell absent from a source contributes
  //          0 to BC exactly, so only observed (source, lang) cells
  //          are enumerated. Determinism: per-cell √(pq) is one IEEE
  //          sqrt over exact-long ratios, micro-floored before the
  //          per-source integer sum (mean-of-rounded); the final
  //          sqrt/round is a 1-row formula. Scale shape: one scan →
  //          #sources × #langs cells; marginals broadcast.
  private def q304(s: SparkSession, dir: String): DataFrame = {
    val joint = docs(s, dir).groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val nsrc = joint.groupBy(col("source")).agg(sum(col("n")).as("n_s"))
    val nlang = joint.groupBy(col("lang")).agg(sum(col("n")).as("c_v"))
    val tot = joint.agg(sum(col("n")).as("nn"))
    joint.join(nsrc, "source").join(broadcast(nlang), "lang")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"),
        expr("CAST(floor(sqrt((CAST(n AS DOUBLE)/n_s) * " +
          "(CAST(c_v AS DOUBLE)/nn)) * 1000000) AS BIGINT)")
          .as("bc_micro"))
      .groupBy(col("source")).agg(max(col("n_s")).as("n_docs"),
        sum(col("bc_micro")).as("bcm"))
      .select(col("source"), col("n_docs"),
        expr("round(bcm / 1e6, 6)").as("bhattacharyya"),
        expr("round(sqrt(greatest(0.0, 1 - bcm / 1e6)), 6)")
          .as("hellinger"))
      .orderBy(col("source"))
  }

  private val q304Sql =
    """WITH joint AS (
      |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY 1, 2),
      |nsrc AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_s
      |  FROM joint GROUP BY 1),
      |nlang AS (SELECT lang, CAST(sum(n) AS BIGINT) AS c_v
      |  FROM joint GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM joint),
      |cells AS (
      |  SELECT j.source, s.n_s,
      |    CAST(floor(sqrt((CAST(j.n AS DOUBLE)/s.n_s) *
      |      (CAST(l.c_v AS DOUBLE)/t.nn)) * 1000000) AS BIGINT)
      |      AS bc_micro
      |  FROM joint j JOIN nsrc s USING (source)
      |  JOIN nlang l USING (lang) CROSS JOIN tot t),
      |agg AS (
      |  SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
      |    CAST(sum(bc_micro) AS BIGINT) AS bcm
      |  FROM cells GROUP BY 1)
      |SELECT source, n_docs, round(bcm / 1e6, 6) AS bhattacharyya,
      |  round(sqrt(greatest(0.0, 1 - bcm / 1e6)), 6) AS hellinger
      |FROM agg ORDER BY source""".stripMargin

  // -- q306: Brown–Forsythe variance-homogeneity test (Brown &
  //          Forsythe 1974) of doc length across sources — did a
  //          source's length SPREAD drift even where its center
  //          held? (The robust Levene variant: one-way F over
  //          absolute deviations from the group MEDIAN.) Computed on
  //          the doubled deviation w = |2v − 2·median_g| — an exact
  //          long, since 2·median of an integer column is the sum of
  //          the two middle values — and F is scale-invariant, so
  //          F(w) = F(|v − median_g|) exactly; the reported SS milli
  //          sums are of the doubled variable (4× the natural-unit
  //          SS). Shares [[oneWayF]]'s exact-moment machinery. Scale
  //          shape: one exact-percentile pass (partial-aggregated) +
  //          one scan with the #sources median map broadcast.
  private def q306(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("source"), col("n_chars").as("v"))
    val med = d.groupBy(col("source"))
      .agg(expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").as("med2"))
    val w = d.join(broadcast(med), "source")
      .select(col("source"),
        abs(lit(2L) * col("v") - col("med2")).as("w"))
    oneWayF(w.groupBy(col("source")).agg(count(lit(1)).as("n_g"),
      sum(col("w")).as("s_g"), sum(col("w") * col("w")).as("q_g")))
  }

  private val q306Sql =
    s"""WITH d AS (SELECT source, n_chars AS v FROM documents),
       |med AS (SELECT source,
       |    CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
       |  FROM d GROUP BY 1),
       |w AS (SELECT d.source, abs(2 * d.v - m.med2) AS w
       |  FROM d JOIN med m USING (source)),
       |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_g,
       |    CAST(sum(w) AS BIGINT) AS s_g,
       |    CAST(sum(w * w) AS BIGINT) AS q_g
       |  FROM w GROUP BY 1),
       |$oneWayFSql""".stripMargin

  // -- q307: McNemar's test (McNemar 1947, continuity-corrected) of
  //          labeler A vs labeler B per source — the PAIRED screen
  //          q286's panel kappa can't give: do the two rules disagree
  //          SYSTEMATICALLY (A admits docs B rejects more often than
  //          the reverse)? Only the discordant cells matter:
  //          χ² = (|b−c|−1)²/(b+c) on b = #(A=1,B=0), c = #(A=0,B=1).
  //          Same deterministic labelers as q286 (A = composite
  //          quality > 0.5; B = lexical diversity > 0.5 with ≥ 100
  //          chars). Determinism: exact integer cells, one guarded
  //          double. Scale: one scan, one keyed agg.
  private def q307(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val l = docs(s, dir).select(col("source"),
      (TF.qualityScore(col("text"), col("n_chars")) > lit(0.5))
        .cast("int").as("a"),
      (TF.tokenDiversity(col("text")) > lit(0.5) &&
        col("n_chars") >= 100).cast("int").as("b"))
    l.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L))
          .as("a_only"),
        sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L))
          .as("b_only"))
      .select(col("source"), col("n_docs"), col("a_only"), col("b_only"),
        expr("round(CAST((abs(a_only - b_only) - 1) * " +
          "(abs(a_only - b_only) - 1) AS DOUBLE) / " +
          "nullif(CAST(a_only + b_only AS DOUBLE), 0), 6)")
          .as("mcnemar_chi2"))
      .orderBy(col("source"))
  }

  private val q307Sql = {
    import graft.text.{TextFunctions => TF}
    val la = s"(${TF.sql.qualityScore("text", "n_chars")} > 0.5)"
    val lb = s"(${TF.sql.tokenDiversity("text")} > 0.5 AND n_chars >= 100)"
    s"""WITH l AS (
       |  SELECT source,
       |    CASE WHEN $la THEN 1 ELSE 0 END AS a,
       |    CASE WHEN $lb THEN 1 ELSE 0 END AS b
       |  FROM documents),
       |cells AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS a_only,
       |    CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b_only
       |  FROM l GROUP BY 1)
       |SELECT source, n_docs, a_only, b_only,
       |  round(CAST((abs(a_only - b_only) - 1) *
       |    (abs(a_only - b_only) - 1) AS DOUBLE) /
       |    nullif(CAST(a_only + b_only AS DOUBLE), 0), 6)
       |    AS mcnemar_chi2
       |FROM cells ORDER BY source""".stripMargin
  }

  // -- q308: Cochran's Q test (Cochran 1950) across the full THREE-
  //          labeler panel per source — McNemar generalized to k
  //          matched raters: are the three rules' admit RATES equal?
  //          Q = [k(k−1)·ΣCⱼ² − (k−1)·T²] / (k·T − ΣRᵢ²) with
  //          k = 3, Cⱼ the per-labeler admit totals, Rᵢ the per-doc
  //          admit count (q286's k), T = ΣC = ΣR — a one-scan census:
  //          three conditional sums + Σk² + Σk. dof = k−1 = 2;
  //          χ²-distributed under H₀. Same labeler panel as q286.
  private def q308(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val l = docs(s, dir).select(col("source"),
      (TF.qualityScore(col("text"), col("n_chars")) > lit(0.5))
        .cast("long").as("a"),
      (TF.tokenDiversity(col("text")) > lit(0.5) &&
        col("n_chars") >= 100).cast("long").as("b"),
      (size(TF.tokens(col("text"))) >= 20).cast("long").as("c"))
    l.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("a")).as("ca"), sum(col("b")).as("cb"),
        sum(col("c")).as("cc"),
        sum((col("a") + col("b") + col("c")) *
          (col("a") + col("b") + col("c"))).as("r2s"))
      .select(col("source"), col("n_docs"), col("ca"), col("cb"),
        col("cc"),
        expr("round(CAST(6 * (ca*ca + cb*cb + cc*cc) - " +
          "2 * (ca + cb + cc) * (ca + cb + cc) AS DOUBLE) / " +
          "nullif(CAST(3 * (ca + cb + cc) - r2s AS DOUBLE), 0), 6)")
          .as("cochran_q"))
      .orderBy(col("source"))
  }

  private val q308Sql = {
    import graft.text.{TextFunctions => TF}
    val la = s"CASE WHEN ${TF.sql.qualityScore("text", "n_chars")} > 0.5 THEN 1 ELSE 0 END"
    val lb = s"CASE WHEN ${TF.sql.tokenDiversity("text")} > 0.5 AND n_chars >= 100 THEN 1 ELSE 0 END"
    val lc = s"CASE WHEN len(${TF.sql.tokens("text")}) >= 20 THEN 1 ELSE 0 END"
    s"""WITH l AS (
       |  SELECT source, $la AS a, $lb AS b, $lc AS c
       |  FROM documents),
       |cells AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb,
       |    CAST(sum(c) AS BIGINT) AS cc,
       |    CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS r2s
       |  FROM l GROUP BY 1)
       |SELECT source, n_docs, ca, cb, cc,
       |  round(CAST(6 * (ca*ca + cb*cb + cc*cc) -
       |    2 * (ca + cb + cc) * (ca + cb + cc) AS DOUBLE) /
       |    nullif(CAST(3 * (ca + cb + cc) - r2s AS DOUBLE), 0), 6)
       |    AS cochran_q
       |FROM cells ORDER BY source""".stripMargin
  }

  // -- q309: Dunn's post-hoc pairwise rank test (Dunn 1964) with
  //          Bonferroni control — AFTER q302's Kruskal–Wallis says
  //          "some source differs", this says WHICH pairs: zᵢⱼ =
  //          (R̄ᵢ − R̄ⱼ) / √[(N(N+1)/12 − tt/(12(N−1)))·(1/nᵢ + 1/nⱼ)]
  //          over the shared census midranks (R̄ = r2/(2n)). The
  //          #sources² pair grid is metadata-sized; p-values use the
  //          ×/÷-only A&S kernel (see [[pKernelY]]) so the Bonferroni
  //          decision p ≤ α/m compares bit-identical doubles (exact
  //          form p·m·20 ≤ 1 at α = 0.05).
  private def q309(s: SparkSession, dir: String): DataFrame = {
    val (r, tot) = mwRankCensus(s, dir)
    val lo = r.select(col("source").as("source_lo"), col("r2").as("r2_lo"),
      col("n1").as("n_lo"))
    val hi = r.select(col("source").as("source_hi"), col("r2").as("r2_hi"),
      col("n1").as("n_hi"))
    lo.join(hi, col("source_lo") < col("source_hi"))
      .crossJoin(broadcast(tot))
      .withColumn("z", expr(
        "((CAST(r2_lo AS DOUBLE)/n_lo - CAST(r2_hi AS DOUBLE)/n_hi) / 2) " +
        "/ nullif(sqrt((nn*(nn+1.0)/12 - tt/(12.0*(nn-1))) * " +
        "(1.0/n_lo + 1.0/n_hi)), 0)"))
      .withColumn("az",
        expr("floor(abs(coalesce(z, 0.0)) * 1000000) / 1e6"))
      .withColumn("y", expr(pKernelY("az")))
      .withColumn("y4", expr("(y*y)*(y*y)"))
      .withColumn("p", expr("1.0 / ((y4*y4)*(y4*y4))"))
      .withColumn("m_comparisons",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("source_lo"), col("source_hi"), col("n_lo"),
        col("n_hi"), round(col("z"), 6).as("z"),
        expr("CAST(floor(p * 1000000) AS BIGINT)").as("p_micro"),
        col("m_comparisons"),
        expr("CAST(CASE WHEN p * m_comparisons * 20.0 <= 1.0 " +
          "THEN 1 ELSE 0 END AS INT)").as("reject_bonf_05"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  private val q309Sql = {
    val y = pKernelY("az")
    s"""WITH $mwRankCtes,
      |pairs AS (
      |  SELECT a.source AS source_lo, b.source AS source_hi,
      |    a.r2 AS r2_lo, a.n1 AS n_lo, b.r2 AS r2_hi, b.n1 AS n_hi
      |  FROM r a JOIN r b ON a.source < b.source),
      |z AS (
      |  SELECT source_lo, source_hi, n_lo, n_hi,
      |    ((CAST(r2_lo AS DOUBLE)/n_lo - CAST(r2_hi AS DOUBLE)/n_hi) / 2)
      |    / nullif(sqrt((nn*(nn+1.0)/12 - tt/(12.0*(nn-1))) *
      |    (1.0/n_lo + 1.0/n_hi)), 0) AS z
      |  FROM pairs CROSS JOIN tot),
      |a2 AS (SELECT *, floor(abs(coalesce(z, 0.0)) * 1000000) / 1e6
      |    AS az FROM z),
      |yy AS (SELECT *, $y AS y FROM a2),
      |y4t AS (SELECT *, (y*y)*(y*y) AS y4 FROM yy),
      |pp AS (SELECT *, 1.0 / ((y4*y4)*(y4*y4)) AS p,
      |    CAST(count(*) OVER () AS BIGINT) AS m_comparisons FROM y4t)
      |SELECT source_lo, source_hi, n_lo, n_hi, round(z, 6) AS z,
      |  CAST(floor(p * 1000000) AS BIGINT) AS p_micro, m_comparisons,
      |  CAST(CASE WHEN p * m_comparisons * 20.0 <= 1.0
      |    THEN 1 ELSE 0 END AS INT) AS reject_bonf_05
      |FROM pp ORDER BY source_lo, source_hi""".stripMargin
  }

  // -- q311: exact quantile-drift grid — per source, the five DYADIC
  //          quantiles {0.125, 0.25, 0.5, 0.75, 0.875} of doc length
  //          against the corpus quantiles, with the delta in CHARS
  //          (the percentile-level complement to q289's integrated
  //          EMD: "this source's P87.5 runs 120 chars long").
  //          Quantile probes are deliberately dyadic: p·(n−1) and the
  //          interpolation fraction have ≤3 fractional bits, so the
  //          interpolated quantile q = a + frac·(b−a) is EXACT in
  //          double arithmetic — both engines materialize the
  //          identical value with NO rounding contract needed (0.1 /
  //          0.9 probes would not be: their binary fractions differ
  //          from the decimal and the two engines' interpolation
  //          formulas round differently). Scale shape: exact
  //          percentiles partial-aggregate; #sources × 5 grid out.
  private val DriftProbes = Seq(0.125, 0.25, 0.5, 0.75, 0.875)

  private def q311(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("source"), col("n_chars").as("v"))
    val pcols = DriftProbes.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(v, ${p}D)").as(s"q_$i") }
    val g = d.groupBy(col("source")).agg(pcols.head, pcols.tail: _*)
    val c = d.groupBy().agg(
      DriftProbes.zipWithIndex.map { case (p, i) =>
        expr(s"percentile(v, ${p}D)").as(s"c_$i") }.head,
      DriftProbes.zipWithIndex.tail.map { case (p, i) =>
        expr(s"percentile(v, ${p}D)").as(s"c_$i") }: _*)
    val rows = DriftProbes.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"), col(s"q_$i").as("q_src"),
        col(s"c_$i").as("q_corpus"),
        (col(s"q_$i") - col(s"c_$i")).as("delta_chars"))
    }
    g.crossJoin(broadcast(c))
      .select(col("source"), explode(array(rows: _*)).as("r"))
      .select(col("source"), col("r.p"), col("r.q_src"),
        col("r.q_corpus"), col("r.delta_chars"))
      .orderBy(col("source"), col("p"))
  }

  private val q311Sql = {
    val gq = DriftProbes.zipWithIndex.map { case (p, i) =>
      s"quantile_cont(v, $p) AS q_$i" }.mkString(", ")
    val cq = DriftProbes.zipWithIndex.map { case (p, i) =>
      s"quantile_cont(v, $p) AS c_$i" }.mkString(", ")
    val rows = DriftProbes.zipWithIndex.map { case (p, i) =>
      s"""SELECT source, $p AS p, q_$i AS q_src, c_$i AS q_corpus,
         |  q_$i - c_$i AS delta_chars FROM g CROSS JOIN c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH d AS (SELECT source, n_chars AS v FROM documents),
       |g AS (SELECT source, $gq FROM d GROUP BY 1),
       |c AS (SELECT $cq FROM d)
       |SELECT * FROM ($rows) ORDER BY source, p""".stripMargin
  }

  // -- q314: intraclass correlation ICC(1) + Kish design effect —
  //          HOW MUCH of doc-length variance is explained by source
  //          membership, and what that costs a source-clustered
  //          sample: ICC = (MSB − MSW)/(MSB + (n₀−1)·MSW) with
  //          n₀ = (N − Σn_g²/N)/(k−1) (one-way random effects,
  //          Fisher/Snedecor), deff = 1 + (N/k − 1)·ICC (Kish 1965) —
  //          the factor by which sampling whole sources inflates
  //          variance vs simple random sampling; the number that
  //          decides between doc-level and source-level shard
  //          sampling (q222's Neyman allocation consumes it).
  //          Determinism: q301's exact integer moments + Σn_g²;
  //          milli-floored group terms; the ICC/deff chain is staged
  //          double columns (identical IEEE ops both engines), round6
  //          at the end. Scale: one scan → #sources grid → 1 row.
  private def q314(s: SparkSession, dir: String): DataFrame = {
    val g = docs(s, dir).groupBy(col("source")).agg(
      count(lit(1)).as("n_g"), sum(col("n_chars")).as("s_g"),
      sum(col("n_chars") * col("n_chars")).as("q_g"))
    val tot = g.agg(sum(col("n_g")).as("nn"), sum(col("s_g")).as("ss"),
      sum(col("n_g") * col("n_g")).as("n2s"))
    g.crossJoin(broadcast(tot))
      .select(col("nn"), col("n2s"),
        expr("CAST(floor(n_g * (CAST(s_g AS DOUBLE)/n_g - " +
          "CAST(ss AS DOUBLE)/nn) * (CAST(s_g AS DOUBLE)/n_g - " +
          "CAST(ss AS DOUBLE)/nn) * 1000) AS BIGINT)").as("b_milli"),
        expr("CAST(floor((q_g - CAST(s_g AS DOUBLE) * s_g / n_g) * 1000) " +
          "AS BIGINT)").as("w_milli"))
      .groupBy().agg(sum(col("b_milli")).as("ssb_milli"),
        sum(col("w_milli")).as("ssw_milli"),
        count(lit(1)).as("k"), max(col("nn")).as("nn"),
        max(col("n2s")).as("n2s"))
      .withColumn("msb", expr("ssb_milli / 1e3 / (k - 1)"))
      .withColumn("msw", expr("ssw_milli / 1e3 / (nn - k)"))
      .withColumn("n0",
        expr("(CAST(nn AS DOUBLE) - CAST(n2s AS DOUBLE)/nn) / (k - 1)"))
      .withColumn("icc_raw",
        expr("(msb - msw) / nullif(msb + (n0 - 1) * msw, 0)"))
      .select(col("nn").as("n_docs"), col("k").as("n_groups"),
        round(col("msb"), 6).as("ms_between"),
        round(col("msw"), 6).as("ms_within"),
        round(col("n0"), 6).as("n0"),
        round(col("icc_raw"), 6).as("icc"),
        expr("round(1 + (CAST(nn AS DOUBLE)/k - 1) * icc_raw, 6)")
          .as("design_effect"))
  }

  private val q314Sql =
    """WITH g AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_g,
      |    CAST(sum(n_chars) AS BIGINT) AS s_g,
      |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q_g
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
      |    CAST(sum(s_g) AS BIGINT) AS ss,
      |    CAST(sum(n_g * n_g) AS BIGINT) AS n2s FROM g),
      |terms AS (
      |  SELECT nn, n2s,
      |    CAST(floor(n_g * (CAST(s_g AS DOUBLE)/n_g -
      |      CAST(ss AS DOUBLE)/nn) * (CAST(s_g AS DOUBLE)/n_g -
      |      CAST(ss AS DOUBLE)/nn) * 1000) AS BIGINT) AS b_milli,
      |    CAST(floor((q_g - CAST(s_g AS DOUBLE) * s_g / n_g) * 1000)
      |      AS BIGINT) AS w_milli
      |  FROM g CROSS JOIN tot),
      |agg AS (
      |  SELECT CAST(sum(b_milli) AS BIGINT) AS ssb_milli,
      |    CAST(sum(w_milli) AS BIGINT) AS ssw_milli,
      |    CAST(count(*) AS BIGINT) AS k, CAST(max(nn) AS BIGINT) AS nn,
      |    CAST(max(n2s) AS BIGINT) AS n2s
      |  FROM terms),
      |st AS (
      |  SELECT nn, k,
      |    ssb_milli / 1e3 / (k - 1) AS msb,
      |    ssw_milli / 1e3 / (nn - k) AS msw,
      |    (CAST(nn AS DOUBLE) - CAST(n2s AS DOUBLE)/nn) / (k - 1) AS n0
      |  FROM agg),
      |icc_t AS (
      |  SELECT *, (msb - msw) / nullif(msb + (n0 - 1) * msw, 0)
      |    AS icc_raw
      |  FROM st)
      |SELECT nn AS n_docs, k AS n_groups, round(msb, 6) AS ms_between,
      |  round(msw, 6) AS ms_within, round(n0, 6) AS n0,
      |  round(icc_raw, 6) AS icc,
      |  round(1 + (CAST(nn AS DOUBLE)/k - 1) * icc_raw, 6)
      |    AS design_effect
      |FROM icc_t""".stripMargin

  // -- q318: A/B sample-size calculator (power analysis) — per event
  //          type, the required n PER ARM to detect a relative MDE
  //          grid {1%, 2%, 5%, 10%} of the mean at α = 0.05 two-sided
  //          with 80% power: n = 2σ²(z_{α/2}+z_β)²/δ², δ = mde·μ
  //          (z constants as fixed literals 1.959964 + 0.841621 =
  //          2.801585). The planning step BEFORE q267/q270 run — "can
  //          this experiment even resolve the effect we care about?".
  //          Determinism: event values milli-quantized so the moments
  //          are exact longs (value ≤ ~561, 1e6 rows at sf1.0 keeps
  //          Σv² ≤ ~3e17); μ/σ²/n are staged double formulas over
  //          them, identical IEEE ops both engines, ceil at the end.
  //          Scale: one scan, #types × 4 rows out.
  private val MdeGrid = Seq(0.01, 0.02, 0.05, 0.10)

  private def q318(s: SparkSession, dir: String): DataFrame = {
    val m = graft.Tables.load(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(col("vm")).as("sm"), sum(col("vm") * col("vm")).as("qm"))
      .withColumn("mu", expr("CAST(sm AS DOUBLE) / n / 1e3"))
      .withColumn("vr", expr("greatest(0.0, (CAST(qm AS DOUBLE)/n - " +
        "(CAST(sm AS DOUBLE)/n) * (CAST(sm AS DOUBLE)/n)) / 1e6)"))
    val rows = MdeGrid.map { mde =>
      struct(lit(mde).as("mde"),
        expr(s"CAST(ceil(2 * vr * (2.801585 * 2.801585) / " +
          s"nullif(($mde * mu) * ($mde * mu), 0)) AS BIGINT)")
          .as("n_per_arm"))
    }
    m.select(col("event_type"), round(col("mu"), 6).as("mean"),
        round(expr("sqrt(vr)"), 6).as("sd"),
        explode(array(rows: _*)).as("r"))
      .select(col("event_type"), col("r.mde"), col("mean"), col("sd"),
        col("r.n_per_arm"))
      .orderBy(col("event_type"), col("mde"))
  }

  private val q318Sql = {
    val rows = MdeGrid.map { mde =>
      s"""SELECT event_type, $mde AS mde, round(mu, 6) AS mean,
         |  round(sqrt(vr), 6) AS sd,
         |  CAST(ceil(2 * vr * (2.801585 * 2.801585) /
         |    nullif(($mde * mu) * ($mde * mu), 0)) AS BIGINT)
         |    AS n_per_arm
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH mm AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
       |      AS sm,
       |    CAST(sum(CAST(floor(value * 1000) AS BIGINT) *
       |      CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS qm
       |  FROM events GROUP BY 1),
       |m AS (
       |  SELECT event_type, CAST(sm AS DOUBLE) / n / 1e3 AS mu,
       |    greatest(0.0, (CAST(qm AS DOUBLE)/n -
       |      (CAST(sm AS DOUBLE)/n) * (CAST(sm AS DOUBLE)/n)) / 1e6)
       |      AS vr
       |  FROM mm)
       |SELECT * FROM ($rows) ORDER BY event_type, mde""".stripMargin
  }

  // -- q321: Wald–Wolfowitz runs test (1940) per 64-doc pack — the
  //          shuffle-quality audit q283's JSD cannot give: JSD checks
  //          each shard's source MIX, the runs test checks the
  //          ORDERING within a pack (a pack whose 'en' docs arrive in
  //          long monotone streaks fails even with a perfect mix —
  //          exactly the "sorted-by-source corpus fed to training"
  //          bug). Binary mark = (lang = 'en'); R = #runs; under H0
  //          μ = 2·n1·n0/n + 1, σ² = 2n1n0(2n1n0−n)/(n²(n−1)).
  //          Determinism: runs/n1/n0 are exact integer censuses; z is
  //          the IDENTICAL expression text over them (sqrt is IEEE
  //          correctly rounded), round6; single-class packs yield
  //          NULL z via nullif. Scale shape: the lag window is
  //          partitioned by pack (64 rows each — never data-sized),
  //          then one keyed agg; #packs rows out.
  private val RunsPack = 64L

  private val runsZ =
    """((CAST(runs AS DOUBLE) - (2.0 * n1 * n0 / n + 1)) /
      | nullif(sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n) /
      |   (CAST(n AS DOUBLE) * n * (n - 1))), 0))"""
      .stripMargin.replace("\n", " ")

  private def q321(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
      .select(col("doc_id"), (col("lang") === "en").cast("long").as("m"))
      .withColumn("pack", expr(s"doc_id div $RunsPack"))
    val w = W.partitionBy(col("pack")).orderBy(col("doc_id"))
    d.withColumn("prev", lag(col("m"), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("m"), 1L)
          .otherwise(0L))
      .groupBy(col("pack"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("n1"),
        sum(col("chg")).as("runs"))
      .withColumn("n0", col("n") - col("n1"))
      .select(col("pack"), col("n"), col("n1"), col("n0"), col("runs"),
        expr(s"round($runsZ, 6)").as("z_score"),
        expr(s"abs($runsZ) <= 1.96").as("random_ok"))
      .orderBy(col("pack"))
  }

  private val q321Sql =
    s"""WITH d AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS m,
       |    doc_id // $RunsPack AS pack
       |  FROM documents),
       |lagd AS (
       |  SELECT pack, m,
       |    lag(m) OVER (PARTITION BY pack ORDER BY doc_id) AS prev
       |  FROM d),
       |agg AS (
       |  SELECT pack, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(m) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN prev IS NULL OR prev <> m THEN 1 ELSE 0
       |      END) AS BIGINT) AS runs
       |  FROM lagd GROUP BY 1),
       |full_agg AS (SELECT pack, n, n1, n - n1 AS n0, runs FROM agg)
       |SELECT pack, n, n1, n0, runs,
       |  round($runsZ, 6) AS z_score,
       |  abs($runsZ) <= 1.96 AS random_ok
       |FROM full_agg ORDER BY pack""".stripMargin

  // -- q322: split conformal prediction coverage (Vovk et al. 2005;
  //          the distribution-free eval wrapper modern model audits
  //          use): per event_type, a deterministic half split makes a
  //          calibration set; nonconformity = |cents − calibration
  //          mean|; q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest calibration
  //          score; the readout is the TEST-set coverage of the
  //          interval mean ± q̂ (valid ≥ 90% by exchangeability —
  //          an empirical coverage far off 0.9 flags a broken split
  //          or drift). Determinism: cents are exact integers, the
  //          calibration mean is meanMicro-rounded, q̂ comes from an
  //          integer rank census, coverage is ratio6. Scale shape:
  //          the order statistic is NOT a per-type sort — scores are
  //          censused by value and q̂ read off the cumulative census
  //          (score domain is bounded by the price grid, not |events|),
  //          then one broadcast join scores the test side.
  private def q322(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type").as("etype"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (Sampling.hashBucket(col("event_id"), 2, "conf") === 0L)
          .as("is_cal"))
    val cal = ev.filter(col("is_cal"))
    val mu = cal.groupBy(col("etype"))
      .agg(count(lit(1)).as("n_cal"), sum(col("cents")).as("s_cents"))
      .select(col("etype"), col("n_cal"),
        graft.functions.ExactRound.meanMicro(col("s_cents"),
          col("n_cal")).as("mu_cents"))
    val scoresCal = cal.join(mu, "etype")
      .select(col("etype"), col("n_cal"),
        abs(col("cents") - col("mu_cents")).as("score"))
    val census = scoresCal
      .groupBy(col("etype"), col("n_cal"), col("score"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        W.partitionBy(col("etype")).orderBy(col("score"))))
      .withColumn("k", expr("(9 * (n_cal + 1) + 9) div 10"))
    val qhat = census.filter(col("cum") >= col("k"))
      .groupBy(col("etype"))
      .agg(min(col("score")).as("qhat_cents"))
    val test = ev.filter(!col("is_cal")).join(mu, "etype")
      .join(qhat, "etype")
      .groupBy(col("etype"), col("n_cal"), col("mu_cents"),
        col("qhat_cents"))
      .agg(count(lit(1)).as("n_test"),
        sum((abs(col("cents") - col("mu_cents")) <= col("qhat_cents"))
          .cast("long")).as("n_covered"))
    test.select(col("etype").as("event_type"), col("n_cal"),
        col("n_test"), col("mu_cents"), col("qhat_cents"),
        graft.functions.ExactRound.ratio6(col("n_covered"),
          col("n_test")).as("coverage"))
      .orderBy(col("event_type"))
  }

  private val q322Sql = {
    import graft.functions.{ExactRound => ER}
    val h = bucketSql("event_id", 2, "conf")
    s"""WITH ev AS (
       |  SELECT event_id, event_type AS etype,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    ($h = 0) AS is_cal
       |  FROM events),
       |mu AS (
       |  SELECT etype, CAST(count(*) AS BIGINT) AS n_cal,
       |    CAST(${ER.sql.meanMicro("CAST(sum(cents) AS BIGINT)",
              "count(*)")} AS BIGINT) AS mu_cents
       |  FROM ev WHERE is_cal GROUP BY 1),
       |census AS (
       |  SELECT e.etype, m.n_cal, abs(e.cents - m.mu_cents) AS score,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM ev e JOIN mu m ON e.etype = m.etype
       |  WHERE e.is_cal GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT etype, n_cal, score,
       |    sum(c) OVER (PARTITION BY etype ORDER BY score) AS cum,
       |    (9 * (n_cal + 1) + 9) // 10 AS k
       |  FROM census),
       |qhat AS (
       |  SELECT etype, min(score) AS qhat_cents
       |  FROM cum WHERE cum >= k GROUP BY 1),
       |test AS (
       |  SELECT e.etype, m.n_cal, m.mu_cents, q.qhat_cents,
       |    CAST(count(*) AS BIGINT) AS n_test,
       |    CAST(sum(CASE WHEN abs(e.cents - m.mu_cents) <= q.qhat_cents
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
       |  FROM ev e JOIN mu m ON e.etype = m.etype
       |  JOIN qhat q ON e.etype = q.etype
       |  WHERE NOT e.is_cal GROUP BY 1, 2, 3, 4)
       |SELECT etype AS event_type, n_cal, n_test, mu_cents, qhat_cents,
       |  ${ER.sql.ratio6("n_covered", "n_test")} AS coverage
       |FROM test ORDER BY event_type""".stripMargin
  }

  // -- q323: Friedman rank test (1937) over the complete block design
  //          day-of-week × event_type — "does any event type's value
  //          level differ consistently across the weekly cycle?": the
  //          k-related-samples twin of q301's one-way ANOVA (blocks
  //          remove the day effect q301 would pool into noise).
  //          Midranks are computed by an exact within-block census
  //          self-join (5×5 per block) in HALF-UNITS — never a float
  //          rank — and the cell statistic is the micro-quantized
  //          mean (micro6 contract). χ²_F = 12/(bk(k+1))·ΣR_j² −
  //          3b(k+1) evaluated on exact integers, round6; df = k−1 =
  //          4, crit χ²₀.₀₅ = 9.487729 under the schema-fixed k = 5.
  //          Day-of-week is PURE INTEGER arithmetic ((days+4) mod 7,
  //          0 = Sunday) so both engines bucket identically. Scale
  //          shape: one scan → 35-cell grid; everything after is
  //          grid-sized.
  private val friedmanChi2 =
    "(12.0 * sum_rh2 / 4 / (n_blocks * n_treatments * " +
      "(n_treatments + 1)) - 3.0 * n_blocks * (n_treatments + 1))"

  private def q323(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(s, dir, "events")
      .select(expr("((CAST(ts AS LONG) div 86400) + 4) % 7").as("dow"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("dow"), col("event_type"))
      .agg(graft.functions.ExactRound.micro6(sum(col("cents")),
        count(lit(1))).as("v"))
    val ranked = cells.as("x")
      .join(cells.as("y"), col("x.dow") === col("y.dow"))
      .groupBy(col("x.dow").as("dow"),
        col("x.event_type").as("event_type"))
      .agg((sum((col("y.v") < col("x.v")).cast("long")) * 2 +
        sum((col("y.v") === col("x.v")).cast("long")) + 1)
        .as("rank_half"))
    val byTreat = ranked.groupBy(col("event_type"))
      .agg(sum(col("rank_half")).as("r_half"),
        count(lit(1)).as("b"))
    val totals = byTreat.agg(
      sum(col("r_half") * col("r_half")).as("sum_rh2"),
      max(col("b")).as("n_blocks"), count(lit(1)).as("n_treatments"),
      sum(col("b")).as("n_cells"))
    byTreat.crossJoin(broadcast(totals.select(col("sum_rh2"),
        col("n_blocks"), col("n_treatments"),
        (col("n_cells") === col("n_blocks") * col("n_treatments"))
          .as("complete"))))
      .select(col("event_type"),
        (col("r_half") / lit(2.0)).as("rank_sum"),
        col("n_blocks"), col("n_treatments"), col("complete"),
        expr(s"round($friedmanChi2, 6)").as("chi2_f"),
        expr(s"$friedmanChi2 > 9.487729").as("significant"))
      .orderBy(col("event_type"))
  }

  private val q323Sql = {
    import graft.functions.{ExactRound => ER}
    val chi2 = friedmanChi2
    s"""WITH cells AS (
       |  SELECT ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7
       |      AS dow, event_type,
       |    ${ER.sql.micro6("sum(CAST(round(value * 100) AS BIGINT))",
             "count(*)")} AS v
       |  FROM events GROUP BY 1, 2),
       |ranked AS (
       |  SELECT x.dow, x.event_type,
       |    CAST(sum(CASE WHEN y.v < x.v THEN 1 ELSE 0 END) * 2 +
       |      sum(CASE WHEN y.v = x.v THEN 1 ELSE 0 END) + 1 AS BIGINT)
       |      AS rank_half
       |  FROM cells x JOIN cells y ON x.dow = y.dow
       |  GROUP BY 1, 2),
       |by_treat AS (
       |  SELECT event_type, CAST(sum(rank_half) AS BIGINT) AS r_half,
       |    CAST(count(*) AS BIGINT) AS b
       |  FROM ranked GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(r_half * r_half) AS BIGINT) AS sum_rh2,
       |    CAST(max(b) AS BIGINT) AS n_blocks,
       |    CAST(count(*) AS BIGINT) AS n_treatments,
       |    CAST(sum(b) AS BIGINT) AS n_cells
       |  FROM by_treat)
       |SELECT event_type, r_half / 2.0 AS rank_sum, n_blocks,
       |  n_treatments, n_cells = n_blocks * n_treatments AS complete,
       |  round($chi2, 6) AS chi2_f,
       |  $chi2 > 9.487729 AS significant
       |FROM by_treat CROSS JOIN totals
       |ORDER BY event_type""".stripMargin
  }

  // -- q324: Jonckheere–Terpstra ordered-alternative test (1954) —
  //          "does order value trend MONOTONICALLY across the five
  //          priority levels?": where q301/q302 only detect that SOME
  //          group differs, J tests the a-priori ordering 1-URGENT <
  //          … < 5-LOW, which is the right alternative for any graded
  //          factor (quality buckets, curriculum stages). J = Σ_{i<j}
  //          [#(x_i < x_j) + ½#(x_i = x_j)] computed in HALF-UNITS on
  //          a $500 price-bucket grid (the operator's declared tie
  //          granularity — the grid is bounded by the PRICE RANGE,
  //          never by |orders|); z uses the classic no-tie moments
  //          (Hollander & Wolfe 1973): μ = (N²−Σn_i²)/4, σ² =
  //          [N²(2N+3)−Σn_i²(2n_i+3)]/72. Determinism: J/N/n_i are
  //          exact integers; z is shared expression text, round6.
  //          Scale shape: one scan → (group × bucket) census,
  //          DENSIFIED over the (group × distinct-bucket) grid before
  //          the cumulative window — a lower group with no orders at
  //          bucket v must still expose its below-v cumulative there,
  //          or its entire cumlt is silently dropped from J (the
  //          sparse-cell undercount caught in round 10's review). The
  //          grid is bounded by groups × price range (≤ 5 × ~1200
  //          cells), never by |orders|; the pair sum joins the sparse
  //          census to the dense cum frame on the bucket key.
  private val JtBucket = 50000L // $500 in cents

  /** Dense cumulative-below frame + J in half-units for a (g, v, c)
    * census. Package-visible so JonckheereSpec can pin J against a
    * brute-force pair count on toy data.
    */
  private[graft] def jonckheereJHalf(census: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val grid = census.select(col("g")).distinct()
      .crossJoin(census.select(col("v")).distinct())
    val dense = grid.join(census, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val cum = dense
      .withColumn("cumlt", coalesce(sum(col("c")).over(
        W.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    census.as("j")
      .join(cum.as("i"), col("i.v") === col("j.v") &&
        col("i.g") < col("j.g"))
      .agg(coalesce(sum(col("j.c") * col("i.cumlt") * 2 +
        col("j.c") * col("i.c")), lit(0L)).as("j_half"))
  }

  private def q324(s: SparkSession, dir: String): DataFrame = {
    val census = Tables.load(s, dir, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)")
          .as("g"),
        expr(s"CAST(round(o_totalprice * 100) AS BIGINT) div $JtBucket")
          .as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val jHalf = jonckheereJHalf(census)
    val sizes = census.groupBy(col("g")).agg(sum(col("c")).as("ni"))
    val moments = sizes.agg(sum(col("ni")).as("nn"),
      sum(col("ni") * col("ni")).as("sum_ni2"),
      sum(col("ni") * col("ni") * (col("ni") * 2 + 3)).as("sum_ni2x"),
      count(lit(1)).as("n_groups"))
    val z =
      """((j_half / 2.0 - (CAST(nn AS DOUBLE) * nn - sum_ni2) / 4) /
        | nullif(sqrt((CAST(nn AS DOUBLE) * nn * (2 * nn + 3) -
        |   sum_ni2x) / 72), 0))""".stripMargin.replace("\n", " ")
    jHalf.crossJoin(broadcast(moments))
      .select(col("n_groups"), col("nn").as("n_total"),
        (col("j_half") / lit(2.0)).as("j_stat"),
        expr(s"round($z, 6)").as("z_score"),
        expr(s"abs($z) > 1.96").as("monotone_trend"))
  }

  private val q324Sql = {
    val z =
      """((j_half / 2.0 - (CAST(nn AS DOUBLE) * nn - sum_ni2) / 4) /
        | nullif(sqrt((CAST(nn AS DOUBLE) * nn * (2 * nn + 3) -
        |   sum_ni2x) / 72), 0))""".stripMargin.replace("\n", " ")
    s"""WITH census AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) // $JtBucket AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM orders GROUP BY 1, 2),
       |grid AS (
       |  SELECT gs.g, vs.v FROM (SELECT DISTINCT g FROM census) gs
       |  CROSS JOIN (SELECT DISTINCT v FROM census) vs),
       |dense AS (
       |  SELECT grid.g, grid.v,
       |    CAST(coalesce(census.c, 0) AS BIGINT) AS c
       |  FROM grid LEFT JOIN census
       |    ON census.g = grid.g AND census.v = grid.v),
       |cum AS (
       |  SELECT g, v, c,
       |    CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cumlt
       |  FROM dense),
       |jh AS (
       |  SELECT CAST(coalesce(sum(j.c * i.cumlt * 2 + j.c * i.c), 0)
       |    AS BIGINT) AS j_half
       |  FROM census j JOIN cum i ON i.v = j.v AND i.g < j.g),
       |sizes AS (SELECT g, CAST(sum(c) AS BIGINT) AS ni
       |          FROM census GROUP BY 1),
       |moments AS (
       |  SELECT CAST(sum(ni) AS BIGINT) AS nn,
       |    CAST(sum(ni * ni) AS BIGINT) AS sum_ni2,
       |    CAST(sum(ni * ni * (ni * 2 + 3)) AS BIGINT) AS sum_ni2x,
       |    CAST(count(*) AS BIGINT) AS n_groups
       |  FROM sizes)
       |SELECT n_groups, nn AS n_total, j_half / 2.0 AS j_stat,
       |  round($z, 6) AS z_score,
       |  abs($z) > 1.96 AS monotone_trend
       |FROM jh CROSS JOIN moments""".stripMargin
  }

  // -- q325: Wald's sequential probability ratio test (1945) replayed
  //          over the purchase stream — the always-valid alternative
  //          to the fixed-horizon q267: H₀ p = 0.10 vs H₁ p = 0.15 on
  //          the conversion Bernoulli (value > 95, q267's definition;
  //          the empirical rate ≈ 0.13 sits BETWEEN the hypotheses,
  //          so the walk genuinely wanders), α = β = 0.05 → stop when
  //          the running LLR leaves (−ln 19, +ln 19). The LLR
  //          increments are CONTRACT CONSTANTS in micro-nats (success
  //          ln(0.15/0.10) → 405465,
  //          failure ln(0.85/0.90) → −57158, bounds ±2944439) so the
  //          whole replay is INTEGER arithmetic — no runtime ln.
  //          The running (n, k) prefix sums use q141's two-level
  //          decomposition (per-week totals cumsum'd over the bounded
  //          week frame + a within-week window) — no global ordered
  //          pass. Output: per arm, the stopping time, the decision,
  //          and the final LLR had it run to exhaustion. Scale shape:
  //          one scan → two windows bounded by the week width → one
  //          keyed agg + a 1-row-per-arm join back on the unique
  //          crossing step.
  // Contract constants shared with the streaming twin (SprtMonitor).
  private val SprtC1 = graft.streaming.SprtMonitor.C1
  private val SprtC0 = graft.streaming.SprtMonitor.C0
  private val SprtBound = graft.streaming.SprtMonitor.Bound

  private def q325(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val trials = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        expr("CAST(ts AS LONG)").as("sec"),
        (col("value") > 95).cast("long").as("conv"),
        when(Sampling.hashBucket(col("user_id"), 2, "ab") === 0L, "A")
          .otherwise("B").as("variant"))
      .withColumn("wk", expr("sec div 604800"))
    val beforeWk = W.partitionBy(col("variant")).orderBy(col("wk"))
      .rowsBetween(W.unboundedPreceding, -1)
    val wkTot = trials.groupBy(col("variant"), col("wk"))
      .agg(count(lit(1)).as("wn"), sum(col("conv")).as("wk_conv"))
      .withColumn("n_before",
        coalesce(sum(col("wn")).over(beforeWk), lit(0L)))
      .withColumn("k_before",
        coalesce(sum(col("wk_conv")).over(beforeWk), lit(0L)))
      .select(col("variant"), col("wk"), col("n_before"),
        col("k_before"))
    val within = W.partitionBy(col("variant"), col("wk"))
      .orderBy(col("sec"), col("event_id"))
    val walked = trials.join(wkTot, Seq("variant", "wk"))
      .withColumn("n", col("n_before") +
        count(lit(1)).over(within))
      .withColumn("k", col("k_before") + sum(col("conv")).over(within))
      .withColumn("llr",
        col("k") * SprtC1 + (col("n") - col("k")) * SprtC0)
    // The final LLR is a pure function of the totals (llr_n =
    // k·C1 + (n−k)·C0), so no "last row" lookup is needed.
    val finals = walked.groupBy(col("variant"))
      .agg(max(col("n")).as("n_trials"), max(col("k")).as("n_conv"))
      .withColumn("llr_final_micro",
        col("n_conv") * SprtC1 + (col("n_trials") - col("n_conv")) *
          SprtC0)
    val crossers = walked
      .filter(col("llr") >= SprtBound || col("llr") <= -SprtBound)
      .select(col("variant"), col("n"), col("llr"))
    val firstCross = crossers.groupBy(col("variant"))
      .agg(min(col("n")).as("cross_n"))
    val crossAt = crossers.as("c").join(firstCross.as("f"),
        col("c.variant") === col("f.variant") &&
          col("c.n") === col("f.cross_n"))
      .select(col("f.variant").as("cv"),
        col("f.cross_n").as("cross_n"),
        col("c.llr").as("cross_llr_micro"))
    finals.join(crossAt, col("variant") === col("cv"), "left")
      .select(col("variant"), col("n_trials"), col("n_conv"),
        col("llr_final_micro"), col("cross_n"),
        col("cross_llr_micro"),
        when(col("cross_llr_micro") >= SprtBound, "accept_h1")
          .when(col("cross_llr_micro") <= -SprtBound, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy(col("variant"))
  }

  private val q325Sql = {
    val h = bucketSql("user_id", 2, "ab")
    s"""WITH trials AS (
       |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |    CASE WHEN value > 95 THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN $h = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events WHERE event_type = 'purchase'),
       |walked AS (
       |  SELECT variant,
       |    CAST(count(*) OVER (PARTITION BY variant
       |      ORDER BY sec, event_id) AS BIGINT) AS n,
       |    CAST(sum(conv) OVER (PARTITION BY variant
       |      ORDER BY sec, event_id) AS BIGINT) AS k
       |  FROM trials),
       |llrd AS (
       |  SELECT variant, n, k,
       |    k * $SprtC1 + (n - k) * ($SprtC0) AS llr
       |  FROM walked),
       |finals AS (
       |  SELECT variant, max(n) AS n_trials, max(k) AS n_conv,
       |    max(k) * $SprtC1 + (max(n) - max(k)) * ($SprtC0)
       |      AS llr_final_micro
       |  FROM llrd GROUP BY 1),
       |crossers AS (
       |  SELECT * FROM llrd
       |  WHERE llr >= $SprtBound OR llr <= -$SprtBound),
       |first_cross AS (
       |  SELECT variant, min(n) AS cross_n FROM crossers GROUP BY 1),
       |cross_at AS (
       |  SELECT c.variant, f.cross_n, c.llr AS cross_llr_micro
       |  FROM crossers c JOIN first_cross f
       |    ON c.variant = f.variant AND c.n = f.cross_n)
       |SELECT f.variant, f.n_trials, f.n_conv, f.llr_final_micro,
       |  ca.cross_n, ca.cross_llr_micro,
       |  CASE WHEN ca.cross_llr_micro >= $SprtBound THEN 'accept_h1'
       |       WHEN ca.cross_llr_micro <= -$SprtBound THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM finals f
       |LEFT JOIN cross_at ca ON f.variant = ca.variant
       |ORDER BY f.variant""".stripMargin
  }

  // -- q326: uplift curve on the activity-score grid (Radcliffe 2007's
  //          Qini construction) — "if we target the top-x% most active
  //          users, how many INCREMENTAL conversions does treatment
  //          buy?": the targeting readout q267's average effect can't
  //          give. Treated = arm B, control = arm A (q267's hash
  //          assignment); score = event count. The curve is computed
  //          at every distinct activity value (a census grid bounded
  //          by the ACTIVITY DOMAIN, not |users|) via descending
  //          cumulative sums over the census: uplift(a) = K_t −
  //          K_c·N_t/N_c among users with activity ≥ a. Determinism:
  //          all cumulative counts are exact integers; uplift and the
  //          targeted fraction are round6/ratio6. Scale shape: one
  //          per-user agg → one census agg → windows over the census
  //          frame only.
  private def q326(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val users = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("activity"),
        max(when(col("event_type") === "purchase" &&
          col("value") > 95, 1L).otherwise(0L)).as("conv"))
      .withColumn("treated",
        (Sampling.hashBucket(col("user_id"), 2, "ab") === 1L)
          .cast("long"))
    val census = users.groupBy(col("activity"))
      .agg(sum(col("treated")).as("n_t"),
        sum(col("treated") * col("conv")).as("k_t"),
        sum(lit(1L) - col("treated")).as("n_c"),
        sum((lit(1L) - col("treated")) * col("conv")).as("k_c"))
    val desc = W.orderBy(col("activity").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val tot = users.agg(count(lit(1)).as("n_total"))
    val up =
      """(k_tc - CAST(k_cc AS DOUBLE) * n_tc / nullif(n_cc, 0))"""
    census
      .withColumn("n_tc", sum(col("n_t")).over(desc))
      .withColumn("k_tc", sum(col("k_t")).over(desc))
      .withColumn("n_cc", sum(col("n_c")).over(desc))
      .withColumn("k_cc", sum(col("k_c")).over(desc))
      .crossJoin(broadcast(tot))
      .select(col("activity").as("activity_min"),
        col("n_tc").as("n_treat"), col("k_tc").as("conv_treat"),
        col("n_cc").as("n_ctrl"), col("k_cc").as("conv_ctrl"),
        graft.functions.ExactRound.ratio6(col("n_tc") + col("n_cc"),
          col("n_total")).as("targeted_frac"),
        expr(s"round($up, 6)").as("uplift"))
      .orderBy(col("activity_min").desc)
  }

  private val q326Sql = {
    import graft.functions.{ExactRound => ER}
    val h = bucketSql("user_id", 2, "ab")
    s"""WITH users AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS activity,
       |    max(CASE WHEN event_type = 'purchase' AND value > 95
       |        THEN 1 ELSE 0 END) AS conv,
       |    CASE WHEN $h = 1 THEN 1 ELSE 0 END AS treated
       |  FROM events GROUP BY user_id),
       |census AS (
       |  SELECT activity,
       |    CAST(sum(treated) AS BIGINT) AS n_t,
       |    CAST(sum(treated * conv) AS BIGINT) AS k_t,
       |    CAST(sum(1 - treated) AS BIGINT) AS n_c,
       |    CAST(sum((1 - treated) * conv) AS BIGINT) AS k_c
       |  FROM users GROUP BY 1),
       |cum AS (
       |  SELECT activity,
       |    CAST(sum(n_t) OVER w AS BIGINT) AS n_tc,
       |    CAST(sum(k_t) OVER w AS BIGINT) AS k_tc,
       |    CAST(sum(n_c) OVER w AS BIGINT) AS n_cc,
       |    CAST(sum(k_c) OVER w AS BIGINT) AS k_cc
       |  FROM census
       |  WINDOW w AS (ORDER BY activity DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM users)
       |SELECT activity AS activity_min, n_tc AS n_treat,
       |  k_tc AS conv_treat, n_cc AS n_ctrl, k_cc AS conv_ctrl,
       |  ${ER.sql.ratio6("n_tc + n_cc", "n_total")} AS targeted_frac,
       |  round(k_tc - CAST(k_cc AS DOUBLE) * n_tc / nullif(n_cc, 0), 6)
       |    AS uplift
       |FROM cum CROSS JOIN tot
       |ORDER BY activity_min DESC""".stripMargin
  }

  // -- q329: weighted sampling without a sort — the Efraimidis–
  //          Spirakis (2006) / Gumbel-max trick: a draw with
  //          P(doc) ∝ weight is argmax_d u_d^(1/w_d), i.e. argmin of
  //          −ln(u)/w — ONE keyed min-aggregate per draw instead of a
  //          global weighted sort (the pattern for "sample a
  //          representative doc per source, quality-weighted" at any
  //          scale). u comes from the md5 hash on a 2²⁰ grid
  //          (u = (h + ½)/2²⁰), weights are n_chars; the key is
  //          quantized to NANO units FIRST (floor(−ln(u)·10⁹),
  //          positive) and divided by the weight in POSITIVE integer
  //          floor-division (micro units) so both engines order
  //          identically — no float compare, no negative division.
  //          Three salted draws approximate a without-replacement
  //          triple (independent draws; the operator documents the
  //          distinction). Determinism: ties break on (key, doc_id)
  //          struct min. Scale shape: 3 scans → 3 keyed min-aggs;
  //          #sources × 3 rows out.
  private def q329(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    def draw(salt: String) = {
      val h = pmod(TextFunctions.md5Long(
        concat(col("doc_id").cast("string"), lit(salt))), lit(1048576L))
      docs(s, dir)
        .select(lit(salt).as("draw"), col("source"), col("doc_id"),
          greatest(col("n_chars").cast("long"), lit(1L)).as("w"),
          floor(-log((h + lit(0.5)) / lit(1048576.0)) * lit(1e9))
            .cast("long").as("lnano"))
        .withColumn("key_micro", expr("(lnano * 1000000) div w"))
        .groupBy(col("draw"), col("source"))
        .agg(min(struct(col("key_micro"), col("doc_id"))).as("m"))
        .select(col("draw"), col("source"),
          col("m.key_micro").as("key_micro"),
          col("m.doc_id").as("doc_id"))
    }
    draw("g1").unionByName(draw("g2")).unionByName(draw("g3"))
      .orderBy(col("draw"), col("source"))
  }

  private val q329Sql = {
    import graft.text.TextFunctions
    def leg(salt: String) = {
      val h = "(" + TextFunctions.sql.md5Long(
        s"(CAST(doc_id AS VARCHAR) || '$salt')") +
        " % 1048576 + 1048576) % 1048576"
      s"""SELECT '$salt' AS draw, source,
         |    CAST(floor(-ln(($h + 0.5) / 1048576.0) * 1e9) AS BIGINT)
         |      AS lnano,
         |    greatest(CAST(n_chars AS BIGINT), 1) AS w, doc_id
         |  FROM documents""".stripMargin
    }
    s"""WITH keyed AS (
       |  SELECT draw, source, (lnano * 1000000) // w AS key_micro,
       |    doc_id
       |  FROM (${leg("g1")} UNION ALL ${leg("g2")}
       |        UNION ALL ${leg("g3")}) u),
       |picked AS (
       |  SELECT draw, source,
       |    min(struct_pack(key_micro := key_micro, doc_id := doc_id))
       |      AS m
       |  FROM keyed GROUP BY 1, 2)
       |SELECT draw, source, m.key_micro AS key_micro,
       |  m.doc_id AS doc_id
       |FROM picked ORDER BY draw, source""".stripMargin
  }

  // -- q330: off-policy evaluation by inverse propensity scoring
  //          (Horvitz–Thompson 1952; Li et al. WWW 2011's replay
  //          estimator) — "what revenue per event would policy π have
  //          logged?", answered from the BEHAVIOR log alone: V̂(π) =
  //          (1/N)·Σ r_i·1[a_i = π(x_i)]/p̂(a_i|x_i), context x =
  //          day-of-week, action a = event_type, reward r = cents.
  //          Because the propensity is cell-constant (p̂ = n_cell /
  //          n_dow), the row sum collapses to a CELL sum: Σ_cells
  //          1[a = π(dow)]·R_cell·ŵ_cell with ŵ = micro6(n_dow,
  //          n_cell) — exact integers end to end (the quantized-
  //          weight contract; at petabyte R_cell the product needs
  //          pre-scaled reward units, documented). Two policies are
  //          evaluated: always-purchase and match-the-dow-majority;
  //          the logged value is the plain mean. Scale shape: one
  //          scan → 35-cell grid; everything after is grid-sized.
  private def q330(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(expr("((CAST(ts AS LONG) div 86400) + 4) % 7").as("dow"),
        col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cells = ev.groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n_cell"), sum(col("cents")).as("r_cell"))
    val dows = cells.groupBy(col("dow"))
      .agg(sum(col("n_cell")).as("n_dow"),
        max(struct(col("n_cell"), col("event_type"))).as("mx"))
      .select(col("dow"), col("n_dow"),
        col("mx.event_type").as("majority_type"))
    val w = cells.join(dows, "dow")
      .withColumn("w_micro", graft.functions.ExactRound.micro6(
        col("n_dow"), col("n_cell")))
    val tot = ev.agg(count(lit(1)).as("n_total"),
      sum(col("cents")).as("r_total"))
    def policy(name: String, matchCond: org.apache.spark.sql.Column) =
      w.filter(matchCond)
        .agg(coalesce(sum(col("r_cell") * col("w_micro")), lit(0L))
          .as("numer"), count(lit(1)).as("matched_cells"))
        .crossJoin(broadcast(tot))
        .select(lit(name).as("policy"), col("matched_cells"),
          col("n_total"),
          expr("round(numer / 1e6 / 100.0 / n_total, 6)")
            .as("ips_value_dollars"),
          expr("round(CAST(r_total AS DOUBLE) / 100.0 / n_total, 6)")
            .as("logged_value_dollars"))
    policy("always_purchase", col("event_type") === "purchase")
      .unionByName(policy("match_dow_majority",
        col("event_type") === col("majority_type")))
      .orderBy(col("policy"))
  }

  private val q330Sql = {
    import graft.functions.{ExactRound => ER}
    def leg(name: String, cond: String) =
      s"""SELECT '$name' AS policy,
         |  CAST(count(*) AS BIGINT) AS matched_cells,
         |  (SELECT n_total FROM tot) AS n_total,
         |  round(coalesce(sum(r_cell * w_micro), 0) / 1e6 / 100.0 /
         |    (SELECT n_total FROM tot), 6) AS ips_value_dollars,
         |  round((SELECT CAST(r_total AS DOUBLE) FROM tot) / 100.0 /
         |    (SELECT n_total FROM tot), 6) AS logged_value_dollars
         |FROM w WHERE $cond""".stripMargin
    s"""WITH ev AS (
       |  SELECT ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7
       |      AS dow, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |cells AS (
       |  SELECT dow, event_type, CAST(count(*) AS BIGINT) AS n_cell,
       |    CAST(sum(cents) AS BIGINT) AS r_cell
       |  FROM ev GROUP BY 1, 2),
       |dows AS (
       |  SELECT dow, CAST(sum(n_cell) AS BIGINT) AS n_dow,
       |    max(struct_pack(n_cell := n_cell,
       |      event_type := event_type)).event_type AS majority_type
       |  FROM cells GROUP BY 1),
       |w AS (
       |  SELECT c.*, d.n_dow, d.majority_type,
       |    CAST(${ER.sql.micro6("d.n_dow", "c.n_cell")} AS BIGINT)
       |      AS w_micro
       |  FROM cells c JOIN dows d ON c.dow = d.dow),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(cents) AS BIGINT) AS r_total FROM ev)
       |SELECT * FROM (
       |${leg("always_purchase", "event_type = 'purchase'")}
       |UNION ALL
       |${leg("match_dow_majority", "event_type = majority_type")}) u
       |ORDER BY policy""".stripMargin
  }

  // -- q333: sample-ratio-mismatch guardrail — the FIRST check any
  //          experiment readout must pass (Fabijan et al. 2019
  //          "Diagnosing Sample Ratio Mismatch"): under the 50/50
  //          hash assignment, arm sizes follow a 1-df chi-square
  //          (na−nb)²/(na+nb); a significant imbalance means the
  //          assignment or logging is broken and q267/q270/q325's
  //          readouts are garbage — which is why this runs FIRST.
  //          Determinism: integer arm counts, shared expression text.
  //          Scale shape: one per-user agg → 2-row frame → 1 row.
  private def q333(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
      .withColumn("arm_a",
        (Sampling.hashBucket(col("user_id"), 2, "ab") === 0L)
          .cast("long"))
    val chi2 = "(CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb))"
    users.agg(sum(col("arm_a")).as("na"),
        sum(lit(1L) - col("arm_a")).as("nb"))
      .select(col("na"), col("nb"), (col("na") + col("nb")).as("n"),
        graft.functions.ExactRound.ratio6(col("na"),
          col("na") + col("nb")).as("ratio_a"),
        expr(s"round($chi2, 6)").as("chi2"),
        expr(s"$chi2 > 3.841459").as("srm_detected"))
  }

  private val q333Sql = {
    import graft.functions.{ExactRound => ER}
    val h = bucketSql("user_id", 2, "ab")
    val chi2 = "(CAST((na - nb) AS DOUBLE) * (na - nb) / (na + nb))"
    s"""WITH users AS (
       |  SELECT user_id, CASE WHEN $h = 0 THEN 1 ELSE 0 END AS arm_a
       |  FROM events GROUP BY user_id, 2),
       |arms AS (
       |  SELECT CAST(sum(arm_a) AS BIGINT) AS na,
       |    CAST(sum(1 - arm_a) AS BIGINT) AS nb
       |  FROM users)
       |SELECT na, nb, na + nb AS n,
       |  ${ER.sql.ratio6("na", "na + nb")} AS ratio_a,
       |  round($chi2, 6) AS chi2,
       |  $chi2 > 3.841459 AS srm_detected
       |FROM arms""".stripMargin
  }

  // -- q334: distribution-free median confidence interval per source —
  //          the order-statistic CI (binomial argument, normal
  //          approximation: ranks n/2 ∓ 1.96·√n/2, Hollander & Wolfe
  //          §3.4) on document length: the robust location readout to
  //          pair with q270's mean-based Welch screen when lengths are
  //          heavy-tailed. The three order statistics (lower bound,
  //          lower median at rank (n+1) div 2, upper bound) are read
  //          off ONE cumulative value census per source — never a
  //          per-source sort. Determinism: integer ranks from
  //          floor/ceil of shared sqrt expressions, integer value
  //          lookups. Scale shape: one census agg; cumulative windows
  //          run per source over the length DOMAIN, not |docs|.
  private def q334(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val census = docs(s, dir)
      .select(col("source"), col("n_chars").cast("long").as("v"))
      .groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        W.partitionBy(col("source")).orderBy(col("v"))))
    val ranks = census.groupBy(col("source"))
      .agg(sum(col("c")).as("n"))
      .select(col("source"), col("n"),
        expr("(n + 1) div 2").as("k_med"),
        expr("greatest(CAST(1 AS BIGINT), CAST(floor((n - 1.96 *" +
          " sqrt(n)) / 2) AS BIGINT))").as("k_lo"),
        expr("least(n, CAST(ceil(1 + (n + 1.96 * sqrt(n)) / 2)" +
          " AS BIGINT))").as("k_hi"))
    def at(rank: String, out: String) =
      census.join(ranks, "source")
        .filter(col("cum") >= col(rank))
        .groupBy(col("source")).agg(min(col("v")).as(out))
    ranks
      .join(at("k_med", "median"), "source")
      .join(at("k_lo", "ci_lo"), "source")
      .join(at("k_hi", "ci_hi"), "source")
      .select(col("source"), col("n"), col("median"), col("ci_lo"),
        col("ci_hi"), col("k_lo"), col("k_hi"))
      .orderBy(col("source"))
  }

  private val q334Sql =
    s"""WITH census AS (
       |  SELECT source, CAST(n_chars AS BIGINT) AS v,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM documents GROUP BY 1, 2),
       |cums AS (
       |  SELECT source, v, c,
       |    CAST(sum(c) OVER (PARTITION BY source ORDER BY v)
       |      AS BIGINT) AS cum
       |  FROM census),
       |ranks AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
       |    (CAST(sum(c) AS BIGINT) + 1) // 2 AS k_med,
       |    greatest(CAST(1 AS BIGINT),
       |      CAST(floor((sum(c) - 1.96 * sqrt(sum(c))) / 2)
       |        AS BIGINT)) AS k_lo,
       |    least(CAST(sum(c) AS BIGINT),
       |      CAST(ceil(1 + (sum(c) + 1.96 * sqrt(sum(c))) / 2)
       |        AS BIGINT)) AS k_hi
       |  FROM census GROUP BY 1),
       |med AS (SELECT c.source, min(v) AS median FROM cums c
       |  JOIN ranks r ON c.source = r.source
       |  WHERE c.cum >= r.k_med GROUP BY 1),
       |lo AS (SELECT c.source, min(v) AS ci_lo FROM cums c
       |  JOIN ranks r ON c.source = r.source
       |  WHERE c.cum >= r.k_lo GROUP BY 1),
       |hi AS (SELECT c.source, min(v) AS ci_hi FROM cums c
       |  JOIN ranks r ON c.source = r.source
       |  WHERE c.cum >= r.k_hi GROUP BY 1)
       |SELECT r.source, r.n, m.median, l.ci_lo, h.ci_hi, r.k_lo,
       |  r.k_hi
       |FROM ranks r JOIN med m ON r.source = m.source
       |JOIN lo l ON r.source = l.source
       |JOIN hi h ON r.source = h.source
       |ORDER BY r.source""".stripMargin

  // -- q335: Shapley-value channel attribution (Shapley 1953; the
  //          coalition-game credit split marketing stacks compute over
  //          exposure sets) — each user's exposure coalition is the
  //          SET of event types they performed at HIGH intensity
  //          (value > 250; the plain any-occurrence set is degenerate
  //          on this corpus — every user touches all five types —
  //          while the high-value mask spreads over 14 coalitions);
  //          v(S) = micro6 conversion rate among users with exactly
  //          that coalition (unobserved coalitions contribute v = 0);
  //          φ_channel = Σ_{S∌i} |S|!(4−|S|)!/5! · (v(S∪i) − v(S)).
  //          The 1/120 weights are EXACT in scaled units: with k-size
  //          weights ×120 = {24,6,4,6,24}, φ·120·10⁶ is a pure
  //          integer sum — one double division at report time. The
  //          order-free alternative to q224's positional attribution.
  //          Scale shape: one per-user agg → ≤32-row coalition grid;
  //          the Shapley sum is an 80-row grid join.
  private val ShapBits =
    Seq("click" -> 1L, "error" -> 2L, "purchase" -> 4L,
      "signup" -> 8L, "view" -> 16L)

  private def q335(s: SparkSession, dir: String): DataFrame = {
    val maskExpr = ShapBits.map { case (t, b) =>
      s"max(CASE WHEN event_type = '$t' AND value > 250 THEN $b ELSE 0 END)"
    }.mkString(" + ")
    val users = Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(expr(s"$maskExpr").as("mask"),
        max(when(col("event_type") === "purchase" &&
          col("value") > 95, 1L).otherwise(0L)).as("conv"))
    val v = users.groupBy(col("mask"))
      .agg(count(lit(1)).as("n_s"), sum(col("conv")).as("k_s"))
      .select(col("mask"), col("n_s"),
        graft.functions.ExactRound.micro6(col("k_s"), col("n_s"))
          .as("v_micro"))
    val full = s.range(32).select(col("id").as("m"))
      .join(v, col("m") === col("mask"), "left")
      .select(col("m"), coalesce(col("v_micro"), lit(0L)).as("vm"),
        coalesce(col("n_s"), lit(0L)).as("n_s"))
    val channels = {
      import s.implicits._
      ShapBits.toDF("channel", "bit")
    }
    val popcnt = (0 until 5).map(i => s"((m >> $i) & 1)")
      .mkString(" + ")
    val pairs = channels
      .join(full.select(col("m"), col("vm").as("v_s")),
        expr("(m & bit) = 0"))
      .withColumn("k", expr(popcnt))
      .withColumn("w120", expr(
        "CASE k WHEN 0 THEN 24 WHEN 1 THEN 6 WHEN 2 THEN 4" +
          " WHEN 3 THEN 6 ELSE 24 END"))
    val withUnion = pairs
      .join(full.select(col("m").as("mu"), col("vm").as("v_si")),
        expr("mu = m + bit"))
    val exposure = channels
      .join(full, expr("(m & bit) > 0"))
      .groupBy(col("channel"))
      .agg(sum(col("n_s")).as("n_users_exposed"))
    withUnion.groupBy(col("channel"))
      .agg(sum(col("w120") * (col("v_si") - col("v_s")))
        .as("phi_scaled"))
      .join(exposure, Seq("channel"))
      .select(col("channel"), col("n_users_exposed"),
        expr("round(phi_scaled / 120.0 / 1e6, 6)").as("phi"))
      .orderBy(col("channel"))
  }

  private val q335Sql = {
    import graft.functions.{ExactRound => ER}
    val maskExpr = ShapBits.map { case (t, b) =>
      s"max(CASE WHEN event_type = '$t' AND value > 250 THEN $b ELSE 0 END)"
    }.mkString(" + ")
    val chanValues = ShapBits.map { case (t, b) => s"('$t', $b)" }
      .mkString(", ")
    val popcnt = (0 until 5).map(i => s"((m >> $i) & 1)")
      .mkString(" + ")
    s"""WITH users AS (
       |  SELECT user_id, CAST($maskExpr AS BIGINT) AS mask,
       |    max(CASE WHEN event_type = 'purchase' AND value > 95
       |        THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |v AS (
       |  SELECT mask, CAST(count(*) AS BIGINT) AS n_s,
       |    CAST(${ER.sql.micro6("CAST(sum(conv) AS BIGINT)",
            "count(*)")} AS BIGINT) AS v_micro
       |  FROM users GROUP BY 1),
       |full_grid AS (
       |  SELECT g.m, coalesce(v.v_micro, 0) AS vm,
       |    coalesce(v.n_s, 0) AS n_s
       |  FROM (SELECT unnest(range(0, 32)) AS m) g
       |  LEFT JOIN v ON g.m = v.mask),
       |channels AS (SELECT * FROM (VALUES $chanValues)
       |  AS t(channel, bit)),
       |pairs AS (
       |  SELECT c.channel, f.m, f.vm AS v_s,
       |    $popcnt AS k
       |  FROM channels c JOIN full_grid f ON (f.m & c.bit) = 0),
       |scored AS (
       |  SELECT p.channel,
       |    CAST(sum((CASE p.k WHEN 0 THEN 24 WHEN 1 THEN 6
       |        WHEN 2 THEN 4 WHEN 3 THEN 6 ELSE 24 END) *
       |      (fu.vm - p.v_s)) AS BIGINT) AS phi_scaled
       |  FROM pairs p
       |  JOIN channels c ON p.channel = c.channel
       |  JOIN full_grid fu ON fu.m = p.m + c.bit
       |  GROUP BY 1),
       |exposure AS (
       |  SELECT c.channel, CAST(sum(f.n_s) AS BIGINT)
       |    AS n_users_exposed
       |  FROM channels c JOIN full_grid f ON (f.m & c.bit) > 0
       |  GROUP BY 1)
       |SELECT s.channel, e.n_users_exposed,
       |  round(s.phi_scaled / 120.0 / 1e6, 6) AS phi
       |FROM scored s JOIN exposure e ON s.channel = e.channel
       |ORDER BY s.channel""".stripMargin
  }

  // -- q339: difference-in-differences (Card & Krueger 1994's designs;
  //          Angrist & Pischke §5) on the 2×2 (arm × pre/post) grid —
  //          the observational-causal readout when treatment switches
  //          ON at a known time: DiD = (ȳ_B,post − ȳ_B,pre) −
  //          (ȳ_A,post − ȳ_A,pre) cancels both the arm level and the
  //          common time trend. Post = second half of the observed
  //          range (1-row range cross); outcome = event value cents.
  //          SE from the 4-cell variance sum (unequal-variance normal
  //          approximation, Welch-style). Determinism: integer cents
  //          sums and Σx² per cell, shared expression text for the
  //          final stats. Scale shape: one scan → 4-cell grid → 1-row
  //          stats cross; cells stream out of one keyed agg.
  private def q339(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(expr("CAST(ts AS LONG)").as("sec"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        when(Sampling.hashBucket(col("user_id"), 2, "ab") === 1L, 1L)
          .otherwise(0L).as("treat"))
    val rng = ev.agg(min(col("sec")).as("s0"), max(col("sec")).as("s1"))
    val cells = ev.crossJoin(broadcast(rng))
      .withColumn("post",
        (col("sec") >= expr("(s0 + s1) div 2")).cast("long"))
      .groupBy(col("treat"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(col("cents") * col("cents")).as("sxx"))
    val wide = cells.agg(
      max(when(col("treat") === 1 && col("post") === 1, col("n"))).as("n_tp"),
      max(when(col("treat") === 1 && col("post") === 1, col("sx"))).as("sx_tp"),
      max(when(col("treat") === 1 && col("post") === 1, col("sxx"))).as("sxx_tp"),
      max(when(col("treat") === 1 && col("post") === 0, col("n"))).as("n_tr"),
      max(when(col("treat") === 1 && col("post") === 0, col("sx"))).as("sx_tr"),
      max(when(col("treat") === 1 && col("post") === 0, col("sxx"))).as("sxx_tr"),
      max(when(col("treat") === 0 && col("post") === 1, col("n"))).as("n_cp"),
      max(when(col("treat") === 0 && col("post") === 1, col("sx"))).as("sx_cp"),
      max(when(col("treat") === 0 && col("post") === 1, col("sxx"))).as("sxx_cp"),
      max(when(col("treat") === 0 && col("post") === 0, col("n"))).as("n_cr"),
      max(when(col("treat") === 0 && col("post") === 0, col("sx"))).as("sx_cr"),
      max(when(col("treat") === 0 && col("post") === 0, col("sxx"))).as("sxx_cr"))
    cells.crossJoin(broadcast(wide))
      .select(col("treat"), col("post"), col("n"),
        graft.functions.ExactRound.ratio6(col("sx"), col("n") * 100)
          .as("mean_dollars"),
        expr(s"round($didExpr, 6)").as("did_cents"),
        expr(s"round($didSeExpr, 6)").as("se_cents"),
        expr(s"abs(($didExpr) / nullif($didSeExpr, 0)) > 1.96")
          .as("significant"))
      .orderBy(col("treat"), col("post"))
  }

  private def cellMean(p: String) =
    s"(CAST(sx_$p AS DOUBLE) / n_$p)"
  private def cellVarOverN(p: String) =
    s"((CAST(sxx_$p AS DOUBLE) / n_$p - ${cellMean(p)} * " +
      s"${cellMean(p)}) / n_$p)"
  private lazy val didExpr =
    s"((${cellMean("tp")} - ${cellMean("tr")}) - " +
      s"(${cellMean("cp")} - ${cellMean("cr")}))"
  private lazy val didSeExpr =
    s"sqrt(${cellVarOverN("tp")} + ${cellVarOverN("tr")} + " +
      s"${cellVarOverN("cp")} + ${cellVarOverN("cr")})"

  private val q339Sql = {
    import graft.functions.{ExactRound => ER}
    val h = bucketSql("user_id", 2, "ab")
    s"""WITH ev AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    CASE WHEN $h = 1 THEN 1 ELSE 0 END AS treat
       |  FROM events),
       |rng AS (SELECT min(sec) AS s0, max(sec) AS s1 FROM ev),
       |cells AS (
       |  SELECT treat,
       |    CASE WHEN sec >= (s0 + s1) // 2 THEN 1 ELSE 0 END AS post,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sx,
       |    CAST(sum(cents * cents) AS BIGINT) AS sxx
       |  FROM ev CROSS JOIN rng GROUP BY 1, 2),
       |wide AS (
       |  SELECT
       |    max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_tp,
       |    max(CASE WHEN treat = 1 AND post = 1 THEN sx END) AS sx_tp,
       |    max(CASE WHEN treat = 1 AND post = 1 THEN sxx END) AS sxx_tp,
       |    max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_tr,
       |    max(CASE WHEN treat = 1 AND post = 0 THEN sx END) AS sx_tr,
       |    max(CASE WHEN treat = 1 AND post = 0 THEN sxx END) AS sxx_tr,
       |    max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_cp,
       |    max(CASE WHEN treat = 0 AND post = 1 THEN sx END) AS sx_cp,
       |    max(CASE WHEN treat = 0 AND post = 1 THEN sxx END) AS sxx_cp,
       |    max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_cr,
       |    max(CASE WHEN treat = 0 AND post = 0 THEN sx END) AS sx_cr,
       |    max(CASE WHEN treat = 0 AND post = 0 THEN sxx END) AS sxx_cr
       |  FROM cells)
       |SELECT treat, post, n,
       |  ${ER.sql.ratio6("sx", "n * 100")} AS mean_dollars,
       |  round($didExpr, 6) AS did_cents,
       |  round($didSeExpr, 6) AS se_cents,
       |  abs(($didExpr) / nullif($didSeExpr, 0)) > 1.96 AS significant
       |FROM cells CROSS JOIN wide
       |ORDER BY treat, post""".stripMargin
  }

  // -- q342: O'Brien–Fleming group-sequential audit (O'Brien &
  //          Fleming 1979; the 5-look interim-analysis design a
  //          regulated experiment runs INSTEAD of peeking): the time
  //          range splits into 5 equal spans; at each look the pooled
  //          two-proportion z over all users SEEN so far is compared
  //          to the OBF boundary 2.0401·√(5/k) (two-sided α = 0.05,
  //          equally spaced looks — contract constants). Early looks
  //          demand overwhelming evidence; the final boundary is
  //          nearly the fixed-horizon 1.96. Complements q325's SPRT
  //          (per-trial) with the scheduled-look design. Determinism:
  //          users census by (variant, first_seen_span,
  //          first_conv_span) — a ≤ 2·5·6-cell grid — and each look
  //          reads cumulative integers off it; z is shared expression
  //          text. Scale shape: one per-user agg → 60-cell census ×
  //          5-look grid.
  private val ObfBoundaries =
    Seq(1 -> 4.562162, 2 -> 3.225946, 3 -> 2.633886, 4 -> 2.281081,
      5 -> 2.040100)

  private def q342(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"),
        (col("event_type") === "purchase" && col("value") > 95)
          .cast("long").as("conv"))
    val rng = ev.agg(min(col("sec")).as("s0"),
      (max(col("sec")) + 1).as("s1"))
    val spanned = ev.crossJoin(broadcast(rng))
      .withColumn("span",
        least(expr("((sec - s0) * 5) div (s1 - s0)") + 1, lit(5L)))
    val users = spanned.groupBy(col("user_id"))
      .agg(min(col("span")).as("first_seen"),
        min(when(col("conv") === 1L, col("span"))).as("first_conv"))
      .withColumn("variant",
        when(Sampling.hashBucket(col("user_id"), 2, "ab") === 0L, "A")
          .otherwise("B"))
    val census = users.groupBy(col("variant"), col("first_seen"),
        col("first_conv")).agg(count(lit(1)).as("c"))
    val looks = {
      import s.implicits._
      ObfBoundaries.toDF("look", "boundary")
    }
    val perLook = looks.join(census,
        census("first_seen") <= looks("look"), "left")
      .groupBy(col("look"), col("boundary"))
      .agg(
        coalesce(sum(when(col("variant") === "A", col("c"))), lit(0L))
          .as("na"),
        coalesce(sum(when(col("variant") === "A" &&
          col("first_conv") <= col("look"), col("c"))), lit(0L))
          .as("ka"),
        coalesce(sum(when(col("variant") === "B", col("c"))), lit(0L))
          .as("nb"),
        coalesce(sum(when(col("variant") === "B" &&
          col("first_conv") <= col("look"), col("c"))), lit(0L))
          .as("kb"))
    perLook.select(col("look"), col("boundary"), col("na"), col("ka"),
        col("nb"), col("kb"),
        expr(s"round($abZExpr, 6)").as("z_score"),
        expr(s"abs($abZExpr) > boundary").as("crossed"))
      .orderBy(col("look"))
  }

  private val q342Sql = {
    val h = bucketSql("user_id", 2, "ab")
    val lookValues = ObfBoundaries
      .map { case (k, b) => s"($k, $b)" }.mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |    CASE WHEN event_type = 'purchase' AND value > 95
       |      THEN 1 ELSE 0 END AS conv
       |  FROM events),
       |rng AS (SELECT min(sec) AS s0, max(sec) + 1 AS s1 FROM ev),
       |spanned AS (
       |  SELECT user_id, conv,
       |    least(((sec - s0) * 5) // (s1 - s0) + 1, 5) AS span
       |  FROM ev CROSS JOIN rng),
       |users AS (
       |  SELECT user_id, min(span) AS first_seen,
       |    min(CASE WHEN conv = 1 THEN span END) AS first_conv,
       |    CASE WHEN $h = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM spanned GROUP BY user_id),
       |census AS (
       |  SELECT variant, first_seen, first_conv,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM users GROUP BY 1, 2, 3),
       |looks AS (SELECT * FROM (VALUES $lookValues)
       |  AS t(look, boundary)),
       |per_look AS (
       |  SELECT l.look, l.boundary,
       |    CAST(coalesce(sum(CASE WHEN variant = 'A' THEN c END), 0)
       |      AS BIGINT) AS na,
       |    CAST(coalesce(sum(CASE WHEN variant = 'A'
       |      AND first_conv <= l.look THEN c END), 0) AS BIGINT) AS ka,
       |    CAST(coalesce(sum(CASE WHEN variant = 'B' THEN c END), 0)
       |      AS BIGINT) AS nb,
       |    CAST(coalesce(sum(CASE WHEN variant = 'B'
       |      AND first_conv <= l.look THEN c END), 0) AS BIGINT) AS kb
       |  FROM looks l LEFT JOIN census x ON x.first_seen <= l.look
       |  GROUP BY 1, 2)
       |SELECT look, boundary, na, ka, nb, kb,
       |  round($abZExpr, 6) AS z_score,
       |  abs($abZExpr) > boundary AS crossed
       |FROM per_look ORDER BY look""".stripMargin
  }

  // -- q346: pilot-subsample convergence audit — "how small a hash
  //          sample can I trust for this metric?": the same two
  //          corpus statistics (mean length, 'en' share) at nested
  //          1% ⊂ 5% ⊂ 25% ⊂ 100% hash samples (one bucket column,
  //          thresholds nest so each pilot is a strict subset — the
  //          reproducible-pilot discipline behind every sampled
  //          dashboard), each reported with its absolute drift from
  //          the full-corpus truth. Determinism: hash buckets,
  //          integer censuses, microMean6/ratio6; drift is exact
  //          integer micro differences. Scale shape: ONE scan
  //          computes the bucket; the 4-rate grid joins on a
  //          bucket-threshold inequality with a 4-row build side.
  private val PilotRates = Seq(10L -> 1, 50L -> 5, 250L -> 25,
    1000L -> 100)

  private def q346(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(
      Sampling.hashBucket(col("doc_id"), 1000, "pilot").as("bkt"),
      col("n_chars").cast("long").as("nc"),
      (col("lang") === "en").cast("long").as("en"))
    val rates = {
      import s.implicits._
      PilotRates.toDF("threshold", "rate_pct")
    }
    val per = rates.join(d, col("bkt") < col("threshold"))
      .groupBy(col("rate_pct"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("snc"),
        sum(col("en")).as("sen"))
      .select(col("rate_pct"), col("n_docs"),
        graft.functions.ExactRound.micro6(col("snc"), col("n_docs"))
          .as("mean_chars_micro"),
        graft.functions.ExactRound.micro6(col("sen"), col("n_docs"))
          .as("en_share_micro"))
    val full = per.filter(col("rate_pct") === 100)
      .select(col("mean_chars_micro").as("mc_full"),
        col("en_share_micro").as("en_full"))
    per.crossJoin(broadcast(full))
      .select(col("rate_pct"), col("n_docs"),
        (col("mean_chars_micro") / 1e6).as("mean_chars"),
        (col("en_share_micro") / 1e6).as("en_share"),
        (abs(col("mean_chars_micro") - col("mc_full")) / 1e6)
          .as("drift_chars"),
        (abs(col("en_share_micro") - col("en_full")) / 1e6)
          .as("drift_en"))
      .orderBy(col("rate_pct"))
  }

  private val q346Sql = {
    import graft.functions.{ExactRound => ER}
    val h = bucketSql("doc_id", 1000, "pilot")
    val rateValues = PilotRates
      .map { case (t, p) => s"($t, $p)" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT $h AS bkt, CAST(n_chars AS BIGINT) AS nc,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
       |  FROM documents),
       |rates AS (SELECT * FROM (VALUES $rateValues)
       |  AS t(threshold, rate_pct)),
       |per AS (
       |  SELECT rate_pct, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(${ER.sql.micro6("CAST(sum(nc) AS BIGINT)",
            "count(*)")} AS BIGINT) AS mc,
       |    CAST(${ER.sql.micro6("CAST(sum(en) AS BIGINT)",
            "count(*)")} AS BIGINT) AS es
       |  FROM rates r JOIN d ON d.bkt < r.threshold
       |  GROUP BY 1),
       |full_row AS (
       |  SELECT mc AS mc_full, es AS en_full FROM per
       |  WHERE rate_pct = 100)
       |SELECT rate_pct, n_docs, mc / 1e6 AS mean_chars,
       |  es / 1e6 AS en_share,
       |  abs(mc - mc_full) / 1e6 AS drift_chars,
       |  abs(es - en_full) / 1e6 AS drift_en
       |FROM per CROSS JOIN full_row
       |ORDER BY rate_pct""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q111_split_assign", q111, Some(q111Sql)),
    Q("q112_quota_sample", q112, Some(q112Sql)),
    Q("q115_decontamination", q115, Some(q115Sql), headline = true),
    Q("q116_corpus_build", q116, Some(q116Sql)),
    Q("q117_token_chunks", q117, Some(q117Sql)),
    Q("q125_pii_scrub", q125, Some(q125Sql)),
    Q("q127_mixture_plan", q127, Some(q127Sql)),
    Q("q132_split_leakage", q132, Some(q132Sql)),
    Q("q133_curriculum_buckets", q133, Some(q133Sql)),
    Q("q134_token_budget_select", q134, Some(q134Sql)),
    Q("q138_padding_waste", q138, Some(q138Sql)),
    Q("q139_filter_funnel", q139, Some(q139Sql)),
    Q("q141_shard_manifest", q141, Some(q141Sql)),
    Q("q203_packing_manifest", q203, Some(q203Sql)),
    Q("q210_blocklist_screen", q210, Some(q210Sql)),
    Q("q222_neyman_allocation", q222, Some(q222Sql)),
    Q("q248_poisson_bootstrap", q248, Some(q248Sql)),
    Q("q267_ab_test", q267, Some(q267Sql)),
    Q("q270_welch_ttest", q270, Some(q270Sql)),
    Q("q271_cuped", q271, Some(q271Sql)),
    Q("q274_labeler_kappa", q274, Some(q274Sql)),
    Q("q278_trimmed_quality", q278, Some(q278Sql)),
    Q("q283_shard_mixing", q283, Some(q283Sql)),
    Q("q284_source_overlap", q284, Some(q284Sql)),
    Q("q285_mannwhitney_u", q285, Some(q285Sql)),
    Q("q286_fleiss_kappa", q286, Some(q286Sql)),
    Q("q289_wasserstein_drift", q289, Some(q289Sql)),
    Q("q301_anova_f", q301, Some(q301Sql)),
    Q("q302_kruskal_wallis", q302, Some(q302Sql)),
    Q("q303_bh_fdr", q303, Some(q303Sql)),
    Q("q304_hellinger_shards", q304, Some(q304Sql)),
    Q("q306_brown_forsythe", q306, Some(q306Sql)),
    Q("q307_mcnemar", q307, Some(q307Sql)),
    Q("q308_cochran_q", q308, Some(q308Sql)),
    Q("q309_dunn_posthoc", q309, Some(q309Sql)),
    Q("q311_quantile_drift", q311, Some(q311Sql)),
    Q("q314_icc_design_effect", q314, Some(q314Sql)),
    Q("q318_power_analysis", q318, Some(q318Sql)),
    Q("q321_runs_test", q321, Some(q321Sql)),
    Q("q322_conformal_coverage", q322, Some(q322Sql)),
    Q("q323_friedman_test", q323, Some(q323Sql)),
    Q("q324_jonckheere_trend", q324, Some(q324Sql)),
    Q("q325_sprt_replay", q325, Some(q325Sql)),
    Q("q326_uplift_curve", q326, Some(q326Sql)),
    Q("q329_gumbel_sample", q329, Some(q329Sql)),
    Q("q330_ips_policy_value", q330, Some(q330Sql)),
    Q("q333_srm_check", q333, Some(q333Sql)),
    Q("q334_median_ci", q334, Some(q334Sql)),
    Q("q335_shapley_attribution", q335, Some(q335Sql)),
    Q("q339_diff_in_diff", q339, Some(q339Sql)),
    Q("q342_obf_group_sequential", q342, Some(q342Sql)),
    Q("q346_pilot_convergence", q346, Some(q346Sql)))
}
