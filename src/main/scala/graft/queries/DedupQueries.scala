package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup
import graft.functions.{VectorFunctions => VF}
import graft.text.{TextFunctions => TF}

/** Deduplication family (training-pipeline first-class operators):
  * exact hash dedup, MinHash+LSH banding, SimHash hamming, n-gram
  * Jaccard, embedding-cosine near-dup — each with an exact DuckDB oracle
  * (the LSH path is deterministic because the "permutations" are seeded
  * md5 hashes, so even banding is reproduced by the oracle).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // -- q27: exact dedup on normalized content key (sorted distinct tokens)
  private def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir), "doc_id", "text")
      .select(col("key"), col("keep_id"), col("group_size"))
      .orderBy(col("key"))

  private val q27Sql =
    """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS key,
      |  min(doc_id) AS keep_id, count(*) AS group_size
      |FROM documents
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY key""".stripMargin

  // -- q28: MinHash + LSH banding (k=12, 2 bands × r=6, est ≥ 0.9).
  //         Wide bands (r=6) keep candidate generation sub-quadratic even
  //         on this adversarially self-similar corpus: bucket collision
  //         probability is jaccard^6 per band.
  private def q28(s: SparkSession, dir: String): DataFrame =
    graft.dedup.DedupIndex.pairs(s, dir)
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy(col("a_id"), col("b_id"))

  private val q28Sql =
    s"""WITH sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id)
       |SELECT a_id, b_id, round(est, 6) AS est_jaccard FROM (
       |  SELECT c.a_id, c.b_id,
       |    len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) * 1.0 / 12 AS est
       |  FROM cand c JOIN sig sa ON sa.id = c.a_id JOIN sig sb ON sb.id = c.b_id) x
       |WHERE est >= 0.9
       |ORDER BY a_id, b_id""".stripMargin

  // -- q126: cluster canonicalization over the q28 pair graph —
  //          connected components (min-label propagation) + one survivor
  //          per cluster (longest text, tie to smallest id). The oracle
  //          replays the LSH pair generation, then closes the graph with
  //          a recursive CTE: min reachable id == the propagated label.
  private def q126(s: SparkSession, dir: String): DataFrame =
    graft.dedup.DedupIndex.clusters(s, dir).orderBy(col("doc_id"))

  /** Shared recursive CTE chain: q28's LSH pair graph → undirected
    * closure → `comp(doc_id, cluster_id)` (docs in no pair absent).
    * Reused by q126 and the cluster-safe split (q156). */
  private[queries] val componentCtes: String =
    s"""sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT c.a_id, c.b_id,
       |      len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) * 1.0 / 12 AS est
       |    FROM cand c JOIN sig sa ON sa.id = c.a_id JOIN sig sb ON sb.id = c.b_id) x
       |  WHERE est >= 0.9),
       |und AS (
       |  SELECT a_id AS s, b_id AS t FROM pairs
       |  UNION SELECT b_id AS s, a_id AS t FROM pairs),
       |reach AS (
       |  SELECT s, t FROM und
       |  UNION
       |  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s WHERE u.t <> r.s),
       |comp AS (
       |  SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |  FROM reach GROUP BY s)""".stripMargin

  private val q126Sql =
    s"""WITH RECURSIVE $componentCtes,
       |ranked AS (
       |  SELECT c.doc_id, c.cluster_id,
       |    count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY len(d.text) DESC, c.doc_id) AS rn
       |  FROM comp c JOIN documents d USING (doc_id))
       |SELECT doc_id, cluster_id, cluster_size, rn = 1 AS is_canonical
       |FROM ranked ORDER BY doc_id""".stripMargin

  // -- q29: SimHash (16-bit, frequency-weighted) hamming ≤ 3 within source
  private def q29(s: SparkSession, dir: String): DataFrame =
    graft.dedup.DedupIndex.simhashPairs(s, dir)
      .orderBy(col("blk"), col("a_id"), col("b_id"))

  private val q29Sql = {
    val sums = (0 until 16).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j").mkString(", ")
    val bits = (0 until 16).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id AS id, source AS blk, ${TF.sql.md5Long("t.tok")} AS h
       |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)),
       |sums AS (SELECT id, blk, $sums FROM toks GROUP BY id, blk),
       |sh AS (SELECT id, blk, CAST($bits AS BIGINT) AS simhash FROM sums)
       |SELECT a.blk, a.id AS a_id, b.id AS b_id,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY a.blk, a_id, b_id""".stripMargin
  }

  // -- q277: dedup recall estimate by capture–recapture (Chapman 1951
  //          estimator over Lincoln–Petersen) — how many near-dup
  //          pairs does the corpus REALLY contain, given two
  //          independent catchers? LSH (q28, restricted to same-source
  //          pairs so both methods sample the same population) and
  //          source-blocked SimHash (q29) each catch a subset; the
  //          overlap m sizes the unseen remainder:
  //          N̂ = (n1+1)(n2+1)/(m+1) − 1 and each method's estimated
  //          recall = n/N̂. The audit that turns "we ran two dedup
  //          passes" into "we believe we caught ~X% of near-dups" —
  //          the independence assumption is the usual caveat and is
  //          stated in the output's own terms (recalls near 1 mean
  //          the catchers agree, not that the estimator is exact).
  //          Determinism: three exact pair counts; Chapman is pure
  //          integral arithmetic; recalls are ExactRound ratios.
  //          Scale shape: both catchers read build-once DedupIndex
  //          tables; the overlap is one (a_id, b_id) join.
  private def q277(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    val src = d.select(col("doc_id"), col("source"))
    val lsh = graft.dedup.DedupIndex.pairs(s, dir)
      .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")),
        Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")),
        Seq("b_id"))
      .filter(col("sa") === col("sb"))
      .select(col("a_id"), col("b_id"))
    val sim = graft.dedup.DedupIndex.simhashPairs(s, dir)
      .select(col("a_id"), col("b_id"))
    val mBoth = lsh.join(sim, Seq("a_id", "b_id"), "left_semi")
    val est = "((n_lsh + 1) * (n_simhash + 1) div (n_both + 1) - 1)"
    lsh.agg(count(lit(1)).as("n_lsh"))
      .crossJoin(broadcast(sim.agg(count(lit(1)).as("n_simhash"))))
      .crossJoin(broadcast(mBoth.agg(count(lit(1)).as("n_both"))))
      .withColumn("est_total", expr(est))
      .select(col("n_lsh"), col("n_simhash"), col("n_both"),
        col("est_total"),
        when(col("est_total") > 0,
          ExactRound.ratio6(col("n_lsh"), col("est_total")))
          .as("recall_lsh"),
        when(col("est_total") > 0,
          ExactRound.ratio6(col("n_simhash"), col("est_total")))
          .as("recall_simhash"))
  }

  private val q277Sql = {
    import graft.functions.{ExactRound => ER}
    val sums = (0 until 16).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val bits = (0 until 16).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH sig AS (
       |  SELECT doc_id AS id, source,
       |    ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig, source,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#')
       |      AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b
       |    ON a.bucket = b.bucket AND a.id < b.id AND a.source = b.source),
       |lsh AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT c.a_id, c.b_id,
       |      len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2]))
       |        * 1.0 / 12 AS est
       |    FROM cand c JOIN sig sa ON sa.id = c.a_id
       |    JOIN sig sb ON sb.id = c.b_id) x
       |  WHERE est >= 0.9),
       |toks AS (
       |  SELECT doc_id AS id, source AS blk, ${TF.sql.md5Long("t.tok")} AS h
       |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)),
       |sums AS (SELECT id, blk, $sums FROM toks GROUP BY id, blk),
       |sh AS (SELECT id, blk, CAST($bits AS BIGINT) AS simhash FROM sums),
       |sim AS (
       |  SELECT a.id AS a_id, b.id AS b_id
       |  FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
       |cnt AS (
       |  SELECT
       |    (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
       |    (SELECT CAST(count(*) AS BIGINT) FROM sim) AS n_simhash,
       |    (SELECT CAST(count(*) AS BIGINT) FROM lsh
       |     WHERE EXISTS (SELECT 1 FROM sim
       |       WHERE sim.a_id = lsh.a_id AND sim.b_id = lsh.b_id))
       |      AS n_both)
       |SELECT n_lsh, n_simhash, n_both,
       |  (n_lsh + 1) * (n_simhash + 1) // (n_both + 1) - 1 AS est_total,
       |  CASE WHEN (n_lsh + 1) * (n_simhash + 1) // (n_both + 1) - 1 > 0
       |    THEN ${ER.sql.ratio6("n_lsh",
                "(n_lsh + 1) * (n_simhash + 1) // (n_both + 1) - 1")} END
       |    AS recall_lsh,
       |  CASE WHEN (n_lsh + 1) * (n_simhash + 1) // (n_both + 1) - 1 > 0
       |    THEN ${ER.sql.ratio6("n_simhash",
                "(n_lsh + 1) * (n_simhash + 1) // (n_both + 1) - 1")} END
       |    AS recall_simhash
       |FROM cnt""".stripMargin
  }

  // -- q30: character 3-gram Jaccard near-dup within source blocks
  private def q30(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(s, dir), "doc_id", "text", "source", n = 3,
        threshold = 0.6)
      .select(col("blk"), col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("blk"), col("a_id"), col("b_id"))

  private val q30Sql =
    s"""WITH g AS (
       |  SELECT source AS blk, doc_id AS id,
       |    list_distinct(${TF.sql.charShingles("text", 3)}) AS grams
       |  FROM documents)
       |SELECT blk, a_id, b_id, round(sim, 6) AS sim FROM (
       |  SELECT a.blk, a.id AS a_id, b.id AS b_id,
       |    CASE WHEN (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) > 0
       |      THEN len(list_intersect(a.grams, b.grams)) * 1.0 /
       |           (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
       |      ELSE 0.0 END AS sim
       |  FROM g a JOIN g b ON a.blk = b.blk AND a.id < b.id) x
       |WHERE sim >= 0.6
       |ORDER BY blk, a_id, b_id""".stripMargin

  // -- q31: embedding-cosine near-dup, IVF-blocked (multi-probe cell
  //         assignment → equi-join candidates → exact cosine verify).
  //         The oracle computes the identical blocked plan — the operator's
  //         contract is "pairs sharing an assigned cell", the production
  //         ANN-dedup shape (the exact all-pairs sweep stays available as
  //         Dedup.embeddingNearDup for small corpora).
  private def q31(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupBlocked(Tables.load(s, dir, "embeddings"), 0.35,
        probes = 2)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("a_id"), col("b_id"))

  private val q31Sql = {
    val l2 = "sqrt(list_sum(list_transform(list_zip(%s, %s), z -> (z[1]-z[2])*(z[1]-z[2]))))"
    s"""WITH el AS (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
       |         unnest(embedding::DOUBLE[]) AS x
       |  FROM embeddings),
       |centl AS (
       |  SELECT label AS cell, list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT label, pos, avg(x) AS cx FROM el GROUP BY label, pos) c
       |  GROUP BY label),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${l2.format("e.embedding::DOUBLE[]", "c.centroid")}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN centl c) x WHERE rn <= 2),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT c.a_id, c.b_id,
       |  round(${VF.sql.cosine("ea.embedding", "eb.embedding")}, 6) AS sim
       |FROM cand c
       |JOIN embeddings ea ON ea.vec_id = c.a_id
       |JOIN embeddings eb ON eb.vec_id = c.b_id
       |WHERE ${VF.sql.cosine("ea.embedding", "eb.embedding")} >= 0.35
       |ORDER BY a_id, b_id""".stripMargin
  }

  // -- q130: duplicated-span detection — 4-token shingles occurring in
  //          more than one distinct document; per-doc duplicated-shingle
  //          fraction + span-union token coverage. Coverage counts
  //          distinct exploded positions (integer arithmetic) so both
  //          engines agree exactly; k=4 on this corpus flags ~6% of
  //          shingle types (k=3 saturates at 42%, k=5 only sees the
  //          planted near-dups).
  private val SpanK = 4

  private def q130(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanDedup
    import graft.text.Repetition
    val toks = docs(s, dir)
      .select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
    SpanDedup.stats(toks, SpanK)
      .select(col("doc_id"), col("n_tokens"), col("n_shingles"),
        col("dup_shingles"), round(col("dup_frac"), 6).as("dup_frac"),
        col("covered_tokens"),
        round(col("covered_frac"), 6).as("covered_frac"))
      .orderBy(col("doc_id"))
  }

  private val q130Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS l
       |  FROM documents),
       |scoped AS (SELECT * FROM toks WHERE len(l) >= $SpanK),
       |sh AS (
       |  SELECT doc_id, i AS pos,
       |    list_aggregate(l[i:i+$SpanK-1], 'string_agg', ' ') AS shingle
       |  FROM scoped, unnest(range(1, len(l) - $SpanK + 2)) r(i)),
       |dup AS (
       |  SELECT shingle FROM sh GROUP BY shingle
       |  HAVING count(DISTINCT doc_id) > 1),
       |ds AS (SELECT sh.* FROM sh JOIN dup USING (shingle)),
       |per AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
       |dper AS (SELECT doc_id, count(*) AS dup_shingles FROM ds GROUP BY 1),
       |cov AS (
       |  SELECT doc_id, count(DISTINCT pos + off) AS covered_tokens
       |  FROM ds, unnest(range(0, $SpanK)) r(off) GROUP BY 1)
       |SELECT s.doc_id, CAST(len(s.l) AS BIGINT) AS n_tokens,
       |  per.n_shingles,
       |  coalesce(dper.dup_shingles, 0) AS dup_shingles,
       |  round(coalesce(dper.dup_shingles, 0) * 1.0 / per.n_shingles, 6)
       |    AS dup_frac,
       |  coalesce(cov.covered_tokens, 0) AS covered_tokens,
       |  round(coalesce(cov.covered_tokens, 0) * 1.0 / len(s.l), 6)
       |    AS covered_frac
       |FROM scoped s
       |JOIN per USING (doc_id)
       |LEFT JOIN dper USING (doc_id)
       |LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // -- q166: exact-substring dedup removal report — the Lee et al. 2022
  //          family (the one standard public dedup mode q130 only
  //          approximates with per-shingle coverage): maximal
  //          cross-document duplicated token EXTENTS per doc
  //          (SpanDedup.extents — inverted-index shingle join, NO
  //          all-pairs; gaps-and-islands extent assembly), thresholded
  //          at MinExtent tokens (the paper cuts ≥50-token substrings;
  //          this corpus's planted spans are shorter), then rolled up
  //          per source: how many docs would be cut, how many extents,
  //          how many tokens removed, and the removal fraction against
  //          the source's total token mass. All-integer inputs → exact
  //          cross-engine; the fractions divide exact bigints.
  private val ExtK = 4
  private val MinExtent = 8

  private def q166(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanDedup
    import graft.text.Repetition
    val d = docs(s, dir)
    val toks = d.select(col("doc_id"), Repetition.tokens(col("text")).as("l"))
    val ext = SpanDedup.extents(toks, ExtK)
      .filter(col("ext_len") >= MinExtent)
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
    val totals = toks
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(size(col("l"))).as("total_tokens"))
    ext.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs_cut"),
        count(lit(1)).as("n_extents"),
        sum(col("ext_len")).as("removed_tokens"),
        max(col("ext_len")).as("max_extent_len"))
      .join(totals, Seq("source"))
      .select(col("source"), col("n_docs_cut"), col("n_extents"),
        col("removed_tokens"), col("max_extent_len"),
        round(col("removed_tokens") * lit(1.0) / col("n_extents"), 6)
          .as("mean_extent_len"),
        col("total_tokens"),
        round(col("removed_tokens") * lit(1.0) / col("total_tokens"), 6)
          .as("removed_frac"))
      .orderBy(col("source"))
  }

  private val q166Sql =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS l
       |  FROM documents),
       |scoped AS (SELECT * FROM toks WHERE len(l) >= $ExtK),
       |sh AS (
       |  SELECT doc_id, i AS pos,
       |    list_aggregate(l[i:i+$ExtK-1], 'string_agg', ' ') AS shingle
       |  FROM scoped, unnest(range(1, len(l) - $ExtK + 2)) r(i)),
       |dup AS (
       |  SELECT shingle FROM sh GROUP BY shingle
       |  HAVING count(DISTINCT doc_id) > 1),
       |cov AS (
       |  SELECT DISTINCT doc_id, pos + off AS tpos
       |  FROM (SELECT sh.* FROM sh JOIN dup USING (shingle)) ds,
       |    unnest(range(0, $ExtK)) r(off)),
       |isl AS (
       |  SELECT doc_id, tpos,
       |    tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos)
       |      AS grp
       |  FROM cov),
       |ext AS (
       |  SELECT doc_id, count(*) AS ext_len
       |  FROM isl GROUP BY doc_id, grp
       |  HAVING count(*) >= $MinExtent),
       |src AS (SELECT doc_id, source FROM documents),
       |tot AS (
       |  SELECT source, CAST(sum(len(l)) AS BIGINT) AS total_tokens
       |  FROM toks JOIN src USING (doc_id) GROUP BY source)
       |SELECT source,
       |  count(DISTINCT doc_id) AS n_docs_cut,
       |  CAST(count(*) AS BIGINT) AS n_extents,
       |  CAST(sum(ext_len) AS BIGINT) AS removed_tokens,
       |  CAST(max(ext_len) AS BIGINT) AS max_extent_len,
       |  round(sum(ext_len) * 1.0 / count(*), 6) AS mean_extent_len,
       |  total_tokens,
       |  round(sum(ext_len) * 1.0 / total_tokens, 6) AS removed_frac
       |FROM ext JOIN src USING (doc_id) JOIN tot USING (source)
       |GROUP BY source, total_tokens
       |ORDER BY source""".stripMargin

  // -- q135: cross-source duplicate-flow matrix — where do the near
  //          duplicates COME FROM? The q28 pair graph joined to each
  //          side's source, aggregated per unordered source pair: the
  //          diagnostic that tells a corpus owner which dumps duplicate
  //          which (same-dump boilerplate vs cross-dump mirroring) and
  //          so which inter-source dedup passes are worth running.
  //          Matrix cells are count + mean estimated Jaccard in integer
  //          signature-match units (est*12 is exact), so the avg is
  //          shuffle-order safe.
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = graft.dedup.DedupIndex.pairs(s, dir)
    val src = d.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("a_id"), col("source").as("src_a")),
        Seq("a_id"))
      .join(src.select(col("doc_id").as("b_id"), col("source").as("src_b")),
        Seq("b_id"))
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"),
        round(col("est_jaccard") * 12).cast("long").as("match12"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("match12")) / 12.0, 6).as("avg_est_jaccard"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  private val q135Sql =
    s"""WITH sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |pairs AS (
       |  SELECT c.a_id, c.b_id,
       |    len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2]))
       |      AS match12
       |  FROM cand c JOIN sig sa ON sa.id = c.a_id JOIN sig sb ON sb.id = c.b_id
       |  WHERE len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2]))
       |    * 1.0 / 12 >= 0.9),
       |lab AS (
       |  SELECT least(da.source, db.source) AS source_lo,
       |    greatest(da.source, db.source) AS source_hi, p.match12
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.a_id
       |  JOIN documents db ON db.doc_id = p.b_id)
       |SELECT source_lo, source_hi, count(*) AS n_pairs,
       |  round(avg(match12) / 12.0, 6) AS avg_est_jaccard
       |FROM lab GROUP BY 1, 2 ORDER BY source_lo, source_hi""".stripMargin

  // -- q142: incremental-append dedup delta — the report a continuously
  //          ingesting corpus produces DAILY: treat the newest 20% of
  //          doc_ids as the arriving batch and dedup it AGAINST the
  //          existing 80% without ever re-pairing the existing corpus
  //          with itself. Exact duplicates by content-key semi-join,
  //          near duplicates by the asymmetric LSH (minhashLshAgainst:
  //          cross-side bucket matches only), then a per-source delta:
  //          how many new docs are exact dups, near dups (non-exact),
  //          net new, and how many net-new tokens actually land. The
  //          cutoff is derived from max(doc_id) in exact integer
  //          arithmetic so both engines split identically at any SF.
  //          Scale shape: one 1-row broadcast (the cutoff), one semi
  //          join on the content key, and a bucket equi-join whose left
  //          side is the batch — cost tracks the batch size, which is
  //          the property that makes daily dedup affordable at 100 TB.
  private def q142(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = d.agg(max(col("doc_id")).as("max_id"))
      .select(expr("(max_id + 1) * 4 div 5").as("cutoff"))
    val dd = d.crossJoin(broadcast(cut))
    val oldD = dd.filter(col("doc_id") < col("cutoff"))
    val newD = dd.filter(col("doc_id") >= col("cutoff"))
    def key(c: org.apache.spark.sql.Column) =
      md5(array_join(array_sort(TF.distinctTokens(c)), " "))
    val exactDup = newD.select(col("doc_id"), key(col("text")).as("k"))
      .join(oldD.select(key(col("text")).as("k")).distinct(), Seq("k"), "left_semi")
      .select(col("doc_id"))
      .withColumn("exact_dup", lit(true))
    val nearDup = Dedup.minhashLshAgainst(newD, oldD, "doc_id", "text",
        k = 12, bands = 2, threshold = 0.9)
      .select(col("new_id").as("doc_id")).distinct()
      .withColumn("near_any", lit(true))
    newD.select(col("doc_id"), col("source"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .withColumn("exact_dup", coalesce(col("exact_dup"), lit(false)))
      .withColumn("near_dup",
        coalesce(col("near_any"), lit(false)) && !col("exact_dup"))
      .withColumn("net_new", !col("exact_dup") && !col("near_dup"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_new"),
        sum(when(col("exact_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("near_dup"), 1L).otherwise(0L)).as("n_near_dup"),
        sum(when(col("net_new"), 1L).otherwise(0L)).as("n_net_new"),
        coalesce(sum(when(col("net_new"), col("n_tok"))), lit(0L))
          .as("net_new_tokens"))
      .orderBy(col("source"))
  }

  private val q142Sql =
    s"""WITH cut AS (SELECT (max(doc_id) + 1) * 4 // 5 AS cutoff FROM documents),
       |ob AS (SELECT d.* FROM documents d, cut WHERE doc_id < cutoff),
       |nb AS (SELECT d.* FROM documents d, cut WHERE doc_id >= cutoff),
       |okeys AS (
       |  SELECT DISTINCT md5(array_to_string(list_sort(list_distinct(
       |    string_split(text, ' '))), ' ')) AS k FROM ob),
       |ex AS (
       |  SELECT doc_id FROM nb
       |  WHERE md5(array_to_string(list_sort(list_distinct(
       |    string_split(text, ' '))), ' ')) IN (SELECT k FROM okeys)),
       |sig_n AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM nb),
       |sig_o AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM ob),
       |band_n AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig_n, range(0, 2) t(b)),
       |band_o AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig_o, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT n.id AS new_id, o.id AS old_id
       |  FROM band_n n JOIN band_o o ON n.bucket = o.bucket),
       |near AS (
       |  SELECT DISTINCT c.new_id AS doc_id
       |  FROM cand c JOIN sig_n sn ON sn.id = c.new_id
       |  JOIN sig_o so ON so.id = c.old_id
       |  WHERE len(list_filter(list_zip(sn.sig, so.sig), z -> z[1] = z[2]))
       |    * 1.0 / 12 >= 0.9),
       |flags AS (
       |  SELECT n.source, ${TF.sql.tokenCount("n.text")} AS n_tok,
       |    (n.doc_id IN (SELECT doc_id FROM ex)) AS exact_dup,
       |    (n.doc_id IN (SELECT doc_id FROM near)
       |      AND n.doc_id NOT IN (SELECT doc_id FROM ex)) AS near_dup
       |  FROM nb n)
       |SELECT source, count(*) AS n_new,
       |  CAST(sum(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact_dup,
       |  CAST(sum(CASE WHEN near_dup THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_near_dup,
       |  CAST(sum(CASE WHEN NOT exact_dup AND NOT near_dup THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_net_new,
       |  CAST(coalesce(sum(CASE WHEN NOT exact_dup AND NOT near_dup
       |    THEN n_tok END), 0) AS BIGINT) AS net_new_tokens
       |FROM flags GROUP BY source ORDER BY source""".stripMargin

  // -- q143: effective dataset size under dedup weighting — the number
  //          that tells a corpus owner what a source is WORTH after
  //          near-dup discounting: each doc contributes n_tok divided by
  //          its q28/q126 cluster size (singletons divide by 1), the
  //          soft-dedup weighting (each duplicate cluster counts once in
  //          expectation) used instead of hard removal when training
  //          wants the distributional mass kept. Contributions are exact
  //          integer MILLI-tokens ((n_tok*1000) div size — documented
  //          quantization, no shuffle-order float summation); the only
  //          float op is one final division per source row. Scale shape:
  //          the pair graph is q28's bucketed LSH, components are the
  //          q126 star contraction, the weighting is a scan + one
  //          cluster-size equi-join back.
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sizes = graft.dedup.DedupIndex.clusters(s, dir)
      .select(col("doc_id"), col("cluster_size"))
    d.select(col("doc_id"), col("source"),
        TF.tokenCount(col("text")).cast("long").as("n_tok"))
      .join(sizes, Seq("doc_id"), "left")
      .withColumn("csize", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("eff_milli", expr("(n_tok * 1000) div csize"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1L, 1L).otherwise(0L)).as("n_clustered"),
        sum(col("n_tok")).as("raw_tokens"),
        sum(col("eff_milli")).as("effective_milli"))
      .withColumn("survival",
        round(col("effective_milli") / 1000.0 / col("raw_tokens"), 6))
      .orderBy(col("source"))
  }

  private val q143Sql =
    s"""WITH RECURSIVE sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT c.a_id, c.b_id,
       |      len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) * 1.0 / 12 AS est
       |    FROM cand c JOIN sig sa ON sa.id = c.a_id JOIN sig sb ON sb.id = c.b_id) x
       |  WHERE est >= 0.9),
       |und AS (
       |  SELECT a_id AS s, b_id AS t FROM pairs
       |  UNION SELECT b_id AS s, a_id AS t FROM pairs),
       |reach AS (
       |  SELECT s, t FROM und
       |  UNION
       |  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s WHERE u.t <> r.s),
       |comp AS (
       |  SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |  FROM reach GROUP BY s),
       |csz AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1),
       |w AS (
       |  SELECT d.source,
       |    CAST(${TF.sql.tokenCount("d.text")} AS BIGINT) AS n_tok,
       |    coalesce(z.cluster_size, 1) AS csize
       |  FROM documents d
       |  LEFT JOIN comp c ON c.doc_id = d.doc_id
       |  LEFT JOIN csz z ON z.cluster_id = c.cluster_id)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_clustered,
       |  CAST(sum(n_tok) AS BIGINT) AS raw_tokens,
       |  CAST(sum((n_tok * 1000) // csize) AS BIGINT) AS effective_milli,
       |  round(sum((n_tok * 1000) // csize) / 1000.0 / sum(n_tok), 6)
       |    AS survival
       |FROM w GROUP BY source ORDER BY source""".stripMargin

  // -- q171: containment dedup report — Broder 1997 asymmetric
  //          containment over the word-shingle inverted index
  //          (Dedup.containmentPairs): pairs where the smaller shingle
  //          set is ≥ 80% inside the larger one, the subset-duplication
  //          mode (quotes, boilerplate, doc-embedded-in-doc) that the
  //          symmetric q28 LSH misses by construction. Both endpoint
  //          sources join in for the per-pair report; hot shingles
  //          (df > 50) are cut before the join so no posting list is
  //          unbounded.
  private val CtN = 8
  private val CtMaxDf = 50
  private val CtTau = 0.8
  private val CtMinSh = 5

  private def q171(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.containmentPairs(d, "doc_id", "text", CtN, CtMaxDf, CtTau, CtMinSh)
      .join(d.select(col("doc_id").as("a_id"), col("source").as("a_source")),
        Seq("a_id"))
      .join(d.select(col("doc_id").as("b_id"), col("source").as("b_source")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"), col("a_source"), col("b_source"),
        col("shared"), col("nsh_a"), col("nsh_b"),
        graft.functions.ExactRound.ratio6(col("shared"),
          least(col("nsh_a"), col("nsh_b"))).as("containment"),
        graft.functions.ExactRound.ratio6(col("shared"),
          col("nsh_a") + col("nsh_b") - col("shared")).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q171Sql = {
    val sh = graft.pipeline.Decontaminate.sql
      .shingleHashes("string_split(text, ' ')", CtN)
    s"""WITH sh AS (
       |  SELECT doc_id, unnest($sh) AS g_id FROM documents),
       |keep AS (SELECT g_id FROM sh GROUP BY g_id
       |         HAVING count(*) <= $CtMaxDf),
       |shp AS (SELECT s.doc_id, s.g_id FROM sh s JOIN keep USING (g_id)),
       |nsh AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh
       |        FROM shp GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM shp a JOIN shp b ON a.g_id = b.g_id AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT p.a_id, p.b_id, p.shared, na.nsh AS nsh_a, nb.nsh AS nsh_b
       |  FROM pairs p
       |  JOIN nsh na ON p.a_id = na.doc_id
       |  JOIN nsh nb ON p.b_id = nb.doc_id
       |  WHERE least(na.nsh, nb.nsh) >= $CtMinSh
       |    AND p.shared * 1.0 / least(na.nsh, nb.nsh) >= $CtTau)
       |SELECT s.a_id, s.b_id, da.source AS a_source, db.source AS b_source,
       |  s.shared, s.nsh_a, s.nsh_b,
       |  ${graft.functions.ExactRound.sql.ratio6("s.shared", "least(s.nsh_a, s.nsh_b)")} AS containment,
       |  ${graft.functions.ExactRound.sql.ratio6("s.shared", "s.nsh_a + s.nsh_b - s.shared")} AS jaccard
       |FROM scored s
       |JOIN documents da ON s.a_id = da.doc_id
       |JOIN documents db ON s.b_id = db.doc_id
       |ORDER BY s.a_id, s.b_id""".stripMargin
  }

  // -- q176: MinHash estimator fidelity — the calibration report that
  //          justifies q28's (k, bands, τ) choice: for every candidate
  //          pair at est ≥ 0.5 under the q28 banding, the exact
  //          token-set Jaccard is computed and bucketed by the
  //          matching-slot count m (est = m/12), reporting pair
  //          volume, mean exact Jaccard, and how often the sketch
  //          over-/under-estimates. The standard LSH verify pass:
  //          candidacy is IDENTICAL to q28 (banding unchanged — no new
  //          pair space), the token-array join touches only surviving
  //          candidates (output-bounded), and the report is bounded at
  //          k+1 rows. Over/under is the EXACT fraction compare
  //          m·u vs 12·i — no float thresholds; means are
  //          micro-quantized integer sums (ExactRound).
  //          Calibration runs on a DETERMINISTIC 1-in-4 pair sample
  //          ((31·a_id + b_id) mod 4 — pure integer arithmetic, free
  //          and reproducible cross-engine; measured vs an md5 pair
  //          key, which cost ~3 s on the 3.5M-pair stream for no
  //          statistical gain here): a fidelity curve is a statistic,
  //          not an audit, so the exact-scoring join only pays for the
  //          sample — at corpus scale, dial the same knob harder
  //          instead of scoring every candidate pair.
  private def q176(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    // the index floor IS this query's threshold (0.5), so the
    // calibration stream reads the materialized frame unfiltered
    val pairs = graft.dedup.DedupIndex.candidatePairs(s, dir)
      .filter((col("a_id") * 31 + col("b_id")) % 4 === 0L)
    val ts = d.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ts"))
    pairs
      .join(ts.select(col("doc_id").as("a_id"), col("ts").as("a_ts")), "a_id")
      .join(ts.select(col("doc_id").as("b_id"), col("ts").as("b_ts")), "b_id")
      .select(round(col("est_jaccard") * 12, 0).cast("long").as("m"),
        TF.setOverlap(col("a_ts"), col("b_ts")).as("i"),
        (size(col("a_ts")) + size(col("b_ts"))).cast("long").as("ab"))
      .select(col("m"), col("i"), (col("ab") - col("i")).as("u"))
      .select(col("m"),
        when(col("u") === 0L, lit(1000000L))
          .otherwise(ExactRound.micro6(col("i"), col("u"))).as("ex"),
        when(col("m") * col("u") > lit(12L) * col("i"), 1L).otherwise(0L)
          .as("ov"),
        when(col("m") * col("u") < lit(12L) * col("i"), 1L).otherwise(0L)
          .as("un"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ex")).as("exs"), sum(col("ov")).as("n_over"),
        sum(col("un")).as("n_under"))
      .select(col("m"), col("n_pairs"),
        ExactRound.ratio6(col("m"), lit(12L)).as("est_jaccard"),
        ExactRound.microMean6(col("exs"), col("n_pairs")).as("mean_exact"),
        col("n_over"), col("n_under"))
      .orderBy(col("m"))
  }

  private val q176Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |est AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2]))
       |      AS BIGINT) AS m
       |  FROM cand c JOIN sig sa ON sa.id = c.a_id
       |  JOIN sig sb ON sb.id = c.b_id),
       |keep AS (
       |  SELECT * FROM est
       |  WHERE m >= 6 AND (31 * a_id + b_id) % 4 = 0),
       |ts AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
       |  FROM documents),
       |iu AS (
       |  SELECT k.m,
       |    CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x)))
       |      AS BIGINT) AS i,
       |    CAST(len(a.ts) + len(b.ts) AS BIGINT) AS ab
       |  FROM keep k JOIN ts a ON a.doc_id = k.a_id
       |  JOIN ts b ON b.doc_id = k.b_id),
       |px AS (SELECT m, i, ab - i AS u FROM iu),
       |pm AS (
       |  SELECT m,
       |    CASE WHEN u = 0 THEN 1000000
       |      ELSE ${ER.sql.micro6("i", "u")} END AS ex,
       |    CASE WHEN m * u > 12 * i THEN 1 ELSE 0 END AS ov,
       |    CASE WHEN m * u < 12 * i THEN 1 ELSE 0 END AS un
       |  FROM px)
       |SELECT m, CAST(count(*) AS BIGINT) AS n_pairs,
       |  ${ER.sql.ratio6("m", "12")} AS est_jaccard,
       |  ${ER.sql.microMean6("sum(ex)", "count(*)")} AS mean_exact,
       |  CAST(sum(ov) AS BIGINT) AS n_over,
       |  CAST(sum(un) AS BIGINT) AS n_under
       |FROM pm GROUP BY m ORDER BY m""".stripMargin
  }

  // -- q183: near-dup edit-distance audit — the character-level ground
  //          truth behind the q28 pair graph: Levenshtein distance on a
  //          deterministic 1-in-64 pair sample, over a fixed 160-char
  //          document prefix. MinHash estimates TOKEN-SET overlap; two
  //          docs can share a vocabulary yet read differently, so the
  //          audit reports, per source, how character-close the flagged
  //          pairs really are (mean/max edit distance + mean normalized
  //          similarity). Levenshtein is O(len²) PER PAIR — the prefix
  //          cap and the pair sample are what make the audit affordable
  //          at any scale (documented knobs: cells = pairs/64 · 160²,
  //          independent of full document length); distances are exact
  //          integers, the normalized similarity is an ExactRound
  //          integer ratio.
  private val EdCap = 160

  private def q183(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    val pairs = graft.dedup.DedupIndex.pairs(s, dir)
      .filter((col("a_id") * 31 + col("b_id")) % 64 === 0L)
    val tx = d.select(col("doc_id"),
      substring(col("text"), 1, EdCap).as("tx"), col("source"))
    pairs
      .join(tx.select(col("doc_id").as("a_id"), col("tx").as("a_tx"),
        col("source").as("source")), "a_id")
      .join(tx.select(col("doc_id").as("b_id"), col("tx").as("b_tx")),
        "b_id")
      .select(col("source"),
        levenshtein(col("a_tx"), col("b_tx")).cast("long").as("d"),
        greatest(length(col("a_tx")), length(col("b_tx"))).cast("long")
          .as("ml"))
      .select(col("source"), col("d"),
        when(col("ml") === 0L, lit(1000000L))
          .otherwise(ExactRound.micro6(col("ml") - col("d"), col("ml")))
          .as("sim_m"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("d")).as("ds"),
        max(col("d")).as("max_edit"), sum(col("sim_m")).as("sims"))
      .select(col("source"), col("n_pairs"),
        ExactRound.ratio6(col("ds"), col("n_pairs")).as("mean_edit"),
        col("max_edit"),
        ExactRound.microMean6(col("sims"), col("n_pairs")).as("mean_sim"))
      .orderBy(col("source"))
  }

  private val q183Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |pairs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT c.a_id, c.b_id,
       |      len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2]))
       |        * 1.0 / 12 AS est
       |    FROM cand c JOIN sig sa ON sa.id = c.a_id
       |    JOIN sig sb ON sb.id = c.b_id) x
       |  WHERE est >= 0.9 AND (31 * a_id + b_id) % 64 = 0),
       |tx AS (
       |  SELECT doc_id, substr(text, 1, $EdCap) AS tx, source
       |  FROM documents),
       |ed AS (
       |  SELECT a.source,
       |    CAST(levenshtein(a.tx, b.tx) AS BIGINT) AS d,
       |    CAST(greatest(length(a.tx), length(b.tx)) AS BIGINT) AS ml
       |  FROM pairs p
       |  JOIN tx a ON p.a_id = a.doc_id
       |  JOIN tx b ON p.b_id = b.doc_id),
       |em AS (
       |  SELECT source, d,
       |    CASE WHEN ml = 0 THEN 1000000
       |      ELSE ${ER.sql.micro6("ml - d", "ml")} END AS sim_m
       |  FROM ed)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
       |  ${ER.sql.ratio6("sum(d)", "count(*)")} AS mean_edit,
       |  CAST(max(d) AS BIGINT) AS max_edit,
       |  ${ER.sql.microMean6("sum(sim_m)", "count(*)")} AS mean_sim
       |FROM em GROUP BY source ORDER BY source""".stripMargin
  }

  // -- q185: cross-split substring leakage — the q132 doc-level split
  //          audit pushed down to exact-substring grain (the Lee et
  //          al. 2022 extent machinery of q166, asymmetric): maximal
  //          token extents in VAL/TEST docs that are covered by
  //          4-shingles also present anywhere in the TRAIN split, at
  //          ≥ 8 tokens. A val doc sharing a long verbatim span with
  //          training text inflates eval scores even when no whole
  //          document leaked (q132 clean) and no n-gram RATE looks
  //          alarming (q180 reports rates, not extents). Per-split
  //          report: leaky docs, extents, leaked tokens, leak
  //          fraction. Scale shape: train side reduced to a DISTINCT
  //          shingle-type set before the one inverted-index join
  //          (vocabulary-bounded); eval never pairs with eval;
  //          gaps-and-islands per eval doc. Exact integers throughout.
  private val SlWeights = Seq("train" -> 8, "val" -> 1, "test" -> 1)

  private def q185(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanDedup
    import graft.functions.ExactRound
    import graft.pipeline.Sampling
    import graft.text.Repetition
    val base = docs(s, dir).select(col("doc_id"),
      Repetition.tokens(col("text")).as("l"),
      Sampling.splitColumn(col("doc_id"), SlWeights).as("split"))
    val scoped = base.filter(size(col("l")) >= ExtK)
    val ext = SpanDedup.extentsAgainst(
        scoped.filter(col("split") =!= "train")
          .select(col("doc_id"), col("l")),
        scoped.filter(col("split") === "train")
          .select(col("doc_id"), col("l")), ExtK)
      .filter(col("ext_len") >= MinExtent)
      .join(base.select(col("doc_id"), col("split")), Seq("doc_id"))
    base.filter(col("split") =!= "train")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("l")).cast("long")).as("total_tokens"))
      .join(ext.groupBy(col("split"))
        .agg(countDistinct(col("doc_id")).as("n_docs_leaky"),
          count(lit(1)).as("n_extents"),
          sum(col("ext_len")).as("leaked_tokens")), Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("total_tokens"),
        coalesce(col("n_docs_leaky"), lit(0L)).as("n_docs_leaky"),
        coalesce(col("n_extents"), lit(0L)).as("n_extents"),
        coalesce(col("leaked_tokens"), lit(0L)).as("leaked_tokens"),
        ExactRound.ratio6(coalesce(col("leaked_tokens"), lit(0L)),
          col("total_tokens")).as("leak_frac"))
      .orderBy(col("split"))
  }

  private val q185Sql = {
    import graft.pipeline.Sampling
    val h = Sampling.sql.hashBucket("doc_id", 10)
    s"""WITH ltoks AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS l,
       |    CASE WHEN $h < 8 THEN 'train' WHEN $h < 9 THEN 'val'
       |      ELSE 'test' END AS split
       |  FROM documents),
       |lscoped AS (SELECT * FROM ltoks WHERE len(l) >= $ExtK),
       |lsh AS (
       |  SELECT doc_id, split, i AS pos,
       |    list_aggregate(l[i:i+${ExtK - 1}], 'string_agg', ' ') AS shingle
       |  FROM lscoped, unnest(range(1, len(l) - $ExtK + 2)) r(i)),
       |ltsh AS (SELECT DISTINCT shingle FROM lsh WHERE split = 'train'),
       |lcov AS (
       |  SELECT DISTINCT doc_id, split, pos + off AS tpos
       |  FROM (SELECT s.* FROM lsh s JOIN ltsh USING (shingle)
       |        WHERE s.split <> 'train') ds,
       |    unnest(range(0, $ExtK)) r(off)),
       |lisl AS (
       |  SELECT doc_id, split, tpos,
       |    tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos)
       |      AS grp
       |  FROM lcov),
       |lext AS (
       |  SELECT doc_id, split, count(*) AS ext_len
       |  FROM lisl GROUP BY doc_id, split, grp
       |  HAVING count(*) >= $MinExtent),
       |ltot AS (
       |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(l)) AS BIGINT) AS total_tokens
       |  FROM ltoks WHERE split <> 'train' GROUP BY 1)
       |SELECT t.split, t.n_docs, t.total_tokens,
       |  CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_docs_leaky,
       |  CAST(count(e.ext_len) AS BIGINT) AS n_extents,
       |  CAST(COALESCE(sum(e.ext_len), 0) AS BIGINT) AS leaked_tokens,
       |  ${graft.functions.ExactRound.sql.ratio6(
          "COALESCE(sum(e.ext_len), 0)", "t.total_tokens")} AS leak_frac
       |FROM ltot t LEFT JOIN lext e USING (split)
       |GROUP BY t.split, t.n_docs, t.total_tokens
       |ORDER BY t.split""".stripMargin
  }

  // -- q186: dedup cluster-size histogram — the datasheet distribution
  //          over the q126 connected components: for each cluster size
  //          (including the singleton mass — docs in no near-dup pair),
  //          how many clusters, docs, and tokens sit there, and what
  //          fraction of corpus tokens that size class holds. The
  //          shape every dedup writeup publishes (how much of the
  //          corpus is 2-dup vs mega-cluster boilerplate) and the
  //          input to choosing q143's effective-token discount. Scale
  //          shape: CC is the two-phase star contraction; the rollup
  //          is one aggregate keyed by a size that has at most
  //          O(distinct sizes) values; the singleton leg is one
  //          anti-join. Exact integer counts; fractions are ExactRound
  //          ratios of bigint token sums.
  private def q186(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    val withTok = d.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("n_tok"))
    // cluster labels come off the materialized index (DedupIndex) —
    // the round-8 text-free CC rebuild is obsolete now that the
    // canonicalization table is built once per session
    val cc = graft.dedup.DedupIndex.clusters(s, dir)
      .select(col("doc_id"), col("cluster_id"))
    val sizes = cc.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val clustered = cc.join(sizes, Seq("cluster_id"))
      .join(withTok, Seq("doc_id"))
      .groupBy(col("cluster_size"))
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val single = withTok.join(cc.select(col("doc_id")), Seq("doc_id"),
        "left_anti")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
      .select(lit(1L).as("cluster_size"), col("n_docs").as("n_clusters"),
        col("n_docs"), col("n_tokens"))
    val W = org.apache.spark.sql.expressions.Window
    val allW = W.orderBy(col("cluster_size"))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    clustered.unionByName(single)
      .withColumn("tok_tot", sum(col("n_tokens")).over(allW))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        col("n_tokens"),
        ExactRound.ratio6(col("n_tokens"), col("tok_tot")).as("token_share"))
      .orderBy(col("cluster_size"))
  }

  private val q186Sql =
    s"""WITH RECURSIVE $componentCtes,
       |wt AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
       |    AS n_tok
       |  FROM documents),
       |csz AS (
       |  SELECT c.doc_id, c.cluster_id,
       |    count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
       |  FROM comp c),
       |cl AS (
       |  SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |    CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(w.n_tok) AS BIGINT) AS n_tokens
       |  FROM csz JOIN wt w USING (doc_id)
       |  GROUP BY 1),
       |sg AS (
       |  SELECT CAST(1 AS BIGINT) AS cluster_size,
       |    CAST(count(*) AS BIGINT) AS n_clusters,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS n_tokens
       |  FROM wt WHERE doc_id NOT IN (SELECT doc_id FROM comp)),
       |u AS (SELECT * FROM cl UNION ALL SELECT * FROM sg),
       |t AS (
       |  SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS tok_tot
       |  FROM u)
       |SELECT cluster_size, n_clusters, n_docs, n_tokens,
       |  ${graft.functions.ExactRound.sql.ratio6("n_tokens", "tok_tot")}
       |    AS token_share
       |FROM t ORDER BY cluster_size""".stripMargin

  // -- q187: incremental exact-substring dedup — q166's daily-ingest
  //          twin (completing the incremental trio: q142 exact/LSH,
  //          q172 semantic, q187 substring): the newest 20% of doc_ids
  //          arrive as the batch and their duplicated extents are
  //          computed ONLY against shingles of the existing 80%
  //          (SpanDedup.extentsAgainst — the corpus shingle-type set is
  //          the reusable, cacheable index artifact; the corpus never
  //          re-pairs with itself). Per-source report over the batch:
  //          docs cut, extents, tokens removed, removal fraction of
  //          batch token mass. Exact integers throughout.
  private def q187(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.SpanDedup
    import graft.functions.ExactRound
    import graft.text.Repetition
    val d = docs(s, dir)
    val cut = d.agg(max(col("doc_id")).as("max_id"))
      .select(expr("(max_id + 1) * 4 div 5").as("cutoff"))
    val base = d.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("source"),
        Repetition.tokens(col("text")).as("l"),
        (col("doc_id") >= col("cutoff")).as("is_new"))
    val scoped = base.filter(size(col("l")) >= ExtK)
    val ext = SpanDedup.extentsAgainst(
        scoped.filter(col("is_new")).select(col("doc_id"), col("l")),
        scoped.filter(!col("is_new")).select(col("doc_id"), col("l")),
        ExtK)
      .filter(col("ext_len") >= MinExtent)
      .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
    base.filter(col("is_new"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_batch_docs"),
        sum(size(col("l")).cast("long")).as("batch_tokens"))
      .join(ext.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs_cut"),
          count(lit(1)).as("n_extents"),
          sum(col("ext_len")).as("removed_tokens")), Seq("source"), "left")
      .select(col("source"), col("n_batch_docs"), col("batch_tokens"),
        coalesce(col("n_docs_cut"), lit(0L)).as("n_docs_cut"),
        coalesce(col("n_extents"), lit(0L)).as("n_extents"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"),
        ExactRound.ratio6(coalesce(col("removed_tokens"), lit(0L)),
          col("batch_tokens")).as("removed_frac"))
      .orderBy(col("source"))
  }

  private val q187Sql =
    s"""WITH cut AS (
       |  SELECT (max(doc_id) + 1) * 4 // 5 AS cutoff FROM documents),
       |btoks AS (
       |  SELECT doc_id, source,
       |    list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS l,
       |    doc_id >= cutoff AS is_new
       |  FROM documents, cut),
       |bscoped AS (SELECT * FROM btoks WHERE len(l) >= $ExtK),
       |bsh AS (
       |  SELECT doc_id, is_new, i AS pos,
       |    list_aggregate(l[i:i+${ExtK - 1}], 'string_agg', ' ') AS shingle
       |  FROM bscoped, unnest(range(1, len(l) - $ExtK + 2)) r(i)),
       |bosh AS (SELECT DISTINCT shingle FROM bsh WHERE NOT is_new),
       |bcov AS (
       |  SELECT DISTINCT doc_id, pos + off AS tpos
       |  FROM (SELECT s.* FROM bsh s JOIN bosh USING (shingle)
       |        WHERE s.is_new) ds,
       |    unnest(range(0, $ExtK)) r(off)),
       |bisl AS (
       |  SELECT doc_id, tpos,
       |    tpos - row_number() OVER (PARTITION BY doc_id ORDER BY tpos)
       |      AS grp
       |  FROM bcov),
       |bext AS (
       |  SELECT doc_id, count(*) AS ext_len
       |  FROM bisl GROUP BY doc_id, grp
       |  HAVING count(*) >= $MinExtent),
       |bexts AS (
       |  SELECT d.source,
       |    CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_docs_cut,
       |    CAST(count(*) AS BIGINT) AS n_extents,
       |    CAST(sum(e.ext_len) AS BIGINT) AS removed_tokens
       |  FROM bext e JOIN documents d USING (doc_id)
       |  GROUP BY 1),
       |btot AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_batch_docs,
       |    CAST(sum(len(l)) AS BIGINT) AS batch_tokens
       |  FROM btoks WHERE is_new GROUP BY 1)
       |SELECT t.source, t.n_batch_docs, t.batch_tokens,
       |  COALESCE(x.n_docs_cut, 0) AS n_docs_cut,
       |  COALESCE(x.n_extents, 0) AS n_extents,
       |  COALESCE(x.removed_tokens, 0) AS removed_tokens,
       |  ${graft.functions.ExactRound.sql.ratio6(
          "COALESCE(x.removed_tokens, 0)", "t.batch_tokens")}
       |    AS removed_frac
       |FROM btot t LEFT JOIN bexts x USING (source)
       |ORDER BY t.source""".stripMargin

  // -- q197: URL canonicalization + URL-level dedup — the cheapest
  //          dedup tier a web-corpus pipeline runs BEFORE any content
  //          hashing (Common-Crawl practice: normalize, then collapse
  //          fetch variants of the same page). The corpus tables carry
  //          no URL column, so each doc derives a deterministic synthetic
  //          URL exercising the variant classes the normalizer must
  //          collapse: host case, tracking (utm_*) params, trailing
  //          slash, #fragments. Normalization = lowercase + strip
  //          fragment + strip utm params + strip trailing slash — pure
  //          scan-local regexp chains, identical RE syntax on both
  //          engines. Dedup = one groupBy on the canonical URL; report
  //          every collapsed group (n > 1) with its canonical doc.
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://"),
      when(col("doc_id") % 4 === 1, upper(col("source"))).otherwise(col("source")),
      lit(".example.com/page/"),
      (floor(col("doc_id") / lit(20.0)) % 7).cast("string"),
      when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=feed&utm_medium=rss&id="),
            (floor(col("doc_id") / lit(20.0)) % 7).cast("string")))
        .when(col("doc_id") % 3 === 1, lit("/"))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("#section-2")).otherwise(lit("")))
    val norm =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), "#.*$", ""),
            "utm_[^&]*&?", ""),
          "[?&]$", ""),
        "/$", "")
    docs(s, dir)
      .select(col("doc_id"), col("source"), norm.as("url_norm"))
      .groupBy(col("url_norm"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") > 1)
      .orderBy(col("url_norm"))
  }

  private val q197Sql =
    """WITH u AS (
      |  SELECT doc_id, source,
      |    'https://' ||
      |    CASE WHEN doc_id % 4 = 1 THEN upper(source) ELSE source END ||
      |    '.example.com/page/' ||
      |      (CAST(floor(doc_id / 20.0) AS BIGINT) % 7) ||
      |    CASE WHEN doc_id % 3 = 0
      |      THEN '?utm_source=feed&utm_medium=rss&id=' ||
      |        (CAST(floor(doc_id / 20.0) AS BIGINT) % 7)
      |      WHEN doc_id % 3 = 1 THEN '/'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
      |  FROM documents),
      |n AS (
      |  -- DuckDB regexp_replace is first-match by default (Spark's is
      |  -- global): the 'g' option makes the two engines agree on the
      |  -- multi-param utm strip
      |  SELECT doc_id, source,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(lower(url), '#.*$', '', 'g'),
      |        'utm_[^&]*&?', '', 'g'),
      |      '[?&]$', '', 'g'),
      |    '/$', '', 'g') AS url_norm
      |  FROM u)
      |SELECT url_norm, count(*) AS n_docs, min(doc_id) AS canonical_doc,
      |  count(DISTINCT source) AS n_sources
      |FROM n GROUP BY url_norm HAVING count(*) > 1
      |ORDER BY url_norm""".stripMargin

  // -- q201: content-defined chunk dedup — the block-level dedup tier
  //          (LBFS/rsync heritage) over Cdc.chunks' hash-boundary
  //          chunking: every chunk (>= CdcMinLen chars, so residual
  //          2-3-char tails don't collide) fingerprinted and grouped by
  //          content hash; report every chunk shared across occurrences
  //          with its spread. Catches SHARED PASSAGES between documents
  //          that document-level MinHash scores as globally dissimilar.
  //          Scale shape: one scan-local codegen pass per doc (cuts +
  //          md5), a ~len/64 chunk fan-out, ONE chunk_hash-keyed
  //          aggregate — no pairwise anything; the chunk-hash frame is
  //          the reusable incremental index (join a new batch's chunks
  //          against it, q142-style).
  private val CdcMinLen = 20

  private def q201(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Cdc.chunks(docs(s, dir), "doc_id", "text")
      .filter(col("chunk_len") >= CdcMinLen)
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("chunk_len")).as("chunk_len"),
        min(col("doc_id")).as("canonical_doc"))
      .filter(col("n_occ") > 1)
      .orderBy(col("chunk_hash"))

  private val q201Sql =
    s"""WITH ${graft.dedup.Cdc.sql.chunksCtes}
       |SELECT chunk_hash, count(*) AS n_occ,
       |  count(DISTINCT doc_id) AS n_docs,
       |  min(chunk_len) AS chunk_len, min(doc_id) AS canonical_doc
       |FROM chunks WHERE chunk_len >= $CdcMinLen
       |GROUP BY chunk_hash HAVING count(*) > 1
       |ORDER BY chunk_hash""".stripMargin

  // -- q202: incremental CDC chunk dedup — q201's daily-ingest twin,
  //          completing the incremental quartet (q142 exact/LSH, q172
  //          semantic, q187 substring, q202 block-level): the newest
  //          20% of doc_ids arrive as the batch; their chunks are
  //          tested ONLY against the distinct chunk-hash set of the
  //          existing 80% (the reusable index artifact — the corpus
  //          never re-chunks or self-pairs). Per-source batch report:
  //          chunk count/bytes, duplicated-against-corpus chunk
  //          count/bytes, duplicated fraction (exact integer rounding).
  //          Scale shape: one chunking pass over the batch, one
  //          semi-join against the hash index, one keyed rollup.
  private def q202(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    val cut = d.agg(max(col("doc_id")).as("max_id"))
      .select(expr("(max_id + 1) * 4 div 5").as("cutoff"))
    val ch = graft.dedup.Cdc.chunks(d, "doc_id", "text")
      .filter(col("chunk_len") >= CdcMinLen)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .crossJoin(broadcast(cut))
      .withColumn("is_new", col("doc_id") >= col("cutoff"))
    val corpusIdx = ch.filter(!col("is_new"))
      .select(col("chunk_hash")).distinct()
    ch.filter(col("is_new"))
      .join(corpusIdx.withColumn("dup", lit(true)), Seq("chunk_hash"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len").cast("long")).as("chunk_bytes"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("dup"), col("chunk_len").cast("long")).otherwise(0L))
          .as("dup_bytes"))
      .withColumn("dup_frac",
        ExactRound.ratio6(col("dup_bytes"), col("chunk_bytes")))
      .orderBy(col("source"))
  }

  private val q202Sql =
    s"""WITH ${graft.dedup.Cdc.sql.chunksCtes},
       |cut AS (SELECT (max(doc_id) + 1) * 4 // 5 AS cutoff FROM documents),
       |ch AS (
       |  SELECT c.doc_id, d.source, c.chunk_len, c.chunk_hash,
       |    c.doc_id >= cutoff AS is_new
       |  FROM chunks c JOIN documents d USING (doc_id), cut
       |  WHERE c.chunk_len >= $CdcMinLen),
       |idx AS (SELECT DISTINCT chunk_hash FROM ch WHERE NOT is_new),
       |b AS (
       |  SELECT source, chunk_len,
       |    chunk_hash IN (SELECT chunk_hash FROM idx) AS dup
       |  FROM ch WHERE is_new),
       |agg AS (
       |  SELECT source, count(*) AS n_chunks,
       |    CAST(sum(chunk_len) AS BIGINT) AS chunk_bytes,
       |    CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup_chunks,
       |    CAST(sum(CASE WHEN dup THEN chunk_len ELSE 0 END) AS BIGINT)
       |      AS dup_bytes
       |  FROM b GROUP BY source)
       |SELECT source, n_chunks, chunk_bytes, n_dup_chunks, dup_bytes,
       |  ${graft.functions.ExactRound.sql.ratio6("dup_bytes", "chunk_bytes")}
       |    AS dup_frac
       |FROM agg ORDER BY source""".stripMargin

  // -- q208: CDC source-flow matrix — which source PAIRS share
  //          verbatim passages, at chunk grain (the block-level
  //          counterpart of q135's document-level duplicate-flow
  //          matrix): for every chunk hash present in ≥2 sources, one
  //          row per unordered source pair with shared chunk count and
  //          bytes. Scale shape: the per-hash frame collapses to
  //          DISTINCT (hash, source) first — pair fan-out is bounded
  //          by #sources² per hash, never by occurrences — then one
  //          keyed rollup over ≤ sources² rows.
  private def q208(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val hs = graft.dedup.Cdc.chunks(d, "doc_id", "text")
      .filter(col("chunk_len") >= CdcMinLen)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select(col("chunk_hash"), col("source"), col("chunk_len"))
      .distinct()
    hs.select(col("chunk_hash"), col("source").as("src_a"), col("chunk_len"))
      .join(hs.select(col("chunk_hash"), col("source").as("src_b")),
        "chunk_hash")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_chunks"),
        sum(col("chunk_len").cast("long")).as("shared_bytes"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q208Sql =
    s"""WITH ${graft.dedup.Cdc.sql.chunksCtes},
       |hs AS (
       |  SELECT DISTINCT c.chunk_hash, d.source, c.chunk_len
       |  FROM chunks c JOIN documents d USING (doc_id)
       |  WHERE c.chunk_len >= $CdcMinLen)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  count(*) AS n_shared_chunks,
       |  CAST(sum(a.chunk_len) AS BIGINT) AS shared_bytes
       |FROM hs a JOIN hs b
       |  ON a.chunk_hash = b.chunk_hash AND a.source < b.source
       |GROUP BY 1, 2
       |ORDER BY src_a, src_b""".stripMargin

  // -- q220: LSH band-parameter planner — the analytic s-curve audit
  //          behind q28's (k=12, b=2, r=6) choice: for every band split
  //          of the 12-hash signature, the detection probability
  //          P(s) = 1 − (1 − s^r)^b over a similarity grid, summarized
  //          as the 50% crossover threshold and the detect rates at
  //          s = 0.3/0.5/0.7/0.9 (Leskovec–Rajaraman–Ullman, MMDS
  //          ch. 3 — the standard planning table; q176 then MEASURES
  //          the same curve empirically on this corpus). Determinism:
  //          no pow() — s^r and (·)^b are left-assoc multiplication
  //          chains generated identically for both engines, so every
  //          probability is the same IEEE double; the crossover
  //          compares those identical doubles. Scale shape: data-free
  //          (6 configs × 99 grid points) — a planning constant, not a
  //          corpus scan.
  private val LshK = 12
  private val LshSplits = Seq(1, 2, 3, 4, 6, 12).map(b => (b, LshK / b))

  private def q220(s: SparkSession, dir: String): DataFrame = {
    def pow(c: Column, n: Int): Column = (2 to n).foldLeft(c)((a, _) => a * c)
    val legs = LshSplits.map { case (b, r) =>
      val sv = col("i").cast("double") / lit(100.0)
      val p = lit(1.0) - pow(lit(1.0) - pow(sv, r), b)
      s.range(1, 100).toDF("i")
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("i"), p.as("p"))
    }
    legs.reduce(_ unionByName _)
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(
        (min(when(col("p") >= 0.5, col("i"))).cast("double") / lit(100.0))
          .as("s_half"),
        max(when(col("i") === 30, col("p"))).as("p_at_30"),
        max(when(col("i") === 50, col("p"))).as("p_at_50"),
        max(when(col("i") === 70, col("p"))).as("p_at_70"),
        max(when(col("i") === 90, col("p"))).as("p_at_90"))
      .orderBy(col("bands"))
  }

  private val q220Sql = {
    def powSql(e: String, n: Int) = Seq.fill(n)(e).mkString(" * ")
    val legs = LshSplits.map { case (b, r) =>
      val p = s"1.0 - ${powSql(s"(1.0 - ${powSql("s", r)})", b)}"
      s"SELECT $b AS bands, $r AS rows_per_band, i, $p AS p FROM grid"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH grid AS (
       |  SELECT CAST(i AS DOUBLE) / 100.0 AS s, i
       |  FROM unnest(range(1, 100)) r(i)),
       |curve AS (
       |  $legs)
       |SELECT bands, rows_per_band,
       |  CAST(min(CASE WHEN p >= 0.5 THEN i END) AS DOUBLE) / 100.0
       |    AS s_half,
       |  max(CASE WHEN i = 30 THEN p END) AS p_at_30,
       |  max(CASE WHEN i = 50 THEN p END) AS p_at_50,
       |  max(CASE WHEN i = 70 THEN p END) AS p_at_70,
       |  max(CASE WHEN i = 90 THEN p END) AS p_at_90
       |FROM curve GROUP BY 1, 2 ORDER BY bands""".stripMargin
  }

  // -- q226: cluster cohesion audit — per q126 near-dup cluster, the
  //          TRUE word-set Jaccard of its LSH edges: weakest link, mean
  //          link, edge density, and a 'chained' flag when the weakest
  //          true similarity falls under 0.5 — the transitive-closure
  //          failure mode where A~B~C chains glue genuinely-different
  //          docs into one cluster through a bridge doc. q176 grades
  //          the ESTIMATOR globally; this grades each CLUSTER the
  //          canonicalization will collapse. Scale shape: exact sims
  //          only on the LSH-surviving pairs (output-bounded, q176's
  //          argument), cluster labels join on a_id, one keyed rollup.
  private def q226(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val d = docs(s, dir)
    val pairs = graft.dedup.DedupIndex.pairs(s, dir)
    val cc = graft.dedup.DedupIndex.clusters(s, dir)
    val ts = d.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ts"))
    val sim = pairs
      .join(ts.select(col("doc_id").as("a_id"), col("ts").as("a_ts")), "a_id")
      .join(ts.select(col("doc_id").as("b_id"), col("ts").as("b_ts")), "b_id")
      .select(col("a_id"),
        TF.setOverlap(col("a_ts"), col("b_ts")).as("i"),
        (size(col("a_ts")) + size(col("b_ts"))).cast("long").as("ab"))
      .select(col("a_id"), col("i"), (col("ab") - col("i")).as("u"))
      .select(col("a_id"),
        when(col("u") === 0L, lit(1000000L))
          .otherwise(ExactRound.micro6(col("i"), col("u"))).as("sim6"))
    sim
      .join(cc.select(col("doc_id").as("a_id"), col("cluster_id"),
        col("cluster_size")), "a_id")
      .groupBy(col("cluster_id"))
      .agg(max(col("cluster_size")).as("cluster_size"),
        count(lit(1)).as("n_edges"),
        min(col("sim6")).as("mn6"), sum(col("sim6")).as("sm6"))
      .select(col("cluster_id"), col("cluster_size"), col("n_edges"),
        (col("mn6") / lit(1e6)).as("weakest_link"),
        ExactRound.microMean6(col("sm6"), col("n_edges")).as("mean_link"),
        ExactRound.ratio6(col("n_edges") * lit(2L),
          col("cluster_size") * (col("cluster_size") - lit(1L)))
          .as("density"),
        (col("mn6") < lit(500000L)).as("chained"))
      .orderBy(col("cluster_id"))
  }

  private val q226Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH RECURSIVE $componentCtes,
       |tsx AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
       |  FROM documents),
       |iu AS (
       |  SELECT p.a_id,
       |    CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x)))
       |      AS BIGINT) AS i,
       |    CAST(len(a.ts) + len(b.ts) AS BIGINT) AS ab
       |  FROM pairs p JOIN tsx a ON a.doc_id = p.a_id
       |  JOIN tsx b ON b.doc_id = p.b_id),
       |ex AS (
       |  SELECT a_id,
       |    CASE WHEN ab - i = 0 THEN 1000000
       |      ELSE ${ER.sql.micro6("i", "ab - i")} END AS sim6
       |  FROM iu),
       |sz AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY 1),
       |lab AS (
       |  SELECT c.doc_id, c.cluster_id, s.cluster_size
       |  FROM comp c JOIN sz s USING (cluster_id)),
       |agg AS (
       |  SELECT l.cluster_id, max(l.cluster_size) AS cluster_size,
       |    CAST(count(*) AS BIGINT) AS n_edges,
       |    min(e.sim6) AS mn6, CAST(sum(e.sim6) AS BIGINT) AS sm6
       |  FROM ex e JOIN lab l ON l.doc_id = e.a_id
       |  GROUP BY 1)
       |SELECT cluster_id, cluster_size, n_edges,
       |  mn6 / 1e6 AS weakest_link,
       |  ${ER.sql.microMean6("sm6", "n_edges")} AS mean_link,
       |  ${ER.sql.ratio6("n_edges * 2", "cluster_size * (cluster_size - 1)")}
       |    AS density,
       |  mn6 < 500000 AS chained
       |FROM agg ORDER BY cluster_id""".stripMargin
  }

  // -- q228: normalized-text exact dedup — the standard FIRST dedup
  //          stage of a web pipeline: lowercase, strip non-alphanumerics,
  //          collapse whitespace, hash. Catches case/punctuation/
  //          spacing mutants that q27's token-SET key intentionally
  //          ignores order for (q27 conflates permutations; this
  //          preserves order, so it is strictly finer on word-order
  //          edits and strictly coarser on punctuation edits — the two
  //          stages compose, neither subsumes the other). Scale shape:
  //          scan-local key expression + one hash aggregate, q27's
  //          exact shape.
  private def q228(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(TF.normKey(col("text")).as("norm_key"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("group_size"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("group_size") > 1)
      .orderBy(col("norm_key"))

  private val q228Sql =
    """SELECT
      |  md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_key,
      |  min(doc_id) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS group_size,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY norm_key""".stripMargin

  // -- q232: boilerplate template detection — groups of documents
  //          sharing the same normalized 64-char PREFIX or SUFFIX: the
  //          shared-header/footer signature of templated scrapes
  //          (nav bars, cookie banners, license footers) that q166's
  //          substring dedup only sees pairwise and q27/q228 only see
  //          when the WHOLE doc matches. A template group is a strip
  //          candidate, not a dedup candidate — the report feeds a
  //          boilerplate-removal stage. Both engines take the same
  //          explicit length arithmetic (docs shorter than TmplLen
  //          normalized chars are out of scope), so the keys are
  //          bit-identical. TmplLen is a dial: 64+ on real web scrapes
  //          (a cookie banner is long); 8 here because the synthetic
  //          corpus has no long shared affixes and the oracle should
  //          exercise the nonzero path. Scale shape: scan-local key
  //          expressions + one hash aggregate per leg, q27's shape.
  private val TmplLen = 8
  private val TmplMinDocs = 5L

  private def q232(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("doc_id"), col("source"),
        TF.normText(col("text")).as("nt"))
      .filter(length(col("nt")) >= TmplLen)
    def leg(kind: String, key: org.apache.spark.sql.Column) =
      base.groupBy(md5(key).as("tmpl_key"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("doc_id")).as("sample_doc"))
        .filter(col("n_docs") >= TmplMinDocs)
        .withColumn("kind", lit(kind))
    leg("prefix", substring(col("nt"), 1, TmplLen))
      .unionByName(leg("suffix",
        expr(s"substring(nt, length(nt) - ${TmplLen - 1}, $TmplLen)")))
      .select(col("kind"), col("tmpl_key"), col("n_docs"),
        col("n_sources"), col("sample_doc"))
      .orderBy(col("kind"), col("tmpl_key"))
  }

  private val q232Sql =
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |    trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
       |  FROM documents),
       |scoped AS (SELECT * FROM base WHERE length(nt) >= $TmplLen),
       |legs AS (
       |  SELECT 'prefix' AS kind, md5(substring(nt, 1, $TmplLen)) AS tmpl_key,
       |    doc_id, source
       |  FROM scoped
       |  UNION ALL
       |  SELECT 'suffix',
       |    md5(substring(nt, length(nt) - ${TmplLen - 1}, $TmplLen)),
       |    doc_id, source
       |  FROM scoped)
       |SELECT kind, tmpl_key, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |  min(doc_id) AS sample_doc
       |FROM legs
       |GROUP BY kind, tmpl_key HAVING count(*) >= $TmplMinDocs
       |ORDER BY kind, tmpl_key""".stripMargin

  // -- q296: power-law exponent MLE (Clauset, Shalizi & Newman 2009,
  //          discrete approximation α = 1 + n/Σln(x/(xmin−½))) fitted
  //          to TWO pipeline distributions: the knowledge graph's
  //          degree distribution (xmin = 1) and the near-dup CLUSTER
  //          SIZE distribution off DedupIndex (xmin = 2) — the cluster
  //          tail exponent says whether duplication is a few mega-
  //          clusters (α small: boilerplate storms, dedup is urgent)
  //          or a long thin tail. Complements q164's Zipf rank fit
  //          (token frequencies) with the dedup-topology fit.
  //          Determinism: per-row ln terms floored to micro units
  //          before the integer sum (mean-of-rounded contract); α is
  //          a single-row double formula, round6.
  private def q296(s: SparkSession, dir: String): DataFrame = {
    def leg(name: String, xs: DataFrame, shift: String) =
      xs.select(expr(s"CAST(floor(ln(x / $shift) * 1000000) AS BIGINT)")
          .as("lt"))
        .agg(count(lit(1)).as("n"), sum(col("lt")).as("sl"))
        .select(lit(name).as("dist"), col("n"),
          expr("round(1 + n * 1000000.0 / nullif(sl, 0), 6)").as("alpha"))
    val deg = graft.graph.GraphAnalytics.degrees(
        graft.graph.KGraph.canonicalMaterialized(s, dir))
      .select(col("degree").as("x"))
    val sizes = graft.dedup.DedupIndex.clusters(s, dir)
      .select(col("cluster_id"), col("cluster_size")).distinct()
      .select(col("cluster_size").as("x"))
    leg("degree_dist", deg, "0.5")
      .unionByName(leg("dup_cluster_size", sizes, "1.5"))
      .orderBy(col("dist"))
  }

  private val q296Sql =
    s"""WITH RECURSIVE $componentCtes,
       |${graft.graph.KGraph.edgesSql},
       |e0 AS (SELECT DISTINCT least(from_id, to_id) AS a,
       |         greatest(from_id, to_id) AS b
       |       FROM edges WHERE from_id <> to_id),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS x FROM (
       |          SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) d
       |        GROUP BY node),
       |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS x
       |  FROM comp GROUP BY 1),
       |l1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(ln(x / 0.5) * 1000000) AS BIGINT))
       |      AS BIGINT) AS sl FROM deg),
       |l2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(ln(x / 1.5) * 1000000) AS BIGINT))
       |      AS BIGINT) AS sl FROM sizes)
       |SELECT dist, n, round(1 + n * 1000000.0 / nullif(sl, 0), 6) AS alpha
       |FROM (
       |  SELECT 'degree_dist' AS dist, n, sl FROM l1
       |  UNION ALL SELECT 'dup_cluster_size', n, sl FROM l2) u
       |ORDER BY dist""".stripMargin

  // -- q310: source-partition conductance over the near-dup pair
  //          graph — treating each SOURCE as a community in the
  //          DedupIndex pair graph: φ(S) = cut(S,S̄) / min(vol(S),
  //          vol(S̄)). Low φ = the source's duplication is self-
  //          contained (dedup shards cleanly by source); high φ = its
  //          dups cross sources, so per-source dedup under-merges —
  //          the shard-planning readout behind q135's flow matrix.
  //          Determinism: pure integer edge census off the build-once
  //          index (internal edges, cut edges, volumes), one
  //          ExactRound ratio. Scale shape: two hash joins of the
  //          pair table to the doc→source map, one keyed agg — never
  //          touches text.
  private def q310(s: SparkSession, dir: String): DataFrame = {
    val src = docs(s, dir).select(col("doc_id"), col("source"))
    val e = graft.dedup.DedupIndex.pairs(s, dir)
      .join(src.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("source", "sa"), "a_id")
      .join(src.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("source", "sb"), "b_id")
    val perSrc = e.select(explode(array(
        struct(col("sa").as("source"), col("sb").as("other")),
        struct(col("sb").as("source"), col("sa").as("other")))).as("x"))
      .select(col("x.source"), col("x.other"))
      .groupBy(col("source")).agg(
        (sum(when(col("source") === col("other"), 1L).otherwise(0L))
          / lit(2L)).cast("long").as("n_internal"),
        sum(when(col("source") =!= col("other"), 1L).otherwise(0L))
          .as("n_cut"))
    val tot = e.agg((count(lit(1)) * lit(2L)).as("vol_tot"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_internal"), col("n_cut"),
        (lit(2L) * col("n_internal") + col("n_cut")).as("volume"),
        when(least(lit(2L) * col("n_internal") + col("n_cut"),
            col("vol_tot") - (lit(2L) * col("n_internal") + col("n_cut")))
            > 0L,
          graft.functions.ExactRound.ratio6(col("n_cut"),
            least(lit(2L) * col("n_internal") + col("n_cut"),
              col("vol_tot") -
                (lit(2L) * col("n_internal") + col("n_cut")))))
          .as("conductance"))
      .orderBy(col("source"))
  }

  private val q310Sql = {
    import graft.functions.{ExactRound => ER}
    s"""WITH sig AS (
       |  SELECT doc_id AS id, ${TF.sql.minhashSignature("text", 12)} AS sig
       |  FROM documents),
       |banded AS (
       |  SELECT id, sig,
       |    b::VARCHAR || '#' || array_to_string(sig[b*6+1:b*6+6], '#') AS bucket
       |  FROM sig, range(0, 2) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id),
       |prs AS (
       |  SELECT a_id, b_id FROM (
       |    SELECT c.a_id, c.b_id,
       |      len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) * 1.0 / 12 AS est
       |    FROM cand c JOIN sig sa ON sa.id = c.a_id JOIN sig sb ON sb.id = c.b_id) x
       |  WHERE est >= 0.9),
       |lab AS (
       |  SELECT p.a_id, p.b_id, da.source AS sa, db.source AS sb
       |  FROM prs p JOIN documents da ON da.doc_id = p.a_id
       |  JOIN documents db ON db.doc_id = p.b_id),
       |halves AS (
       |  SELECT sa AS source, sb AS other FROM lab
       |  UNION ALL SELECT sb AS source, sa AS other FROM lab),
       |per AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN source = other THEN 1 ELSE 0 END) / 2
       |      AS BIGINT) AS n_internal,
       |    CAST(sum(CASE WHEN source <> other THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_cut
       |  FROM halves GROUP BY 1),
       |tot AS (SELECT CAST(2 * count(*) AS BIGINT) AS vol_tot FROM lab)
       |SELECT source, n_internal, n_cut,
       |  CAST(2 * n_internal + n_cut AS BIGINT) AS volume,
       |  CASE WHEN least(2 * n_internal + n_cut,
       |      vol_tot - (2 * n_internal + n_cut)) > 0
       |    THEN ${ER.sql.ratio6("n_cut",
                "least(2 * n_internal + n_cut, vol_tot - (2 * n_internal + n_cut))")}
       |    END AS conductance
       |FROM per CROSS JOIN tot ORDER BY source""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q27_dedup_exact", q27, Some(q27Sql), headline = true),
    Q("q28_dedup_minhash_lsh", q28, Some(q28Sql), headline = true),
    Q("q29_dedup_simhash", q29, Some(q29Sql)),
    Q("q30_dedup_ngram_jaccard", q30, Some(q30Sql)),
    Q("q31_embedding_neardup", q31, Some(q31Sql)),
    Q("q126_dedup_clusters", q126, Some(q126Sql), headline = true),
    Q("q130_duplicated_spans", q130, Some(q130Sql)),
    Q("q135_dup_flow_matrix", q135, Some(q135Sql), headline = true),
    Q("q142_incremental_dedup", q142, Some(q142Sql)),
    Q("q143_effective_tokens", q143, Some(q143Sql)),
    Q("q166_exact_substring_dedup", q166, Some(q166Sql)),
    Q("q171_containment_dedup", q171, Some(q171Sql), headline = true),
    Q("q176_minhash_fidelity", q176, Some(q176Sql), headline = true),
    Q("q183_neardup_edit_audit", q183, Some(q183Sql)),
    Q("q185_substring_split_leakage", q185, Some(q185Sql)),
    Q("q186_cluster_histogram", q186, Some(q186Sql)),
    Q("q187_incremental_substring", q187, Some(q187Sql)),
    Q("q197_url_dedup", q197, Some(q197Sql)),
    Q("q201_cdc_chunk_dedup", q201, Some(q201Sql)),
    Q("q202_incremental_cdc", q202, Some(q202Sql)),
    Q("q208_cdc_flow_matrix", q208, Some(q208Sql)),
    Q("q220_lsh_planner", q220, Some(q220Sql)),
    Q("q226_cluster_cohesion", q226, Some(q226Sql), headline = true),
    Q("q228_normalized_dedup", q228, Some(q228Sql)),
    Q("q232_boilerplate_templates", q232, Some(q232Sql)),
    Q("q277_dedup_recall_estimate", q277, Some(q277Sql)),
    Q("q296_powerlaw_alpha", q296, Some(q296Sql)),
    Q("q310_source_conductance", q310, Some(q310Sql)))
}
