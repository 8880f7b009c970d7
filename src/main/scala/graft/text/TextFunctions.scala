package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * token counting, stopword/quality scoring, language ID (stopword-list
  * heuristic), document fingerprinting (rolling hash), character
  * shingles, MinHash signatures and SimHash — all as pure Catalyst
  * expressions (no UDFs) so they survive whole-stage codegen and scale
  * linearly with a parquet scan.
  *
  * Every function has an exact DuckDB mirror (the `sql` object) built
  * from the same md5-based portable hash, so results are oracle-checkable
  * bit-for-bit.
  */
object TextFunctions {

  def tokens(text: Column): Column = split(text, " ")
  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count + a BPE-ish regex token count (runs of
    * letters / digits / single punctuation, the shape of a byte-pair
    * pre-tokenizer split). */
  def tokenCount(text: Column): Column = size(tokens(text))
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def regexTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Canonical text normalization (q228/q232): lowercase, strip
    * non-alphanumerics, collapse runs of spaces, trim. */
  def normText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Normalized dedup key (q228): [[normText]] then md5. Order-
    * preserving — the word-order-sensitive sibling of q27's token-set
    * key. */
  def normKey(text: Column): Column = md5(normText(text))

  /** Portable 32-bit token hash: first 8 hex chars of md5, as a long.
    * Chosen over xxhash64/murmur because DuckDB can compute the exact
    * same value (('0x'||substr(md5(w),1,8))::BIGINT). */
  def md5Long(c: Column): Column =
    conv(substr(md5(c), lit(1), lit(8)), 16, 10).cast("long")

  /** Rolling-hash document fingerprint over the ordered token stream:
    * fold h := (h*31 + md5Long(tok)) mod (2^31-1). */
  def fingerprint(text: Column): Column =
    aggregate(transform(tokens(text), w => md5Long(w)),
      lit(0L), (acc, h) => (acc * 31 + h) % 2147483647L)

  /** One-pass codegen token-set Jaccard — semantically identical to
    * size(array_intersect)/(|a|+|b|−inter) with the 0-union guard, but a
    * single scalar evaluation per pair (see SetJaccardExpr). */
  def jaccardSim(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expressions.SetJaccardExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** One-pass codegen DISTINCT intersection size (long) — the exact
    * integer numerator for Jaccard/containment ratios kept in integer
    * arithmetic (see SetOverlapExpr). */
  def setOverlap(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expressions.SetOverlapExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Jaro–Winkler string similarity — codegen record-linkage scorer
    * (see JaroWinklerExpr; rapidfuzz/DuckDB-pinned semantics). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.expressions.JaroWinklerExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Character n-gram shingles (for n-gram Jaccard near-dup). */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** MinHash signature with k permutation slots: each token hashes ONCE
    * (md5Long), then slot i takes the min of an affine permutation
    * h_i(x) = (x·a_i + i) mod M over the distinct token set — the classic
    * permutation-min sketch (collision probability per slot = Jaccard),
    * with 1 md5 per token instead of k and long arithmetic instead of
    * 32-char string mins. a_i is an LCG-derived odd-ish multiplier both
    * engines compute identically. */
  val minhashMod = 2147483647L // 2^31 − 1 (prime)
  def minhashA(i: Column): Column =
    (lit(1103515245L) * (i + 1) + 12345L) % minhashMod
  def minhashSignature(text: Column, k: Int): Column =
    minhashSignatureFromHashes(tokenHashes(text), k)

  /** Raw md5Long per token, duplicates kept — the ONE hash pass the
    * MinHash and SimHash catchers share (round-12 verdict item 4: each
    * leg used to re-hash every token of every document). */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), w => md5Long(w))

  /** [[minhashSignature]] over a precomputed [[tokenHashes]] array.
    * array_distinct on HASHES instead of tokens is exact here: a
    * 32-bit md5 collision merges two values, but array_min over the
    * permuted set is unaffected by multiplicity — the min of
    * {h(a_i·x+i) : x ∈ hashes} equals the min over the distinct
    * hash set of the distinct token set. */
  def minhashSignatureFromHashes(hashes: Column, k: Int): Column = {
    val hs = transform(array_distinct(hashes), h => h % minhashMod)
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hs, h => (h * minhashA(i) + i) % minhashMod)))
  }

  /** 16-bit SimHash over a precomputed [[tokenHashes]] array, PER ROW:
    * bit j is set when strictly more tokens (duplicates kept) have md5
    * bit j set than unset — sum(±1) > 0 ⇔ 2·count(set) > n, exactly
    * the explode/groupBy form's integer arithmetic (Dedup.simhash16)
    * without the corpus-token-sized explode. */
  def simhash16FromHashes(hashes: Column): Column = {
    val n = size(hashes)
    (0 until 16).map { j =>
      val cnt = size(filter(hashes,
        h => shiftright(h, j).bitwiseAND(lit(1L)) === 1L))
      when(cnt * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Fraction of equal slots between two signatures = Jaccard estimate.
    * Unrolled into k element_at comparisons — zip_with/filter are
    * CodegenFallback (interpreted), and this runs once per candidate
    * pair, so staying inside whole-stage codegen matters. */
  def minhashEstimate(sigA: Column, sigB: Column, k: Int): Column =
    (1 to k).map(i =>
      when(element_at(sigA, i) === element_at(sigB, i), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k

  // Stopword lists for the language-ID heuristic (public, tiny).
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language ID: occurrence ratio of each language's stopword list over
    * the full token stream; argmax with deterministic tie-break (language
    * code order), 'und' when no list matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val r = stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
      l -> (countIn(toks, ws).cast("double") / n)
    }
    val best = r.map(_._2).reduce((a, b) => greatest(a, b))
    r.foldRight(lit("und"): Column) { case ((l, score), elseCol) =>
      when(score === best && score > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality score in [0,1] — reference-style composition
    * (result_ranker.py:413-436 length score; :266-334 quality blend):
    * 0.4·lengthScore + 0.3·tokenDiversity + 0.3·(1 − stopwordRatio). */
  def lengthScore(nChars: Column): Column =
    when(nChars >= 50 && nChars <= 500, lit(1.0))
      .when(nChars < 50, nChars.cast("double") / 50)
      .otherwise(greatest(lit(0.3), lit(1.0) - (nChars.cast("double") - 500) / 1000))

  def stopwordRatio(text: Column): Column =
    countIn(tokens(text), stopwords("en")).cast("double") / size(tokens(text))

  def tokenDiversity(text: Column): Column =
    size(distinctTokens(text)).cast("double") / size(tokens(text))

  def qualityScore(text: Column, nChars: Column): Column =
    lit(0.4) * lengthScore(nChars) + lit(0.3) * tokenDiversity(text) +
      lit(0.3) * (lit(1.0) - stopwordRatio(text))

  /** DuckDB mirrors of the above, as SQL snippet generators. `t` is the
    * text column expression, assumed space-tokenizable. */
  object sql {
    def tokens(t: String) = s"string_split($t, ' ')"
    def distinctTokens(t: String) = s"list_distinct(${tokens(t)})"
    def tokenCount(t: String) = s"len(${tokens(t)})"
    def regexTokenCount(t: String) =
      s"len(regexp_extract_all($t, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))"
    def md5Long(c: String) = s"(('0x'||substr(md5($c),1,8))::BIGINT)"
    def fingerprint(t: String) =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(${tokens(t)}, " +
        s"w -> ${md5Long("w")})), (a, h) -> (a*31 + h) % 2147483647)"
    def charShingles(t: String, n: Int) =
      s"list_transform(range(1, greatest(len($t) - ${n - 1}, 1) + 1), " +
        s"i -> ($t)[i:i+${n - 1}])"
    def minhashSignature(t: String, k: Int) =
      s"list_transform(range(0, $k), i -> list_min(list_transform(" +
        s"${distinctTokens(t)}, w -> ((${md5Long("w")} % 2147483647) * " +
        s"((1103515245 * (i + 1) + 12345) % 2147483647) + i) % 2147483647)))"
    def countIn(toksExpr: String, words: Seq[String]) =
      s"len(list_filter($toksExpr, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"
    def langId(t: String): String = {
      val n = s"len(${tokens(t)})"
      val r = TextFunctions.stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
        l -> s"(${countIn(tokens(t), ws)} * 1.0 / $n)"
      }
      val best = r.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
      r.foldRight("'und'") { case ((l, score), e) =>
        s"(CASE WHEN $score = $best AND $score > 0 THEN '$l' ELSE $e END)"
      }
    }
    def lengthScore(nc: String) =
      s"(CASE WHEN $nc >= 50 AND $nc <= 500 THEN 1.0 " +
        s"WHEN $nc < 50 THEN $nc * 1.0 / 50 " +
        s"ELSE greatest(0.3, 1.0 - ($nc * 1.0 - 500) / 1000) END)"
    def stopwordRatio(t: String) =
      s"(${countIn(tokens(t), TextFunctions.stopwords("en"))} * 1.0 / len(${tokens(t)}))"
    def tokenDiversity(t: String) =
      s"(len(${distinctTokens(t)}) * 1.0 / len(${tokens(t)}))"
    def qualityScore(t: String, nc: String) =
      s"(0.4 * ${lengthScore(nc)} + 0.3 * ${tokenDiversity(t)} + " +
        s"0.3 * (1.0 - ${stopwordRatio(t)}))"
  }
}
