package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — a training-data
  * pipeline mandate operator (no reference counterpart): corpora are
  * scrubbed of emails / phone numbers / SSNs / IPs / card numbers
  * before training, and the detection counts feed filtering decisions
  * (drop PII-dense documents rather than redact them).
  *
  * Both legs are per-row regex column expressions, so scrubbing runs
  * inside the scan — no shuffle, no UDF, linear at any corpus size.
  * Patterns are deliberately RE2-compatible (no lookaround, no
  * backreferences) so the DuckDB oracle replays them verbatim and a
  * cluster could swap in an RE2-based engine without semantic drift.
  *
  * Redaction applies patterns in a FIXED order (email, card, ssn,
  * phone, ip): the digit patterns are mutually exclusive by shape
  * (4-4-4-4 / 3-2-4 / 3-3-4 / dotted quads bounded by \b), but a
  * stable order keeps the composition deterministic if a future
  * pattern overlaps.
  */
object PiiScrub {

  /** (kind, pattern, mask) in application order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
      "[EMAIL]"),
    ("card", """\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b""", "[CARD]"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "[SSN]"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "[PHONE]"),
    ("ip", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "[IP]"))

  private val byKind = patterns.map(p => p._1 -> p).toMap

  /** Occurrence count of one PII kind. */
  def count(text: Column, kind: String): Column =
    size(regexp_extract_all(text, lit(byKind(kind)._2), lit(0)))

  /** All kinds masked, in the fixed application order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, pat, mask)) =>
      regexp_replace(c, pat, mask)
    }

  /** True when the text holds at most `maxHits` PII matches across all
    * kinds — the drop-don't-redact filtering form. */
  def cleanEnough(text: Column, maxHits: Int = 0): Column =
    patterns.map(p => count(text, p._1)).reduce(_ + _) <= maxHits
}
