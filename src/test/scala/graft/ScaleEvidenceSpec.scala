package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Scale-evidence discipline, automated (round-10 verdict item 6):
  * every catalog query must carry an sf1.0 scale row — a BENCH_NOTES
  * markdown TABLE row whose first cell is the query (the addenda
  * format `| qNNN_name | sf0.1 | sf1.0 | ... |`), or a fingerprint
  * entry in SCALECHECK.json — so an operator cannot land with only
  * sf0.01 oracle evidence. A bare prose mention does NOT count
  * (round-11 review: any query discussed in a round note would
  * otherwise pass the gate with zero scale data).
  */
object ScaleEvidence {

  /** Query numbers cited as the FIRST CELL of a markdown table row,
    * counting ONLY tables whose header row mentions `sf1.0` — the
    * addenda format `| query | sf0.1 min | sf1.0 min | ... |`.
    * BENCH_NOTES also carries sf0.1-only tables (timing ranges,
    * selectivity sweeps); a row there is not scale evidence and must
    * not satisfy the gate (round-11 review finding).
    */
  def tableRowIds(text: String): Set[Int] = {
    val rowId = "^\\|\\s*q(\\d{1,3})[a-z_0-9]*\\s*\\|".r
    val ids = scala.collection.mutable.Set[Int]()
    var inTable = false
    var headerHasSf1 = false
    text.linesIterator.foreach { line =>
      val isTableLine = line.trim.startsWith("|")
      if (isTableLine && !inTable) { // this line is the table's header
        inTable = true
        // an sf1.0 MEASUREMENT column, not a passing mention: the cell
        // itself must start with "sf1.0" ("sf1.0 min", "sf1.0 (s)") —
        // a notes column like "note vs sf1.0" must not turn an
        // sf0.1-only table into scale evidence (ADVICE r12)
        headerHasSf1 = line.split('|').exists(_.trim.startsWith("sf1.0"))
      } else if (!isTableLine) { inTable = false; headerHasSf1 = false }
      if (isTableLine && headerHasSf1)
        rowId.findFirstMatchIn(line.trim)
          .foreach(m => ids += m.group(1).toInt)
    }
    ids.toSet
  }

  /** Query numbers keyed in a SCALECHECK-style JSON board. */
  def jsonKeyIds(text: String): Set[Int] =
    "\"q(\\d{1,3})[a-z_0-9]*\"".r
      .findAllMatchIn(text).map(_.group(1).toInt).toSet

  def missing(benchNotes: String, scaleCheck: String): Seq[Int] = {
    val have = tableRowIds(benchNotes) ++ jsonKeyIds(scaleCheck)
    Catalog.all
      .map(_.name.drop(1).takeWhile(_.isDigit).toInt)
      .distinct.sorted
      .filterNot(have)
  }
}

class ScaleEvidenceSpec extends AnyFunSuite {

  private def read(path: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path))

  test("every catalog query has an sf1.0 scale row in BENCH_NOTES or SCALECHECK") {
    val miss = ScaleEvidence.missing(read("BENCH_NOTES.md"),
      read("SCALECHECK.json"))
    assert(miss.isEmpty,
      s"catalog queries with no scale-table row: " +
        miss.map("q" + _).mkString(", "))
  }

  test("the checker actually catches a missing query") {
    // table rows for every catalog id EXCEPT one: the checker must
    // report exactly that one (guards against regex rot that would
    // silently match everything)
    val all = Catalog.all
      .map(_.name.drop(1).takeWhile(_.isDigit).toInt).distinct.sorted
    val victim = all.last
    val rows = "| query | sf0.1 min | sf1.0 min | scaling |\n|---|---|---|---|\n" +
      all.filterNot(_ == victim)
        .map(i => s"| q${i}_x | 1.0 | 2.0 | 2.0x |").mkString("\n")
    assert(ScaleEvidence.missing(rows, "{}") == Seq(victim))
  }

  test("rows in sf0.1-only tables do not count as sf1.0 evidence") {
    // the round-2 timing-range table shape: a table with no sf1.0
    // column — its rows previously satisfied the gate (round-11 review)
    val sf01Only = "| query | range | note |\n|---|---|---|\n" +
      "| q12_multihop_bfs_in | 1.9 s | quiet |\n"
    assert(ScaleEvidence.tableRowIds(sf01Only).isEmpty)
    // a notes column MENTIONING sf1.0 is still not a measurement column
    // (ADVICE r12: the substring match re-opened the gap)
    val mention = "| query | sf0.1 min | note vs sf1.0 |\n|---|---|---|\n" +
      "| q12_multihop_bfs_in | 1.9 | see addendum |\n"
    assert(ScaleEvidence.tableRowIds(mention).isEmpty)
    val sf10 = "| query | sf0.1 min | sf1.0 min | scaling |\n|---|---|---|---|\n" +
      "| q12_multihop_bfs_in | 1.9 | 4.0 | 2.1x |\n"
    assert(ScaleEvidence.tableRowIds(sf10) == Set(12))
  }

  test("canonical scale-board entries self-describe their protocol") {
    // round-13 verdict item 3: the sf2.0 board's 24g trial-major
    // numbers were cross-read against 48g min-of-2 BENCH_NOTES pins —
    // a 1.8x spread explained entirely by measurement protocol that no
    // entry recorded. Every entry on the canonical sf1.0 board must now
    // carry a cfg field (heap, cpus, trial shape).
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(read("SCALECHECK.json"))
    import scala.jdk.CollectionConverters._
    val entries = node.get("queries").properties().asScala.toSeq
    assert(entries.nonEmpty)
    val missingCfg = entries.collect {
      case e if e.getValue.get("cfg") == null ||
        !e.getValue.get("cfg").asText().contains("heap=") => e.getKey
    }
    assert(missingCfg.isEmpty,
      s"board entries with no protocol stamp: ${missingCfg.mkString(", ")}")
  }

  test("prose mentions do not count as evidence") {
    assert(ScaleEvidence.tableRowIds(
      "q31's oracle gate is green; see q293 notes") == Set.empty)
    // a bare row with no sf1.0 header doesn't count either (the header
    // anchor is what keeps sf0.1-only tables out of the gate)
    assert(ScaleEvidence.tableRowIds(
      "| q31_embedding_neardup | 1.39 | 10.06 | 7.3x |") == Set.empty)
    assert(ScaleEvidence.tableRowIds(
      "| query | sf0.1 | sf1.0 | x |\n|---|---|---|---|\n" +
        "| q31_embedding_neardup | 1.39 | 10.06 | 7.3x |") == Set(31))
  }
}
