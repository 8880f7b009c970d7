package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Catalog

/** Scale-evidence discipline, automated (round-10 verdict item 6):
  * every catalog query must carry an sf1.0 scale row — in a
  * BENCH_NOTES.md scale table or in SCALECHECK.json — so an operator
  * cannot land with only sf0.01 oracle evidence. Ids are matched the
  * way the inventory tables cite them: bare (q268) or as an expanded
  * range (q36–q43).
  */
object ScaleEvidence {
  /** All cited query numbers in `text`: bare ids (q268), full catalog
    * names (q01_pricing_summary — `\b` alone misses these, the
    * underscore is a word character), and expanded ranges (q36–q43).
    * The digit lookahead keeps q26 from matching inside q268. */
  def ids(text: String): Set[Int] = {
    val singles = "\\bq(\\d{1,3})(?![0-9])".r.findAllMatchIn(text)
      .map(_.group(1).toInt)
    val ranges = "\\bq(\\d{1,3})\\s*[–-]\\s*q?(\\d{1,3})(?![0-9])".r
      .findAllMatchIn(text)
      .flatMap(m => m.group(1).toInt to m.group(2).toInt)
    (singles ++ ranges).toSet
  }

  def missing(evidence: String): Seq[Int] = {
    val have = ids(evidence)
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
    val evidence = read("BENCH_NOTES.md") + read("SCALECHECK.json")
    val miss = ScaleEvidence.missing(evidence)
    assert(miss.isEmpty,
      s"catalog queries with no scale evidence: " +
        miss.map("q" + _).mkString(", "))
  }

  test("the checker actually catches a missing query") {
    // evidence text citing every catalog id EXCEPT one: the checker
    // must report exactly that one (guards against a regex rot that
    // would silently match everything)
    val all = Catalog.all
      .map(_.name.drop(1).takeWhile(_.isDigit).toInt).distinct.sorted
    val victim = all.last
    val text = all.filterNot(_ == victim).map("q" + _).mkString(" ")
    assert(ScaleEvidence.missing(text) == Seq(victim))
  }

  test("range citations expand") {
    assert(ScaleEvidence.ids("q36–q43 and q50-q52 plus q7") ==
      ((36 to 43) ++ (50 to 52) :+ 7).toSet)
  }
}
