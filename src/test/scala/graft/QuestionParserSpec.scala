package graft

import org.apache.spark.sql.Row
import graft.query.QuestionParser

/** Pins QuestionParser semantics (question_answering.py:88-308) on the
  * reference test-suite's own example questions
  * (test_knowledge_synthesis_engine.py:271-285) plus the remaining
  * types, entity/keyword quirks, constraints and confidence. */
class QuestionParserSpec extends SparkSpec {
  import spark.implicits._

  private def parse(qs: String*): Map[String, Row] =
    QuestionParser.parse(qs.toDF("question"), "question")
      .collect().map(r => r.getAs[String]("question") -> r).toMap

  test("reference example questions detect the documented types") {
    val p = parse(
      "What is AI?",
      "How does X compare to Y?",
      "Why does this happen?",
      "How to implement AI?",
      "Define machine learning",
      "How is caching related to memory?",
      "What patterns in usage emerge?",
      "When did the rollout happen before June, exactly?",
      "Completely untyped sentence here")
    def t(q: String) = p(q).getAs[String]("question_type")
    assert(t("What is AI?") == "factual")
    assert(t("How does X compare to Y?") == "comparative")
    assert(t("Why does this happen?") == "causal")
    assert(t("How to implement AI?") == "procedural")
    assert(t("Define machine learning") == "definitional")
    assert(t("How is caching related to memory?") == "relational")
    assert(t("What patterns in usage emerge?") == "analytical")
    assert(t("When did the rollout happen before June, exactly?") == "temporal")
    assert(t("Completely untyped sentence here") == "factual") // default
  }

  test("entities, keywords, intent: the reference's faithful quirks") {
    val p = parse("What is AI?",
      "Tell me about \"silver lining\" and Hadoop Spark today")
    val r1 = p("What is AI?")
    // 'What' matches the proper-noun pattern; 'AI' (no lowercase) does
    // not; 'ai' is a 2-char keyword and is dropped
    assert(r1.getSeq[String](r1.fieldIndex("entities")) == Seq("What"))
    assert(r1.getSeq[String](r1.fieldIndex("keywords")) == Seq.empty[String])
    assert(r1.getAs[String]("intent") == "Get factual information about What")
    assert(math.abs(r1.getAs[Double]("parsing_confidence") -
      (0.5 + 0.2 * (1.0 / 3))) < 1e-12)
    val r2 = p("Tell me about \"silver lining\" and Hadoop Spark today")
    // multi-word proper noun + quoted entity, sorted order
    assert(r2.getSeq[String](r2.fieldIndex("entities")) ==
      Seq("Hadoop Spark", "Tell", "silver lining"))
    assert(r2.getSeq[String](r2.fieldIndex("keywords")) ==
      Seq("tell", "about", "silver", "lining", "hadoop", "spark", "today"))
  }

  test("constraints: first time pattern wins; quantity limit") {
    val p = parse(
      "Show the 5 most common faults in 2021 during the rollout",
      "When did it happen before June, exactly?",
      "How to tune this?")
    val r1 = p("Show the 5 most common faults in 2021 during the rollout")
    assert(r1.getAs[String]("time_filter") == "2021") // 'in \d{4}' first
    assert(r1.getAs[Int]("limit_n") == 5)
    val r2 = p("When did it happen before June, exactly?")
    assert(r2.getAs[String]("time_filter") == "june") // comma-bounded
    assert(r2.isNullAt(r2.fieldIndex("limit_n")))
    val r3 = p("How to tune this?")
    assert(r3.isNullAt(r3.fieldIndex("time_filter")))
  }
}
