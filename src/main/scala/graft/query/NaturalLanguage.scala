package graft.query

import graft.operators.Filters.Cond

/** Natural-language query parsing (reference query/natural_language_
  * processor.py): regex RULE classification (:118-162) combined with an
  * LLM parse (:163-190). The rule layer is deterministic and lives here;
  * the LLM layer is a pluggable provider trait with no default network
  * dependency (tests and the correctness path never need it).
  */
object NaturalLanguage {

  sealed trait Intent
  case object FindNodes extends Intent
  case object FindRelationships extends Intent
  case object CountAggregation extends Intent
  case object SimilaritySearch extends Intent
  case object ComplexPattern extends Intent

  final case class Parsed(intent: Intent, entities: Seq[String],
      filters: Seq[Cond], semanticThreshold: Double)

  /** Optional LLM refinement hook (llm/interfaces/llm_provider_interface
    * .py shape). Implementations return an adjusted Parsed. */
  trait LlmParser { def refine(question: String, ruleParse: Parsed): Parsed }

  private val countRe = "(?i)\\b(how many|count|number of)\\b".r
  private val relRe = "(?i)\\b(related|relationship|connected|linked|between)\\b".r
  private val simRe = "(?i)\\b(similar|like|close to|nearest)\\b".r
  private val patternRe = "(?i)\\b(pattern|path|chain|through)\\b".r
  // single quotes must not start mid-word, or contractions ("what's")
  // would open a bogus entity span
  private val quoted = "\"([^\"]+)\"|(?<![\\p{L}\\p{N}])'([^']+)'".r

  /** Rule classification: first matching class wins, in the reference's
    * check order (natural_language_processor.py:118-162). */
  def classify(q: String): Intent =
    if (countRe.findFirstIn(q).isDefined) CountAggregation
    else if (patternRe.findFirstIn(q).isDefined) ComplexPattern
    else if (relRe.findFirstIn(q).isDefined) FindRelationships
    else if (simRe.findFirstIn(q).isDefined) SimilaritySearch
    else FindNodes

  /** Quoted phrases become entities; entities become content-contains
    * filters; similarity intent bumps the semantic threshold to 0.75
    * (query_engine.py:276-300). */
  def parse(q: String, llm: Option[LlmParser] = None): Parsed = {
    val intent = classify(q)
    val entities = quoted.findAllMatchIn(q)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).toSeq
    val filters = entities.map(e => Cond("content", "contains", e, caseSensitive = false))
    val threshold = intent match {
      case SimilaritySearch => 0.75
      case _ => 0.7
    }
    val ruleParse = Parsed(intent, entities, filters, threshold)
    llm.map(_.refine(q, ruleParse)).getOrElse(ruleParse)
  }
}
