package graft.queries

object DedupQueries {
  val qs: Seq[Q] = Seq()
}
