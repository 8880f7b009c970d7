package graft.queries

object TemporalQueries {
  val qs: Seq[Q] = Seq()
}
