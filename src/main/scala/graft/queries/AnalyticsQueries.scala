package graft.queries

object AnalyticsQueries {
  val qs: Seq[Q] = Seq()
}
