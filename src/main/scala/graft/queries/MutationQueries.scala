package graft.queries

object MutationQueries {
  val qs: Seq[Q] = Seq()
}
