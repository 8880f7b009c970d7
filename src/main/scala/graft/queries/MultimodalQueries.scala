package graft.queries

object MultimodalQueries {
  val qs: Seq[Q] = Seq()
}
