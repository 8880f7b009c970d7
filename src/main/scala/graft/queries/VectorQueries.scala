package graft.queries

object VectorQueries {
  val qs: Seq[Q] = Seq()
}
