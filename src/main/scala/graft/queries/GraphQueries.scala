package graft.queries

object GraphQueries {
  val qs: Seq[Q] = Seq()
}
