package graft.queries

object TextQueries {
  def queries: Seq[GQuery] = Seq()
}
