package graft.queries

object DedupQueries {
  def queries: Seq[GQuery] = Seq()
}
