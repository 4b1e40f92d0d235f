package graft.queries

object StatsQueries {
  def queries: Seq[GQuery] = Seq()
}
