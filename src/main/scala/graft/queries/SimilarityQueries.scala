package graft.queries

object SimilarityQueries {
  def queries: Seq[GQuery] = Seq()
}
