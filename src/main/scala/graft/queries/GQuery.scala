package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (when SQL-expressible)
  * an equivalent ANSI SQL oracle run by DuckDB over the same parquet
  * tables. [[graft.Bench]] times every registered query; `headline =
  * true` additionally tags the representative plan shapes worth
  * eyeballing first in a bench report (it changes no behavior).
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  /** Full inventory, assembled from the per-module query sets. */
  def all: Seq[GQuery] =
    RelationalQueries.queries ++
      WindowQueries.queries ++
      ReshapeQueries.queries ++
      StatsQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TemporalQueries.queries ++
      MiscQueries.queries ++
      ValidateQueries.queries ++
      NutrientQueries.queries ++
      PublicDataQueries.queries ++
      EstimationQueries.queries ++
      SummaryQueries.queries ++
      WeightsQueries.queries ++
      RecodeQueries.queries ++
      EndToEndQueries.queries ++
      SamplingQueries.queries ++
      CrawlQueries.queries ++
      CorpusStatQueries.queries ++
      GraphQueries.queries ++
      BloomQueries.queries ++
      PreferenceQueries.queries

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
