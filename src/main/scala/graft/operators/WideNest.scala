package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The wide→nested normalization kernel — the reference's signature
  * ingest move (`/root/reference/R/pt_nest_species.R:36-119`): a Kobo
  * CSV export arrives with repeated question groups flattened to
  * index-suffixed columns (`species_group.0.species_group/species`,
  * `species_group.1....`), which are melted into one row per (parent,
  * index) and nested into an ordered array-of-struct column.
  *
  * The column-name parsing happens on the driver over `df.columns`
  * (schema-sized, not data-sized); the melt is a single generator
  * expression (no shuffle) and the nest is one grouped aggregation —
  * the same two-exchange budget regardless of how many repeat groups
  * the form version has.
  */
object WideNest {

  /** Columns matching `<group>.<n>.<rest>` for the given group. */
  def repeatColumns(df: DataFrame, group: String): Map[Int, Map[String, String]] = {
    val Pat = (java.util.regex.Pattern.quote(group) + "\\.(\\d+)\\.(.+)").r
    df.columns.toSeq.flatMap {
      case c @ Pat(idx, rest) => Some((idx.toInt, rest, c))
      case _ => None
    }.groupBy(_._1).view
      .mapValues(_.map { case (_, rest, c) => rest -> c }.toMap).toMap
  }

  /** Melt the repeat groups of `group` into an array-of-struct column
    * `as`, one struct per present index (structs whose fields are all
    * null are dropped — the reference's empty-group semantics), ordered
    * by the repeat index `n`. Non-group columns pass through. */
  def nestRepeats(df: DataFrame, group: String, as: String): DataFrame = {
    val groups = repeatColumns(df, group)
    if (groups.isEmpty) return df.withColumn(as, array())
    // raw column names contain '.' and '/', so references must be
    // backtick-quoted or Spark parses them as struct paths
    def raw(c: String): Column = col(s"`$c`")
    val fields: Seq[String] = groups.values.flatMap(_.keys).toSeq.distinct.sorted
    val structs: Seq[Column] = groups.toSeq.sortBy(_._1).map { case (n, cols) =>
      struct(
        (lit(n).as("n") +:
          fields.map(f => cols.get(f).map(raw).getOrElse(lit(null).cast("string")).as(
            f.replaceAll("[^A-Za-z0-9_]", "_")))): _*)
    }
    val keep = df.columns.filterNot(_.startsWith(s"$group.")).map(raw)
    val arr = filter(array(structs: _*),
      s => fields.map(f => s.getField(f.replaceAll("[^A-Za-z0-9_]", "_")).isNotNull)
        .reduce(_ || _))
    df.select(keep :+ arr.as(as): _*)
  }

  /** The reference's length-class parsing
    * (`R/pt_nest_species.R:55-80`): a column name like
    * `no_individuals_5_10` carries its length bin; the value used
    * downstream is the mean of the numbers embedded in the name
    * (7.5 for 5_10), while `_over60`-style classes take the recorded
    * length value instead. Returns the mean of all integers found in
    * the name, computed with higher-order functions (no UDF). */
  def meanOfNumbersInName(name: Column): Column = {
    val nums = regexp_extract_all(name, lit("[0-9]+"), lit(0))
    when(size(nums) > 0,
      aggregate(nums, lit(0L), (acc, x) => acc + x.cast("long")).cast("double") /
        size(nums).cast("double"))
  }
}
