package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Markov-chain attribution (removal effects, Anderl et al. 2014) —
  * the data-driven alternative to q323's positional credit rules:
  * model journeys as a first-order chain over channel states with
  * absorbing `conv`/`null`, then credit each channel by how much the
  * start→conv absorption probability DROPS when the channel is
  * removed (all its inbound traffic redirected to `null`). The
  * reference has no attribution layer; the chain mechanics extend
  * q280's transition matrix.
  *
  * Absorption runs at a fixed 2^`squarings` step horizon via repeated
  * matrix SQUARING — log₂ joins instead of a step-per-iteration loop,
  * and every product-sum is DECIMAL(38,18)-routed so the tiny-matrix
  * group sums are order-independent (bit-identical to any ANSI oracle
  * replaying the same squarings). All frames after the one fact-sized
  * transition count are states²-bounded.
  */
object MarkovAttribution {
  private val Dec18 = DecimalType(38, 18)
  private def dsum18(c: Column): Column = sum(c.cast(Dec18)).cast(DoubleType)

  /** Row-normalize transition counts (src, dst, n) and append the two
    * absorbing self-loops (per tag when `tagCols` carries several
    * chains in one frame). One IEEE division per cell. */
  def normalize(counts: DataFrame, tagCols: Seq[String] = Nil): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val keys = tagCols :+ "src"
    val tot = counts.groupBy(keys.map(col): _*).agg(sum(col("n")).as("n_src"))
    val absorb0 = Seq(("conv", "conv", 1.0), ("null", "null", 1.0))
      .toDF("src", "dst", "p")
    val absorb =
      if (tagCols.isEmpty) absorb0
      else counts.select(tagCols.map(col): _*).distinct().crossJoin(absorb0)
    counts.join(broadcast(tot), keys)
      .select(tagCols.map(col) :+ col("src") :+ col("dst")
        :+ (col("n").cast("double") / col("n_src").cast("double")).as("p"): _*)
      .unionByName(absorb)
  }

  /** One matrix squaring: M² over (src, dst, p) rows, decimal-routed.
    * `tagCols` lets MANY independent chains share one frame (and one
    * Spark job per squaring) — rows only combine within a tag. */
  def square(m: DataFrame, tagCols: Seq[String] = Nil): DataFrame = {
    val joinCond = (tagCols.map(t => col(s"a.$t") === col(s"b.$t"))
      :+ (col("a.dst") === col("b.src"))).reduce(_ && _)
    m.as("a").join(m.as("b"), joinCond)
      .groupBy(tagCols.map(t => col(s"a.$t").as(t))
        :+ col("a.src").as("src") :+ col("b.dst").as("dst"): _*)
      .agg(dsum18(col("a.p") * col("b.p")).as("p"))
  }

  /** start→conv absorption probability after 2^squarings steps, one
    * row per tag (tags whose chain never reaches conv keep p = 0
    * only if they appear — callers outer-join against their tag
    * list). Each squaring is lazily checkpointed: M² references M
    * twice, so an unbroken lineage recomputes the whole chain 2^k
    * times — the checkpoint makes the fold linear in k on
    * states²-bounded frames. */
  def absorption(probs: DataFrame, squarings: Int,
                 tagCols: Seq[String] = Nil): DataFrame = {
    val pk = (1 to squarings).foldLeft(probs)((acc, _) =>
      square(acc, tagCols).localCheckpoint(eager = false))
    val conv = pk.filter(col("src") === "start" && col("dst") === "conv")
    if (tagCols.isEmpty)
      conv.agg(coalesce(sum(col("p")), lit(0.0)).as("p"))
    else
      conv.groupBy(tagCols.map(col): _*)
        .agg(coalesce(sum(col("p")), lit(0.0)).as("p"))
  }

  /** Remove a channel: drop its outbound rows, redirect its inbound
    * traffic to `null`, re-aggregate counts. */
  def removeChannel(counts: DataFrame, channel: String): DataFrame =
    counts.filter(col("src") =!= channel)
      .withColumn("dst",
        when(col("dst") === channel, lit("null")).otherwise(col("dst")))
      .groupBy(col("src"), col("dst")).agg(sum(col("n")).as("n"))
}
