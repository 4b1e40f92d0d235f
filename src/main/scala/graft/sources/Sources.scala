package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File sources/sinks mirroring the reference's I/O surface
  * (SURVEY §2.1).
  */
object Sources {

  /** S3: all-string CSV scan — the reference reads every survey CSV with
    * `col_types = cols(.default = col_character())` and casts later
    * (`/root/reference/R/preprocess-landings.R:55-58`). Reading the
    * header first (driver-side, one small read) lets us declare a full
    * StringType schema so nothing is inferred and the scan stays
    * single-pass. */
  def allStringCsv(spark: SparkSession, path: String): DataFrame = {
    val header = spark.read.option("header", "true").csv(path).schema.fieldNames
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.read.option("header", "true").schema(schema).csv(path)
  }

  /** S4: typed CSV scan — the PDS trips schema `iTTicccdddccc`
    * (`R/preprocess-pds-trips.R:50-62`), with the UTC "Last Seen"
    * custom-format parse and Asia/Dili normalization. */
  val PdsTripsSchema: StructType = StructType(Seq(
    StructField("Trip", IntegerType),
    StructField("Started", TimestampType),
    StructField("Ended", TimestampType),
    StructField("Boat", IntegerType),
    StructField("Boat Name", StringType),
    StructField("Boat Gear", StringType),
    StructField("Community", StringType),
    StructField("Duration (Seconds)", DoubleType),
    StructField("Range (Meters)", DoubleType),
    StructField("Distance (Meters)", DoubleType),
    StructField("IMEI", StringType),
    StructField("Device Id", StringType),
    StructField("Last Seen", StringType)))

  def pdsTripsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(PdsTripsSchema).csv(path)
      // R's "%a %b %d %X UTC %Y": Spark's post-3.0 parser refuses
      // day-of-week patterns on parse, so the redundant "EEE " prefix is
      // stripped instead
      .withColumn("Last Seen",
        to_timestamp(regexp_replace(col("`Last Seen`"), "^[A-Za-z]{3} ", ""),
          "MMM dd HH:mm:ss 'UTC' yyyy"))

  /** S13: TSV sink for the public exports
    * (`R/format-public-data.R:191-219`) — single-file, tab-separated,
    * with header. `coalesce(1)` is the reference's own single-artifact
    * contract; large tables should instead keep their partitioning. */
  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)
  }

  /** S14: JSON sink (portal exports, `R/export.R:386-435`): one JSON
    * document per row via `to_json(struct(*))`, written as text. */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** S16: zip bundle of exported files (driver-side, small artifacts
    * only — mirrors `R/merge-trips.R:154-177`). */
  def zipDirectory(dir: String, zipPath: String): Unit = {
    val src = new java.io.File(dir)
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    val target = new java.io.File(zipPath).getAbsolutePath
    try {
      zos.setLevel(9)
      src.listFiles().filter(f => f.isFile && f.getAbsolutePath != target)
        .sortBy(_.getName).foreach { f =>
        zos.putNextEntry(new java.util.zip.ZipEntry(f.getName))
        java.nio.file.Files.copy(f.toPath, zos)
        zos.closeEntry()
      }
    } finally zos.close()
  }
}
