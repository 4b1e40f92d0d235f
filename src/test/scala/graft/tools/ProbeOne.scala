package graft
import org.apache.spark.sql.SparkSession
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]").appName("probe")
        .config("spark.ui.enabled","false"), parallelism = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val c = df.count()
        println(s"OK $n rows=$c")
      } catch { case e: Throwable =>
        println(s"FAIL $n : ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(400)}")
      }
    }
    spark.stop()
  }
}
