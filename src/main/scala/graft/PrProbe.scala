package graft
import org.apache.spark.sql.SparkSession

// temporary probe (deleted after use)
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.benchOnlyQueries("ngram_containment_native")(
      spark, "/root/testdata/sf0.1").count()
    println(s"CONTAINMENT_NATIVE rows=$n")
    spark.stop()
  }
}
