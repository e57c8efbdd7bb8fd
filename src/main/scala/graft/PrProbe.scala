package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary phase profiler for q_pagerank_suppliers (deleted after use)
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PRPROBE $name%-16s min ${times.min}%.3f s  runs ${times.map(x => f"$x%.2f").mkString(",")}")
    }
    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    def joined = tbl("orders").select("o_orderkey", "o_custkey")
      .join(tbl("lineitem").select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
    println("JOIN ROWS = " + joined.count())
    println("DISTINCT ROWS = " + joined.distinct().count())
    t("join_count") { joined.select(count(lit(1))).head() }
    t("join_distinct") { joined.distinct().select(count(lit(1))).head() }
    t("join_groupByCnt") { joined.groupBy("ck", "sk").agg(count(lit(1))).select(count(lit(1))).head() }
    t("distinct_noAQE") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      joined.distinct().select(count(lit(1))).head()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    joined.distinct().select(count(lit(1))).explain("formatted")
    spark.stop()
  }
}
