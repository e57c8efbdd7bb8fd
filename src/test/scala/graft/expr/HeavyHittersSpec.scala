package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def topItems(rows: Seq[Row]): Map[String, Long] =
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap

  test("true heavy hitters survive any merge order with bounded count error") {
    // 10k rows over 8 partitions: "hot" 30%, "warm" 15%, tail uniform
    // over 200 cold items (~0.27% each)
    val n = 10000
    val df = spark.range(n).repartition(8).select(
      when(col("id") % 10 < 3, "hot")          // %20 ∈ {0,1,2,10,11,12} → 30%
        .when(col("id") % 20 < 6, "warm")      // %20 ∈ {3,4,5}          → 15%
        .otherwise(concat(lit("cold_"), (col("id") % 200).cast("string")))
        .as("item"))
    val out = df.select(HeavyHitters.mgTopK(col("item"), 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.count_lo"))
      .collect().toSeq
    val m = topItems(out)
    assert(out.size <= 16)
    // guarantee: freq > n/(k+1) present; count_lo within n/(k+1) below truth
    val slack = n / 17
    assert(m.contains("hot") && m("hot") <= 3000 && m("hot") >= 3000 - slack)
    assert(m.contains("warm") && m("warm") <= 1500 && m("warm") >= 1500 - slack)
  }

  test("under k distinct items the summary is exact, per group") {
    val df = spark.range(3000).repartition(4).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("v"), (col("id") % 5).cast("string")).as("item"))
    val rows = df.groupBy("g").agg(HeavyHitters.mgTopK(col("item"), 16).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select("g", "e.item", "e.count_lo").collect()
    // 3 groups x 5 items x exactly 200 each
    assert(rows.length === 15)
    rows.foreach(r => assert(r.getLong(2) === 200L, r.toString))
  }

  test("mg_topk aggregates across streaming micro-batches (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().select(col("value").as("item"))
      .agg(HeavyHitters.mgTopK(col("item"), 4).as("hh"))
      .select(col("hh")(0).getField("item").as("top"),
        col("hh")(0).getField("count_lo").as("cnt"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      in.addData("a", "a", "b"); q.processAllAvailable()
      in.addData("a", "c", "c"); q.processAllAvailable()
      val r = spark.table("hh_stream").collect().last
      assert(r.getString(0) === "a" && r.getLong(1) === 3L)
    } finally q.stop()
  }

  test("SQL registration: mg_topk usable from spark.sql") {
    graft.GraftFunctions.register(spark)
    Seq("a", "a", "a", "b").toDF("s").createOrReplaceTempView("hh_in")
    val top = spark.sql("SELECT mg_topk(s, 4)[0].item AS top FROM hh_in")
      .as[String].head()
    assert(top === "a")
  }
}
