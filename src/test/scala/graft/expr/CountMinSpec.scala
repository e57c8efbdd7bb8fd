package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate and built-ins query paths hash identically; few-item sketch is exact") {
    // 3 distinct items into a wide sketch → collisions effectively nil,
    // estimates must be EXACT, proving the two hash paths agree
    val df = (Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(7)("gamma"))
      .toDF("item").repartition(8)
    val sk = df.agg(CountMin.cmsSketch(col("item"), 4, 1024).as("sk"))
    val est = sk.select(
      CountMin.cmsQuery(col("sk"), lit("alpha"), 4, 1024).as("a"),
      CountMin.cmsQuery(col("sk"), lit("beta"), 4, 1024).as("b"),
      CountMin.cmsQuery(col("sk"), lit("gamma"), 4, 1024).as("c"),
      CountMin.cmsQuery(col("sk"), lit("absent"), 4, 1024).as("z")).head()
    assert(est.getLong(0) === 500L)
    assert(est.getLong(1) === 300L)
    assert(est.getLong(2) === 7L)
    assert(est.getLong(3) === 0L)
  }

  test("estimates are upper bounds within eps*N under load") {
    val n = 20000
    val df = spark.range(n).repartition(8)
      .select(concat(lit("u"), (col("id") % 500).cast("string")).as("item"))
    val sk = df.agg(CountMin.cmsSketch(col("item"), 4, 256).as("sk")).cache()
    val ests = (0 until 20).map { i =>
      sk.select(CountMin.cmsQuery(col("sk"), lit(s"u$i"), 4, 256)).as[Long].head()
    }
    // true count 40 each; CMS never underestimates, overshoot < e/width * N
    val epsN = math.ceil(math.E / 256 * n).toLong
    ests.foreach { e => assert(e >= 40L && e <= 40L + epsN, s"est $e") }
    sk.unpersist()
  }

  test("SQL registration: cms_sketch usable from spark.sql") {
    graft.GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("s").createOrReplaceTempView("cms_in")
    val sk = spark.sql("SELECT cms_sketch(s, 4, 64) AS sk FROM cms_in")
    val est = sk.select(CountMin.cmsQuery(col("sk"), lit("x"), 4, 64)).as[Long].head()
    assert(est === 2L)
  }

  test("merging stored per-group sketches equals the global sketch") {
    val df = spark.range(4000)
      .select((col("id") % 2).as("g"),
        concat(lit("k"), (col("id") % 97).cast("string")).as("item"))
    val per = df.groupBy("g").agg(CountMin.cmsSketch(col("item"), 4, 512).as("sk"))
      .orderBy("g").collect().map(_.getSeq[Long](1))
    val merged = per(0).zip(per(1)).map { case (a, b) => a + b }
    val global = df.agg(CountMin.cmsSketch(col("item"), 4, 512))
      .head().getSeq[Long](0)
    assert(merged === global)
    // and the Column-level cmsMerge agrees
    val viaCol = df.groupBy("g").agg(CountMin.cmsSketch(col("item"), 4, 512).as("sk"))
      .agg(collect_list("sk").as("l"))
      .select(CountMin.cmsMerge(col("l")(0), col("l")(1)).as("m"))
      .head().getSeq[Long](0)
    assert(viaCol === global)
  }
}
