package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rankOf(v: Double, n: Int): Long = math.round(v) // data is 0..n-1

  test("buffer rank error stays within 3% of n for k=200") {
    val n = 20000
    val rnd = new scala.util.Random(42)
    val data = rnd.shuffle((0 until n).toVector)
    val buf = new KllSketch.Buffer(200)
    data.foreach(v => buf.add(v.toDouble))
    for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = buf.quantile(p)
      val targetRank = p * n
      assert(math.abs(rankOf(est, n) - targetRank) <= 0.03 * n,
        s"p=$p est=$est target=$targetRank")
    }
  }

  test("merged shard sketches agree with a single-pass sketch within bound") {
    val n = 12000
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle((0 until n).toVector).map(_.toDouble)
    val single = new KllSketch.Buffer(200)
    data.foreach(single.add)
    val shards = data.grouped(n / 8 + 1).map { chunk =>
      val b = new KllSketch.Buffer(200)
      chunk.foreach(b.add)
      b
    }.toVector
    val merged = shards.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.n === n.toLong)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(rankOf(merged.quantile(p), n) - p * n) <= 0.03 * n,
        s"merged p=$p est=${merged.quantile(p)}")
    }
  }

  test("serialize/deserialize round-trips state exactly") {
    val buf = new KllSketch.Buffer(64)
    (0 until 5000).foreach(i => buf.add((i * 37 % 5000).toDouble))
    val back = KllSketch.Buffer.deserialize(buf.serialize())
    assert(back.n === buf.n)
    for (p <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(p) === buf.quantile(p))
  }

  test("kll_quantiles merges per watermarked window in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val q = in.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.GraftFunctions.kll_quantiles(col("v"), Seq(0.5)).as("qs"))
      .select(col("window.start").as("ws"), col("qs")(0).as("p50"))
      .writeStream.format("memory").queryName("kll_stream")
      .outputMode("append").start()
    try {
      // hour-0 values arrive across TWO micro-batches: the final
      // window result must come from sketch MERGE under the watermark,
      // not a single-batch update
      in.addData((0 until 50).map(i => (ts(i % 60), i.toDouble)): _*)
      q.processAllAvailable()
      in.addData((50 until 100).map(i => (ts(i % 60), i.toDouble)): _*)
      q.processAllAvailable()
      // event 2h later pushes the watermark past hour-0 close → append
      in.addData((ts(130), 1000.0)); q.processAllAvailable()
      val rows = spark.table("kll_stream").collect()
      assert(rows.length == 1, s"exactly the closed hour-0 window: ${rows.mkString}")
      val p50 = rows.head.getDouble(1)
      // n=100 at k=200 → the sketch is exact; allow the ±1 rank split
      assert(p50 >= 49.0 && p50 <= 51.0, s"median of 0..99 was $p50")
    } finally q.stop()
  }

  test("SQL kll_quantiles rejects non-literal and mistyped probabilities clearly") {
    graft.GraftFunctions.register(spark)
    spark.range(10).select(col("id").cast("double").as("v"), col("id").as("k"))
      .createOrReplaceTempView("kll_in")
    // probabilities referencing a column are not foldable → must raise
    // the registration's IllegalArgumentException, not a planner error
    val e1 = intercept[Exception] {
      spark.sql("SELECT kll_quantiles(v, array(v)) FROM kll_in").collect()
    }
    assert(e1.getMessage.contains("non-foldable") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-foldable")))
    val e2 = intercept[Exception] {
      spark.sql("SELECT kll_quantiles(v, array('a','b')) FROM kll_in").collect()
    }
    assert(e2.getMessage.contains("array<double>") ||
      Option(e2.getCause).exists(_.getMessage.contains("array<double>")))
  }

  test("distributed agg: partial+merge path matches exact percentiles within bound") {
    val n = 50000
    val df = spark.range(n).repartition(8)
      .select(((col("id") * 2654435761L) % n).cast("double").as("v"))
    val qs = df.agg(
      graft.GraftFunctions.kll_quantiles(col("v"), Seq(0.25, 0.5, 0.75)).as("qs"))
      .as[Seq[Double]].head()
    val exact = df.stat.approxQuantile("v", Array(0.25, 0.5, 0.75), 0.0)
    qs.zip(exact).foreach { case (est, ex) =>
      assert(math.abs(est - ex) <= 0.03 * n, s"est=$est exact=$ex")
    }
  }

  test("SQL registration: kll_quantiles usable from spark.sql, null-safe") {
    graft.GraftFunctions.register(spark)
    spark.range(1000).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("kll_in")
    val row = spark.sql(
      "SELECT kll_quantiles(v, array(0.5D)) AS q FROM kll_in").as[Seq[Double]].head()
    assert(math.abs(row.head - 500.0) <= 50.0)
    val empty = spark.sql(
      "SELECT kll_quantiles(v, array(0.5D)) AS q FROM kll_in WHERE v < 0").head()
    assert(empty.isNullAt(0))
  }
}
