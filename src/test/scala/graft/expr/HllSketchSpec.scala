package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: the same xxhash64(seed 42) register
    * construction the aggregate performs, computed sequentially. */
  private def refRegisters(values: Seq[Long], p: Int): Array[Byte] = {
    val regs = new Array[Byte](1 << p)
    values.foreach { v =>
      val h = XXH64.hashLong(v, 42L)
      val idx = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = if (w == 0) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > regs(idx)) regs(idx) = rho.toByte
    }
    regs
  }

  test("estimate matches the sequential reference bit-for-bit") {
    val values = (1L to 50000L).map(_ * 7919L)
    val got = values.toDF("v")
      .agg(HllSketch.hllDistinct($"v", 12).as("e")).collect()(0).getLong(0)
    assert(got == HllSketch.estimate(refRegisters(values, 12), 12))
  }

  test("estimate is within 5% at 100k distinct (p=12, ~1.6% typical)") {
    val got = spark.range(100000)
      .agg(HllSketch.hllDistinct($"id", 12).as("e")).collect()(0).getLong(0)
    assert(math.abs(got - 100000L) < 5000, s"estimate $got")
  }

  test("small-range linear counting is near-exact at 100 distinct") {
    val got = spark.range(100)
      .agg(HllSketch.hllDistinct($"id", 12).as("e")).collect()(0).getLong(0)
    assert(math.abs(got - 100L) <= 2, s"estimate $got")
  }

  test("estimate is partitioning-invariant (register max is exact-mergeable)") {
    val df = spark.range(20000).select(($"id" % 3777).as("v"))
    val e1 = df.repartition(1).agg(HllSketch.hllDistinct($"v", 10)).collect()(0).getLong(0)
    val e8 = df.repartition(8).agg(HllSketch.hllDistinct($"v", 10)).collect()(0).getLong(0)
    assert(e1 == e8)
  }

  test("duplicates do not move the estimate") {
    val once = spark.range(5000).agg(HllSketch.hllDistinct($"id", 12)).collect()(0).getLong(0)
    val dup = spark.range(5000).select(explode(array(lit(1), lit(2), lit(3))), $"id")
      .agg(HllSketch.hllDistinct($"id", 12)).collect()(0).getLong(0)
    assert(once == dup)
  }

  test("nulls are ignored; empty input estimates 0") {
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L), None).toDF("v")
    val e = withNulls.agg(HllSketch.hllDistinct($"v", 12)).collect()(0).getLong(0)
    assert(e == 2L)
    val empty = Seq.empty[Long].toDF("v")
    assert(empty.agg(HllSketch.hllDistinct($"v", 12)).collect()(0).getLong(0) == 0L)
  }

  test("persisted-register union: max-merge of two sketches = sketch of the union") {
    val a = (1L to 3000L)
    val b = (2000L to 6000L)
    val ra = refRegisters(a, 11)
    val rb = refRegisters(b, 11)
    val merged = ra.zip(rb).map { case (x, y) => if (x > y) x else y }
    assert(HllSketch.estimate(merged, 11) ==
      HllSketch.estimate(refRegisters((a ++ b).distinct, 11), 11))
  }

  test("SQL surface: hll_distinct registered and grouped") {
    graft.GraftFunctions.register(spark)
    spark.range(10000).select(($"id" % 4).as("g"), $"id")
      .createOrReplaceTempView("hll_in")
    val rows = spark.sql(
      "SELECT g, hll_distinct(id, 12) AS d FROM hll_in GROUP BY g ORDER BY g").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(math.abs(r.getLong(1) - 2500L) < 200))
  }

  test("registersMd5 matches a sequential md5 reference incl. rho bounds") {
    val values = (1L to 2000L)
    val got = HllSketch.registersMd5(values.toDF("v"), "v", p = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // sequential reference over the same 60-bit md5-derived hash
    val md = java.security.MessageDigest.getInstance("MD5")
    val ref = scala.collection.mutable.Map.empty[Long, Int]
    values.foreach { v =>
      val hex = md.digest(s"$v:0".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h >> 52) & 255
      val w = h & ((1L << 52) - 1)
      val rho = if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > ref.getOrElse(bucket, 0)) ref(bucket) = rho
    }
    assert(got == ref.toMap)
  }

  test("hll_distinct merges per watermarked window in streaming append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val q = in.toDF().toDF("ts", "uid")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(HllSketch.hllDistinct(col("uid"), 12).as("d"))
      .select(col("window.start").as("ws"), col("d"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("append").start()
    try {
      // hour-0 users arrive across two micro-batches with overlap: the
      // closed window's count must come from register MERGE under the
      // watermark, and the overlap must not double-count
      in.addData((0L until 600L).map(i => (ts((i % 60).toInt), i)): _*)
      q.processAllAvailable()
      in.addData((300L until 900L).map(i => (ts((i % 60).toInt), i)): _*)
      q.processAllAvailable()
      in.addData((ts(130), 99999L)); q.processAllAvailable()
      val rows = spark.table("hll_stream").collect()
      assert(rows.length == 1, s"exactly the closed hour-0 window: ${rows.mkString}")
      val d = rows.head.getLong(1)
      // 900 distinct at p=12 → linear-counting regime, near-exact
      assert(math.abs(d - 900L) <= 20, s"distinct estimate $d")
    } finally q.stop()
  }

  test("precision bounds are enforced") {
    intercept[IllegalArgumentException] {
      spark.range(3).agg(HllSketch.hllDistinct($"id", 3)).collect()
    }
    intercept[IllegalArgumentException] {
      HllSketch.registersMd5(spark.range(3).toDF("v"), "v", p = 17)
    }
  }
}
