package graft.expr

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions._

class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashSig: identical strings → identical signatures; length honored") {
    val df = Seq("abcdefghij", "abcdefghij", "zzzzzzzzzz").toDF("s")
    val sigs = df.select(Exprs.minhashSig(col("s"), 5, 16)).as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 16)
  }

  test("MinHashSig: signature agreement tracks gram overlap") {
    val a = "the quick brown fox jumps over the lazy dog"
    val df = Seq((a, a), (a, "totally unrelated text with different grams")).toDF("x", "y")
    val withSigs = df.select(
      Exprs.minhashSig(col("x"), 5, 32).as("xs"),
      Exprs.minhashSig(col("y"), 5, 32).as("ys"))
    val ns = withSigs.selectExpr("size(filter(zip_with(xs, ys, (p,q) -> p = q), v -> v)) as n")
      .as[Int].collect()
    assert(ns(0) == 32)      // identical
    assert(ns(1) < 8)        // near-zero overlap
  }

  test("KmvSketch: exact below k, approximate above") {
    val small = spark.range(100).select(col("id").cast("string").as("s"))
    val exactish = small.select(KmvSketch.kmvDistinct(col("s"), 256)).as[Long].head()
    assert(exactish == 100L)

    val big = spark.range(100000).select(col("id").cast("string").as("s"))
    val est = big.select(KmvSketch.kmvDistinct(col("s"), 256)).as[Long].head()
    assert(math.abs(est - 100000L) < 15000L, s"estimate $est too far from 100000")
  }

  test("KmvSketch merges across partitions and groups") {
    val df = spark.range(10000).select(
      (col("id") % 4).as("g"), col("id").cast("string").as("s"))
      .repartition(8)
    val perGroup = df.groupBy("g").agg(KmvSketch.kmvDistinct(col("s"), 128).as("d"))
      .as[(Long, Long)].collect().toMap
    perGroup.values.foreach(d => assert(math.abs(d - 2500L) < 600L, s"got $d"))
  }

  test("native argmax_cell matches the composed bestCell formulation exactly") {
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    // corpus: random vectors + zero vectors (NaN cosine path) + exact
    // copies of centroid vectors (rounded-score tie path)
    val cents = Seq.tabulate(8)(i => (i.toLong * 10, vec()))
    // centroids 60 and 70 share a vector: every row scoring them ties
    // and must resolve to the EARLIEST element (min cent_id)
    val tiedCents = cents.take(6) ++ Seq((60L, cents(5)._2), (70L, cents(5)._2))
    val corpus = (Seq.tabulate(200)(i => (i.toLong, vec())) ++
      Seq((900L, Array.fill(16)(0.0f)), (901L, cents(2)._2), (902L, cents(5)._2)))
      .toDF("id", "v")
    val centsDf = tiedCents.toDF("cent_id", "cent_vec")
    val arr = corpus.crossJoin(
      broadcast(graft.ops.Ann.centroidArray(centsDf)))
    val native = arr.select(col("id"),
        graft.ops.Ann.bestCell(col("v"), col("cents")).as("c"))
      .orderBy("id").as[(Long, Long)].collect()
    val hof = arr.select(col("id"),
        graft.ops.Ann.bestCellHof(col("v"), col("cents")).as("c"))
      .orderBy("id").as[(Long, Long)].collect()
    assert(native.sameElements(hof))
    // the tie actually exercised: the shared-vector row lands on the
    // smaller of the two tied centroid ids
    assert(native.find(_._1 == 902L).get._2 == 50L)

    // mistyped centroid ids (int, not long) fail at analysis, not
    // silently through getLong
    val intCents = Seq((1, Array.fill(16)(0.5f))).toDF("cent_id", "cent_vec")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      corpus.crossJoin(broadcast(graft.ops.Ann.centroidArray(intCents)))
        .select(graft.ops.Ann.bestCell(col("v"), col("cents"))).collect()
    }
    assert(e.getMessage.contains("argmax_cell"))
  }

  test("native cosine_sim is bit-identical to the higher-order formulation") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    val pairs = df.select(col("id").as("id1"), col("v").as("v1"))
      .crossJoin(df.select(col("id").as("id2"), col("v").as("v2")))
      .where(col("id1") < col("id2") && col("id2") < col("id1") + 5)
    val native = pairs.select(graft.ops.Ann.cosine(col("v1"), col("v2")).as("c"))
      .as[Double].collect()
    val hof = pairs.select(graft.ops.Ann.cosineHof(col("v1"), col("v2")).as("c"))
      .as[Double].collect()
    assert(native.length == hof.length && native.sameElements(hof)) // exact, no tolerance

    // length mismatch → null (zip_with padding parity)
    val m = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(graft.ops.Ann.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].head()
    assert(m.isEmpty)
  }

  test("native lsh_bucket matches the higher-order formulation exactly") {
    val rnd = new scala.util.Random(21)
    val df = Seq.tabulate(300)(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
    val native = df.select(graft.ops.Ann.lshBucket(col("v"), 8).as("b"))
      .as[Long].collect()
    val hof = df.select(graft.ops.Ann.lshBucketHof(col("v"), 8).as("b"))
      .as[Long].collect()
    assert(native.sameElements(hof))
    assert(native.distinct.length > 1) // buckets actually spread
  }

  test("array expressions reject mistyped inputs at analysis time") {
    // array<double> through cosine_sim must be an analysis error, not
    // garbage floats silently read through getFloat
    val doubles = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(graft.ops.Ann.cosine(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("array<float>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(graft.ops.Ann.lshBucket(col("a"), 8)).collect()
    }
    assert(e2.getMessage.contains("array<float>"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1, 2), Array(1, 2))).toDF("a", "b")
        .select(graft.expr.SigAgreement.sigAgreement(col("a"), col("b"))).collect()
    }
    assert(e3.getMessage.contains("array<bigint>"))
  }

  test("native sig_agreement matches the higher-order formulation exactly") {
    val rnd = new scala.util.Random(5)
    val df = Seq.tabulate(100)(i =>
      (i.toLong, Array.fill(32)(rnd.nextInt(4).toLong))).toDF("id", "sig")
    val pairs = df.select(col("id").as("id1"), col("sig").as("sig1"))
      .crossJoin(df.select(col("id").as("id2"), col("sig").as("sig2")))
      .where(col("id1") < col("id2") && col("id2") < col("id1") + 3)
    val native = pairs.select(
      graft.expr.SigAgreement.sigAgreement(col("sig1"), col("sig2")).as("a"))
      .as[Double].collect()
    val hof = pairs.select(
      expr("size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v)) / size(sig1)").as("a"))
      .as[Double].collect()
    assert(native.length == hof.length && native.sameElements(hof))
  }

  test("quantize_int8: bounded dequant error, exact extremes, zero-vector safe") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),       // all-zero: scale 0
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f))
    ).toDF("id", "vec")
    val rows = df.select(col("id"), col("vec"),
        graft.expr.QuantizeInt8.quantizeInt8(col("vec")).as("qz"))
      .select(col("id"), col("qz.scale").as("scale"), col("qz.q").as("q"),
        graft.expr.QuantizeInt8.dequantize(col("qz.q"), col("qz.scale")).as("back"),
        col("vec"))
      .collect()
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val back = r.getSeq[Float](3)
      val orig = r.getSeq[Float](4)
      assert(q.forall(v => v >= -127 && v <= 127))
      if (r.getLong(0) == 2L) {
        assert(scale == 0.0 && q.forall(_ == 0))
      } else {
        // the max-|v| element must quantize exactly to ±127
        assert(q.map(math.abs).max == 127)
        orig.zip(back).foreach { case (o, b) =>
          assert(math.abs(o - b) <= scale / 2 + 1e-6, s"row $r")
        }
      }
    }
  }

  test("quantize_int8 rejects non-float arrays at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1.0, 2.0)).toDF("v")
        .select(graft.expr.QuantizeInt8.quantizeInt8(col("v"))).collect()
    }
    assert(e.getMessage.contains("quantize_int8"))
  }

  test("topk_by matches the window row_number formulation on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 7}", rnd.nextInt(40).toDouble, i.toLong) // dup scores → tie paths
    }
    val df = rows.toDF("g", "s", "id").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(graft.expr.TopKByScore.topKBy(col("s"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rnk"), col("col.id").as("id"))
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5).select("g", "rnk", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("topk_by partials combine map-side (ObjectHashAggregate, no window sort of the input)") {
    val df = spark.range(1000)
      .select((col("id") % 5).cast("string").as("g"),
        col("id").cast("double").as("s"), col("id").as("i"))
    val plan = df.groupBy("g")
      .agg(graft.expr.TopKByScore.topKBy(col("s"), col("i"), 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topk_by") || plan.contains("partial_topkbyscore"),
      s"expected a partial (map-side) aggregate mode in:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("TopKByScore heap property: random inserts+merges match sort reference") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 200) {
      val k = Seq(1, 2, 3, 5, 8, 32)(rnd.nextInt(6))
      val n = rnd.nextInt(50)
      // few distinct scores → exercise the tie paths hard
      val items = Seq.fill(n)((rnd.nextInt(6).toDouble, rnd.nextInt(40).toLong))
      // random split into sub-buffers merged in random order — models
      // arbitrary partials
      val bufs = Seq.fill(rnd.nextInt(3) + 1)(new TopKByScore.Buf(k))
      items.foreach { case (s, id) => bufs(rnd.nextInt(bufs.size)).insert(s, id) }
      val merged = bufs.reduce { (a, b) =>
        (0 until b.size).foreach(i => a.insert(b.scores(i), b.ids(i))); a
      }
      val got = (0 until merged.size)
        .map(i => (merged.scores(i), merged.ids(i)))
        .sortBy(p => (-p._1, p._2))
      val want = items.sortBy(p => (-p._1, p._2)).take(k)
      assert(got === want, s"trial $trial k=$k n=$n")
    }
  }

  test("topk_by skips NaN scores instead of pinning them in the heap") {
    val df = Seq((1.0, 1L), (Double.NaN, 2L), (3.0, 3L)).toDF("s", "id")
    val top = df.agg(graft.expr.TopKByScore.topKBy(col("s"), col("id"), 2).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.id"))
      .as[Long].collect().toSeq
    assert(top === Seq(3L, 1L))
  }

  test("topk_by treats -0.0 and 0.0 as one score (retention = output ordering)") {
    // heap retention compares with primitive < (-0.0 == 0.0) while
    // eval sorts with the boxed total ordering (-0.0 < 0.0) — without
    // normalization a group holding both can order/retain differently
    val df = Seq((-0.0, 1L), (0.0, 2L), (-0.0, 3L), (0.0, 4L)).toDF("s", "id")
    val rows = df.agg(graft.expr.TopKByScore.topKBy(col("s"), col("id"), 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id")).as[(Double, Long)].collect().toSeq
    // one score class → pure id ascending, and no -0.0 survives
    assert(rows === Seq((0.0, 1L), (0.0, 2L), (0.0, 3L)))
    assert(rows.forall { case (s, _) =>
      java.lang.Double.doubleToRawLongBits(s) == 0L })
  }

  test("topk_by aggregates across streaming micro-batches (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Double, Long)]
    val q = in.toDF().toDF("s", "id")
      .agg(graft.expr.TopKByScore.topKBy(col("s"), col("id"), 2).as("t"))
      .select(col("t")(0).getField("id").as("best"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      in.addData((1.0, 10L), (5.0, 20L)); q.processAllAvailable()
      in.addData((9.0, 30L)); q.processAllAvailable()
      val last = spark.table("topk_stream").collect().last
      assert(last.getLong(0) === 30L)
    } finally q.stop()
  }

  test("SQL registration: minhash_sig and kmv_distinct usable from spark.sql") {
    GraftFunctions.register(spark)
    Seq("hello world document", "hello world document").toDF("text")
      .createOrReplaceTempView("sqldocs")
    val sig = spark.sql("SELECT minhash_sig(text, 5, 8) AS sig FROM sqldocs")
      .as[Seq[Long]].collect()
    assert(sig(0) == sig(1) && sig(0).length == 8)
    val d = spark.sql("SELECT kmv_distinct(text) AS d FROM sqldocs").as[Long].head()
    assert(d == 1L)
  }

  test("SQL registration: topk_rows_by keeps payload rows per group") {
    GraftFunctions.register(spark)
    Seq(("a", 1.0, 1L, "p1"), ("a", 3.0, 2L, "p2"), ("a", 2.0, 3L, "p3"),
        ("b", 9.0, 4L, "p4"))
      .toDF("g", "s", "id", "txt").createOrReplaceTempView("sqlrows")
    val rows = spark.sql(
      """SELECT g, e.id, e.txt FROM (
        |  SELECT g, explode(topk_rows_by(s, id, struct(id, txt), 2)) AS e
        |  FROM sqlrows GROUP BY g)
        |ORDER BY g, e.id""".stripMargin)
      .as[(String, Long, String)].collect().toSeq
    assert(rows == Seq(("a", 2L, "p2"), ("a", 3L, "p3"), ("b", 4L, "p4")))
  }
}
