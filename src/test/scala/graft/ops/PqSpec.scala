package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built codebook: ADC table and scores are exact") {
    // m=2, 1-dim subspaces. books: sub0 {0:[0], 1:[1]}, sub1 {0:[2], 1:[5]}
    val model = Seq((0, 0L, Seq(0f)), (0, 1L, Seq(1f)),
      (1, 0L, Seq(2f)), (1, 1L, Seq(5f))).toDF("sub", "cent_id", "cent_vec")
    val corpus = Seq((10L, Seq(1f, 2f)), (11L, Seq(0f, 5f)))
      .toDF("id", "vec")
    val codes = Pq.encode(corpus, "id", "vec", model)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(10L) == Seq(1, 0) && codes(11L) == Seq(0, 1))

    val queries = Seq((99L, Seq(0.5f, 3f))).toDF("id", "vec")
    val top = Pq.adcTopK(Pq.encode(corpus, "id", "vec", model), queries,
        "id", "vec", model, k = 2)
      .orderBy("rnk").as[(Long, Long, Double, Int)].collect()
    // dist(10) = (0.5-1)^2 + (3-2)^2 = 1.25; dist(11) = 0.25 + 4 = 4.25
    assert(top(0) == ((99L, 10L, 1.25, 1)))
    assert(top(1) == ((99L, 11L, 4.25, 2)))
  }

  test("native adc_table equals the composed HOF spec on seeded vectors") {
    // m=4 subspaces of dsub=3, ksub=5 codewords; hash-seeded floats
    val books: Seq[Seq[Seq[Float]]] = (0 until 4).map(s =>
      (0 until 5).map(c => (0 until 3).map(k =>
        ((s * 131 + c * 17 + k * 7) % 23 - 11) / 4.0f)))
    val booksLit = typedlit(books)
    val vecs = (0 until 20).map(i => (i.toLong,
      (0 until 12).map(k => ((i * 37 + k * 13) % 29 - 14) / 5.0f)))
      .toDF("id", "vec")
    val both = vecs.select(col("id"),
        graft.expr.AdcTable.adcTable(col("vec"), booksLit).as("native"),
        Pq.adcTableHof(col("vec"), booksLit, dsub = 3).as("hof"))
      .as[(Long, Seq[Seq[Double]], Seq[Seq[Double]])].collect()
    both.foreach { case (id, n, h) => assert(n == h, s"id $id") }
  }

  test("native adc_table nulls on ragged input instead of throwing") {
    val booksRagged = typedlit(Seq(Seq(Seq(1f, 2f), Seq(3f)))) // 2 vs 1
    val booksOk = typedlit(Seq(Seq(Seq(1f, 2f))))
    val got = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f)))
      .toDF("id", "vec")
      .select(col("id"),
        graft.expr.AdcTable.adcTable(col("vec"), booksRagged).as("a"),
        graft.expr.AdcTable.adcTable(col("vec"), booksOk).as("b"))
      .collect()
    // id 1: dim 3 not divisible by m=1... (3 % 1 == 0 but codeword len
    // 2 != dsub 3) → null either way; ragged books → null
    assert(got.forall(_.isNullAt(1)))
    val byId = got.map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(byId(1L) && !byId(2L)) // dim 2 matches the 2-wide codeword
  }

  test("lossless regime: ksub covers every subvector, ADC == brute L2") {
    // vectors assembled from 4 distinct values per 2-dim subspace
    val vals = Seq(Seq(0f, 0f), Seq(1f, 0f), Seq(0f, 1f), Seq(3f, 3f))
    val corpus = (0 until 40).map { i =>
      (i.toLong, vals(i % 4) ++ vals((i / 4) % 4) ++ vals((i / 16) % 4))
    }.toDF("id", "vec")
    // ksub = |corpus|: every row seeds, so every distinct subvector is
    // a codeword — quantization is guaranteed lossless
    val model = Pq.train(corpus, "id", "vec", m = 3, ksub = 40, iters = 2)
    val queries = Seq((100L, Seq(0.5f, 0f, 1f, 0.2f, 2f, 2f)))
      .toDF("id", "vec")
    val got = Pq.adcTopK(Pq.encode(corpus, "id", "vec", model), queries,
        "id", "vec", model, k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)

    val cvs = corpus.as[(Long, Seq[Float])].collect()
    val qv = Seq(0.5f, 0f, 1f, 0.2f, 2f, 2f)
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val brute = cvs.map { case (id, v) => (id, l2(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(5)
    // same neighbor set and same distances (quantization is lossless
    // here, so ADC distance = true distance up to 6-decimal rounding)
    assert(got.map(_._2).toSeq == brute.map(_._1).toSeq,
      s"got ${got.toSeq} vs $brute")
    got.zip(brute).foreach { case (g, b) =>
      assert(math.abs(g._3 - b._2) < 1e-5, s"$g vs $b")
    }
  }

  test("rerank serving shape matches bruteTopK when the shortlist covers") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(6)(j => ((i * 13 + j * 5) % 17 + 1).toFloat))
    }.toDF("id", "vec")
    val model = Pq.train(corpus, "id", "vec", m = 3, ksub = 8, iters = 3)
    val codes = Pq.encode(corpus, "id", "vec", model)
    val queries = corpus.where(col("id") < 3)
    // shortlist = whole corpus: quantization cannot drop a candidate,
    // so the exact re-rank MUST equal brute cosine
    val got = Pq.adcRerankTopK(codes, corpus, queries, "id", "vec",
        model, k = 5, shortlist = 40)
      .select("query_id", "neighbor_id", "cosine", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Ann.bruteTopK(corpus, queries, "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == want)
  }

  test("ivf-adc with full probe and shortlist equals bruteTopK") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(6)(j => ((i * 13 + j * 5) % 17 + 1).toFloat))
    }.toDF("id", "vec")
    val model = Pq.train(corpus, "id", "vec", m = 3, ksub = 8, iters = 3)
    val cents = Ann.kmeansCentroids(corpus, "id", "vec", k = 4, iters = 3)
    val codes = Pq.encodeWithCells(corpus, "id", "vec", model, cents)
    assert(codes.select(countDistinct(col("cell"))).first().getLong(0) >= 2L)
    val queries = corpus.where(col("id") < 3)
    // probe EVERY cell and shortlist the whole corpus: the IVF and PQ
    // stages cannot drop a candidate, so exact re-rank == brute
    val got = Pq.ivfAdcTopK(codes, corpus, queries, "id", "vec",
        model, cents, k = 5, nprobe = 4, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Ann.bruteTopK(corpus, queries, "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("ivf-adc narrow probe only scans the probed cells") {
    val corpus = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(4)(j => ((i % 3) * 10 + j).toFloat))
    }.toDF("id", "vec")
    val model = Pq.train(corpus, "id", "vec", m = 2, ksub = 8, iters = 2)
    val cents = Ann.kmeansCentroids(corpus, "id", "vec", k = 3, iters = 3)
    val codes = Pq.encodeWithCells(corpus, "id", "vec", model, cents)
    val queries = corpus.where(col("id") === 0)
    val got = Pq.ivfAdcTopK(codes, corpus, queries, "id", "vec",
      model, cents, k = 5, nprobe = 1, shortlist = 60)
      .collect().map(_.getLong(1)).toSet
    // nprobe=1: all results come from the query's own cluster (i%3==0)
    assert(got.nonEmpty && got.forall(_ % 3 == 0), got.toString)
  }

  test("residual ivf-adc: full probe + full shortlist equals brute; codes differ from raw") {
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(6)(j => ((i * 13 + j * 5) % 17 + 1).toFloat))
    }.toDF("id", "vec")
    val cents = Ann.kmeansCentroids(corpus, "id", "vec", k = 4, iters = 3)
    val model = Pq.trainResidual(corpus, "id", "vec", cents, m = 3,
      ksub = 8, iters = 3)
    val codes = Pq.encodeResidualWithCells(corpus, "id", "vec", model, cents)
    val queries = corpus.where(col("id") < 3)
    val got = Pq.ivfAdcResidualTopK(codes, corpus, queries, "id", "vec",
        model, cents, k = 5, nprobe = 4, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Ann.bruteTopK(corpus, queries, "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // residuals must actually be what is encoded: a vector equal to its
    // centroid has residual 0 in every subspace
    val rf = Pq.residualFrame(corpus, "id", "vec", cents)
    assert(rf.count() == 40L)
  }

  test("compression: codes are m small ints") {
    val corpus = (0 until 30).map(i =>
      (i.toLong, Seq.tabulate(8)(j => (i * j % 5).toFloat))).toDF("id", "vec")
    val model = Pq.train(corpus, "id", "vec", m = 4, ksub = 4, iters = 3)
    val codes = Pq.encode(corpus, "id", "vec", model)
    assert(codes.select(max(size(col("codes")))).first().getInt(0) == 4)
    assert(codes.select(max(expr("array_max(codes)"))).first().getInt(0) < 4)
  }

  test("train and encode are deterministic across partitionings") {
    val corpus = (0 until 64).map(i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat)))
      .toDF("id", "vec")
    val m1 = Pq.train(corpus.repartition(1), "id", "vec", 2, 4, 4)
    val m2 = Pq.train(corpus.repartition(7), "id", "vec", 2, 4, 4)
    assert(m1.orderBy("sub", "cent_id").collect().toSeq ==
      m2.orderBy("sub", "cent_id").collect().toSeq)
    val c1 = Pq.encode(corpus, "id", "vec", m1)
      .as[(Long, Seq[Int])].collect().toMap
    val c2 = Pq.encode(corpus.repartition(5), "id", "vec", m2)
      .as[(Long, Seq[Int])].collect().toMap
    assert(c1 == c2)
  }

  test("dim not divisible by m is rejected") {
    val corpus = Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      Pq.train(corpus, "id", "vec", m = 2, ksub = 2, iters = 1)
    }
  }
}
