package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbedEvalSpec extends SparkSpec {
  import spark.implicits._

  // three orthogonal planted clusters, three vectors each; intra-cos
  // ≈ 1, inter-cos ≈ 0 — top-2 neighbors are exactly the cluster mates
  private def planted(mislabelLast: Boolean) = {
    def v(axis: Int, jitter: Float) = {
      val a = Array(0f, 0f, 0f); a(axis) = 1f
      a((axis + 1) % 3) = jitter; a
    }
    val rows = for {
      c <- 0 until 3
      j <- 0 until 3
    } yield {
      val lbl = if (mislabelLast && c == 0 && j == 2) 1 else c
      (c * 3L + j, v(c, 0.01f * (j + 1)).toSeq, lbl)
    }
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("neighborPurity: clean planted clusters score exactly 1.0 per label") {
    val out = EmbedEval.neighborPurity(planted(mislabelLast = false),
      "vec_id", "embedding", "label", k = 2).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 3L)
      assert(r.getAs[Long]("n_edges") == 6L)
      assert(r.getAs[Double]("purity") == 1.0)
    }
  }

  test("neighborPurity: one mislabeled vector degrades exactly the affected labels") {
    // cluster 0's third point carries label 1: the two true-0 queries
    // each see {mate(0), mislabeled(1)} → 2/4; label-1 queries are the
    // three true-1 points (all mates match, 6/6) plus the mislabeled
    // point whose neighbors are both label 0 (0/2) → 6/8
    val out = EmbedEval.neighborPurity(planted(mislabelLast = true),
        "vec_id", "embedding", "label", k = 2)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_edges"),
          r.getAs[Double]("purity"))).toMap
    assert(out(0) == ((2L, 4L, 0.5)))
    assert(out(1) == ((4L, 8L, 0.75)))
    assert(out(2) == ((3L, 6L, 1.0)))
  }

  test("neighborPurity is partitioning-invariant") {
    val base = planted(mislabelLast = true)
    val a = EmbedEval.neighborPurity(base, "vec_id", "embedding", "label", 2)
      .collect().map(_.toString).toSeq
    val b = EmbedEval.neighborPurity(base.repartition(7),
        "vec_id", "embedding", "label", 2)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("spearman: concordant = 1, discordant = -1, hand-computed tie case") {
    val up = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.4)).toDF("gold", "model")
    assert(EmbedEval.spearman(up, "gold", "model").collect()(0)
      .getAs[Double]("rho") == 1.0)
    val down = Seq((1L, 0.4), (2L, 0.3), (3L, 0.2), (4L, 0.1)).toDF("gold", "model")
    assert(EmbedEval.spearman(down, "gold", "model").collect()(0)
      .getAs[Double]("rho") == -1.0)
    // min-rank tie case: gold ranks (1,1,3), model ranks (1,2,3) →
    // Σd² = 1, rho = 1 − 6·1/(3·8) = 0.75
    val tied = Seq((1L, 0.1), (1L, 0.2), (2L, 0.3)).toDF("gold", "model")
    val r = EmbedEval.spearman(tied, "gold", "model").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("sum_d2") == 1L)
    assert(r.getAs[Double]("rho") == 0.75)
  }

  test("analogyAccuracy: exact linear structure scores 1.0; corrupted gold and exclusions behave") {
    // v(group, role) = groupVec ⊕ roleVec — offsets are exactly linear,
    // so (g0r0, g0r1, g1r0) must resolve to g1r1 by 3COSADD
    def v(g: Int, r: Int): Seq[Float] = {
      val a = Array.fill(6)(0.1f)
      a(g) = 1.0f; a(3 + r) = 1.0f; a.toSeq
    }
    val vecs = (for { g <- 0 until 3; r <- 0 until 2 }
      yield (g.toLong * 10 + r, v(g, r)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val quads = Seq(
      (0L, 1L, 10L, 11L), // g0r0 : g0r1 :: g1r0 : g1r1
      (0L, 1L, 20L, 21L),
      (10L, 11L, 20L, 21L),
      (1L, 0L, 21L, 20L)) // reversed roles
      .toDF("a", "b", "c", "d")
    val perfect = EmbedEval.analogyAccuracy(vecs, "vec_id", "embedding", quads)
      .collect()(0)
    assert(perfect.getAs[Long]("n_quads") == 4L)
    assert(perfect.getAs[Long]("n_correct") == 4L)
    assert(perfect.getAs[Double]("accuracy") == 1.0)

    // corrupt one gold answer: exactly that quad fails
    val corrupted = quads.withColumn("d",
      when(col("a") === 0L && col("c") === 10L, lit(20L)).otherwise(col("d")))
    val r = EmbedEval.analogyAccuracy(vecs, "vec_id", "embedding", corrupted)
      .collect()(0)
    assert(r.getAs[Long]("n_correct") == 3L)
    assert(r.getAs[Double]("accuracy") == 0.75)

    // exclusion rule: without it, b (closest to b−a+c when offsets
    // are small) could win — a quad whose gold is its own c must lose
    val selfQuad = Seq((0L, 1L, 0L, 1L)).toDF("a", "b", "c", "d")
    // target = b−a+c = v(b); a, b, c excluded → the winner cannot be b
    val s = EmbedEval.analogyAccuracy(vecs, "vec_id", "embedding", selfQuad)
      .collect()(0)
    assert(s.getAs[Long]("n_correct") == 0L)
  }

  test("spearman is row-order and partitioning invariant") {
    val pairs = (0 until 200).map { i =>
      (i.toLong % 17, math.sin(i.toDouble) * 100)
    }.toDF("gold", "model")
    val a = EmbedEval.spearman(pairs, "gold", "model").collect()(0).toString
    val b = EmbedEval.spearman(
      pairs.repartition(11).sortWithinPartitions(desc("model")),
      "gold", "model").collect()(0).toString
    assert(a == b)
  }
}
