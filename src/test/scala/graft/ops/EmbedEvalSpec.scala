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
