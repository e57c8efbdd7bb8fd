package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // planted 2-factor corpus in 6 dims: x = a*u + b*w + tiny noise,
  // u/w orthogonal, var(a)=16 >> var(b)=1 — PCA must recover u then w
  private val u = Array(1.0, 0.0, 1.0, 0.0, 1.0, 0.0).map(_ / math.sqrt(3))
  private val w = Array(0.0, 1.0, 0.0, -1.0, 0.0, 0.0).map(_ / math.sqrt(2))
  private def planted(n: Int) = (0 until n).map { i =>
    val rnd = new scala.util.Random(42 + i)
    val a = rnd.nextGaussian() * 4.0
    val b = rnd.nextGaussian() * 1.0
    val vec = Array.tabulate(6)(d =>
      (a * u(d) + b * w(d) + rnd.nextGaussian() * 0.01).toFloat)
    (i.toLong, vec)
  }.toDF("vec_id", "embedding")

  test("eigenJacobi: exact eigenpairs of a known symmetric matrix") {
    // diag(3,1) rotated by 45°: eigvals 3,1; eigvecs (1,1)/√2, (1,-1)/√2
    val m = Array(2.0, 1.0, 1.0, 2.0)
    val (vals, vecs) = Pca.eigenJacobi(m, 2)
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2)
    assert(vecs(0).zip(Array(r2, r2)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    assert(vecs(1).zip(Array(r2, -r2)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // identity: all eigvals 1, basis vectors sign-normalized
    val (iv, _) = Pca.eigenJacobi(Array(1.0, 0.0, 0.0, 1.0), 2)
    assert(iv.forall(x => math.abs(x - 1.0) < 1e-12))
  }

  test("covariance matches a hand-computed small case and is invariant to partitioning") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 6.0f)), (3L, Array(5.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val (dim, n, means, cov) = Pca.covariance(df, "embedding")
    assert(dim == 2 && n == 3)
    assert(means.zip(Array(3.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // population covariance: var(x)=8/3, var(y)=8/3, cov=4/3
    assert(math.abs(cov(0) - 8.0 / 3) < 1e-12)
    assert(math.abs(cov(3) - 8.0 / 3) < 1e-12)
    assert(math.abs(cov(1) - 4.0 / 3) < 1e-12 && math.abs(cov(2) - 4.0 / 3) < 1e-12)
    val (_, _, _, cov8) = Pca.covariance(df.repartition(8), "embedding")
    assert(cov8.zip(cov).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      "merge path must equal single-partition fold")
  }

  test("fit recovers planted factor directions in variance order") {
    val model = Pca.fit(planted(2000), "embedding")
    assert(model.n == 2000 && model.dim == 6)
    // variance order: factor a >> factor b >> noise floor
    assert(model.eigvals(0) > 5 * model.eigvals(1) &&
      model.eigvals(1) > 50 * model.eigvals(2) && model.eigvals(2) < 0.01,
      model.eigvals.mkString(","))
    def align(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
    assert(align(model.eigvecs(0), u) > 0.999, "top component must be u")
    assert(align(model.eigvecs(1), w) > 0.999, "second component must be w")
    assert(Pca.explainedVariance(model, 2) > 0.999)
  }

  test("whitening makes the projected corpus isotropic") {
    val df = planted(2000)
    val model = Pca.fit(df, "embedding")
    val white = Pca.whiten(df, "embedding", model, k = 2)
    val (dim2, n2, means2, cov2) = Pca.covariance(white, "whitened")
    assert(dim2 == 2 && n2 == 2000)
    assert(means2.forall(m => math.abs(m) < 1e-3), means2.mkString(","))
    // unit variance on both axes, ~zero cross-covariance
    assert(math.abs(cov2(0) - 1.0) < 1e-2 && math.abs(cov2(3) - 1.0) < 1e-2)
    assert(math.abs(cov2(1)) < 1e-2)
    // plain projection keeps the original variances instead
    val proj = Pca.project(df, "embedding", model, k = 2)
    val (_, _, _, covP) = Pca.covariance(proj, "pca")
    assert(math.abs(covP(0) - model.eigvals(0)) < 0.05 * model.eigvals(0))
  }

  test("projection is a narrow plan: no shuffle, no join") {
    val df = planted(200)
    val model = Pca.fit(df, "embedding")
    val plan = Pca.whiten(df, "embedding", model, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("fit is deterministic across runs") {
    val a = Pca.fit(planted(500), "embedding")
    val b = Pca.fit(planted(500), "embedding")
    assert(a.eigvals.sameElements(b.eigvals))
    assert(a.eigvecs.zip(b.eigvecs).forall { case (x, y) => x.sameElements(y) })
  }
}
