package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the classic post-processing
  * pass of the embedding world (Su et al. 2021, "Whitening Sentence
  * Representations"; Jung et al., ICLR'23 on embedding isotropy):
  * anisotropic encoder outputs cluster in a narrow cone, which
  * inflates all cosines and flattens the contrast between near-dups
  * and unrelated pairs; whitening (rotate to the covariance
  * eigenbasis, scale each axis to unit variance) restores isotropy
  * and sharpens every downstream cosine consumer here (near-dup
  * thresholds, ANN recall, centroid outliers).
  *
  * Scale shape: the ONLY corpus pass is one [[graft.expr.VectorOuterSum]]
  * aggregate (mean + second moments at scan speed, one ~dim²-double
  * partial per task on the shuffle). The dim×dim eigenproblem is
  * driver-sized by construction (a 64–4096-dim embedding covariance
  * is KBs–MBs) and solved with a deterministic cyclic Jacobi sweep —
  * no RNG, no iteration-order dependence, bit-stable across runs.
  * Projection back over the corpus is a narrow broadcast-free
  * literal-matrix projection (the model rides the plan as a literal
  * array, exactly like the IVF centroid arrays).
  */
object Pca {

  /** Covariance model: column means, row-major dim×dim covariance
    * (population, /n), eigenvalues descending with matching
    * eigenvectors (rows of `eigvecs`, row-major k×dim). */
  final case class Model(
      dim: Int,
      n: Long,
      means: Array[Double],
      cov: Array[Double],
      eigvals: Array[Double],
      eigvecs: Array[Array[Double]])

  /** One-pass mean + population covariance of `vecCol`
    * (`array<float>`). Null vectors are skipped by the aggregate. */
  def covariance(df: DataFrame, vecCol: String): (Int, Long, Array[Double], Array[Double]) = {
    val row = df.agg(graft.expr.VectorOuterSum.vectorOuterSum(col(vecCol)).as("s"))
      .select(col("s.sums"), col("s.outer"), col("s.n")).head()
    require(!row.isNullAt(2) && row.getLong(2) > 0, "covariance of an empty corpus")
    val sums = row.getSeq[Double](0).toArray
    val outer = row.getSeq[Double](1).toArray
    val n = row.getLong(2)
    val dim = sums.length
    val means = sums.map(_ / n)
    val cov = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        cov(i * dim + j) = outer(i * dim + j) / n - means(i) * means(j)
        j += 1
      }
      i += 1
    }
    (dim, n, means, cov)
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * row-major matrix: sweep the strict upper triangle in a fixed
    * (p, q) order, rotating away each off-diagonal element, until the
    * off-diagonal Frobenius mass drops below `tol` (or `maxSweeps`).
    * O(dim³) per sweep, ~8 sweeps at dim 64 — microseconds of driver
    * time. Returns (eigenvalues, eigenvectors as rows) sorted by
    * eigenvalue descending, each vector's first nonzero component
    * made positive so the basis is sign-deterministic. */
  private[graft] def eigenJacobi(matIn: Array[Double], dim: Int,
                                 maxSweeps: Int = 64,
                                 tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val a = matIn.clone()
    val v = Array.tabulate(dim * dim)(i => if (i % dim == i / dim) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var p = 0
      while (p < dim) { var q = p + 1; while (q < dim) { val x = a(p * dim + q); s += x * x; q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > tol) {
      var p = 0
      while (p < dim) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p * dim + q)
          if (math.abs(apq) > 1e-300) {
            val app = a(p * dim + p); val aqq = a(q * dim + q)
            val theta = (aqq - app) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s0 => s0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // rows/cols p and q of A
            var k = 0
            while (k < dim) {
              val akp = a(k * dim + p); val akq = a(k * dim + q)
              a(k * dim + p) = c * akp - s * akq
              a(k * dim + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p * dim + k); val aqk = a(q * dim + k)
              a(p * dim + k) = c * apk - s * aqk
              a(q * dim + k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < dim) {
              val vkp = v(k * dim + p); val vkq = v(k * dim + q)
              v(k * dim + p) = c * vkp - s * vkq
              v(k * dim + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => -a(i * dim + i))
    val vals = order.map(i => a(i * dim + i)).toArray
    val vecs = order.map { i =>
      val w = Array.tabulate(dim)(k => v(k * dim + i))
      val lead = w.indexWhere(x => math.abs(x) > 1e-12)
      if (lead >= 0 && w(lead) < 0) w.map(-_) else w
    }.toArray
    (vals, vecs)
  }

  /** Fit the covariance + eigenbasis model in one corpus pass. */
  def fit(df: DataFrame, vecCol: String): Model = {
    val (dim, n, means, cov) = covariance(df, vecCol)
    val (vals, vecs) = eigenJacobi(cov, dim)
    Model(dim, n, means, cov, vals, vecs)
  }

  /** Projection column: center on the model means, project onto the
    * top-`k` eigenvectors, optionally scale each component by
    * 1/sqrt(eigenvalue) (whitening). The model enters the plan as
    * literal arrays — a narrow codegen'd projection, no join, no
    * shuffle, no broadcast round trip. Components with eigenvalue
    * ≤ `floor` are zeroed under whitening rather than divided by ~0. */
  def projectCol(vec: Column, model: Model, k: Int,
                 whiten: Boolean, floor: Double = 1e-12): Column = {
    require(k > 0 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    val meansL = lit(model.means)
    val centered = zip_with(vec.cast("array<double>"), meansL, (x, m) => x - m)
    val comps = (0 until k).map { i =>
      val w = lit(model.eigvecs(i))
      val proj = aggregate(zip_with(centered, w, (x, e) => x * e),
        lit(0.0), (acc, x) => acc + x)
      if (!whiten) proj
      else if (model.eigvals(i) <= floor) lit(0.0)
      else proj / lit(math.sqrt(model.eigvals(i)))
    }
    array(comps.map(_.cast("float")): _*)
  }

  /** Append a `pca` column: top-`k` principal components per row. */
  def project(df: DataFrame, vecCol: String, model: Model, k: Int): DataFrame =
    df.withColumn("pca", projectCol(col(vecCol), model, k, whiten = false))

  /** Append a `whitened` column: isotropic top-`k` representation. */
  def whiten(df: DataFrame, vecCol: String, model: Model, k: Int): DataFrame =
    df.withColumn("whitened", projectCol(col(vecCol), model, k, whiten = true))

  /** Fraction of total variance captured by the top-`k` components. */
  def explainedVariance(model: Model, k: Int): Double = {
    val total = model.eigvals.sum
    if (total <= 0) 0.0 else model.eigvals.take(k).sum / total
  }
}
