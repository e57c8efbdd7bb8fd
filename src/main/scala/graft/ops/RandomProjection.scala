package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns —
  * the cheap dimensionality cut in front of ANN / clustering: project
  * d-dim vectors to k ≪ d dims with a ±1 sign matrix (Achlioptas
  * 2003: database-friendly random projections — ±1 entries preserve
  * pairwise distances in expectation exactly like Gaussians, and
  * multiply-free). A 64→16 cut makes every downstream cosine/distance
  * 4× cheaper while keeping neighbor structure to JL distortion.
  *
  * The sign matrix derives from md5(i:j:salt) — no trained model, no
  * matrix to ship or broadcast: it is a pure function embedded in the
  * plan as a literal, identical on every executor and every engine
  * (DuckDB replays the projection bit-for-bit; see the
  * emb_rp_project oracle). Projection is a narrow codegen'd map —
  * zero shuffle, cost O(d·k) per row; output floor-quantized at 1e-4
  * so the left-to-right fold sum replays exactly.
  */
object RandomProjection {

  /** ±1 sign for matrix cell (i, j): parity of the first hex nibble
    * of md5("i:j:salt") — even → +1.0, odd → -1.0. Must stay in
    * lock-step with the SQL replay
    * `CAST(('0x' || substr(md5(...), 1, 1)) AS INT) % 2`. */
  def sign(i: Int, j: Int, salt: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j:$salt".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
  }

  /** Adds `outCol`: array<double> of length `k`, element j =
    * floor(10⁴ · Σ_i x_i · sign(i,j)) / 10⁴, summed left-to-right
    * (index order) so any engine reproduces the exact doubles.
    * `d` is the input dimension (vectors are validated by use:
    * shorter inputs project their prefix — callers own schema). */
  def project(df: DataFrame, embCol: String, d: Int, k: Int,
      outCol: String = "proj", salt: Long = 0L): DataFrame = {
    require(d > 0 && k > 0 && k <= d, s"need 0 < k <= d, got d=$d k=$k")
    // k column expressions, each a fold over the zipped (x, sign) row;
    // the sign vector per output dim is a plan literal
    val dims: Seq[Column] = (0 until k).map { j =>
      val signs = array((0 until d).map(i => lit(sign(i, j, salt))): _*)
      // trailing +0.0 normalizes -0.0 → 0.0 (a zero vector against
      // all-negative signs folds to -0.0 in a first-element fold but
      // +0.0 in a zero-init fold — engines differ; the add unifies)
      floor(aggregate(
        zip_with(col(embCol).cast("array<double>"), signs, (x, s) => x * s),
        lit(0.0), (acc, v) => acc + v) * 10000) / 10000 + lit(0.0)
    }
    df.withColumn(outCol, array(dims: _*))
  }
}
