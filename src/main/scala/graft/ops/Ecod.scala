package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ECOD-style anomaly scoring for embedding corpora — the
  * unsupervised outlier detector from "ECOD: Unsupervised Outlier
  * Detection Using Empirical Cumulative Distribution Functions" (Li
  * et al., TKDE 2022), reduced to its engine-reproducible skeleton:
  * a vector is anomalous when it sits in the tail of MANY
  * per-dimension empirical CDFs. Instead of the paper's
  * -log(tail-probability) sum (float-order-sensitive), the score is
  * the integer tail DEPTH — per dimension,
  * `min(#{x <= v}, #{x >= v})` over the corpus — summed across
  * dimensions as an exact BIGINT. Small depth = extreme in many
  * dimensions; rank-equivalent to the paper's score under a
  * per-dimension monotone map, and bit-identical on any engine or
  * partitioning.
  *
  * Scale shape: values are quantized to `1/quant` grid cells FIRST,
  * so the per-dimension CDF lives on a (dim, cell) frame bounded by
  * `dims x quant x range` — NOT corpus-sized. One explode+groupBy
  * builds the cell histogram, one window per dim (over the small
  * histogram frame only) turns it into a cumulative, and the
  * broadcast-joined lookup prices every vector. No corpus-wide sort,
  * no per-dim global window over raw rows.
  */
object Ecod {

  /** Integer tail depth per vector. `emb`: id + array<float> column.
    * `quant`: grid cells per unit (depth then measures ties at the
    * grid resolution — two values in one cell are tied by design).
    * Output: `(id-named-as-input, depth BIGINT)`. */
  def depths(emb: DataFrame, idCol: String, vecCol: String,
      quant: Int = 1000): DataFrame = {
    require(quant >= 1, s"quant $quant must be >= 1")
    val n = emb.count()
    val ex = emb.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col(idCol), col("dim"),
        floor(col("v").cast("double") * quant).cast("long").as("qv"))
    val counts = ex.groupBy("dim", "qv").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("dim").orderBy("qv")
    val cdf = counts.withColumn("cumle", sum("cnt").over(w))
      .select(col("dim"), col("qv"),
        least(col("cumle"),
          lit(n) - (col("cumle") - col("cnt"))).as("cell_depth"))
    ex.join(broadcast(cdf), Seq("dim", "qv"))
      .groupBy(col(idCol)).agg(sum("cell_depth").as("depth"))
  }
}
