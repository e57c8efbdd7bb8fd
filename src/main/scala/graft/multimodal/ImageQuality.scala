package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image quality signals for corpus curation — the "drop blurry /
  * drop flat" gate a vision-training pipeline runs right after
  * decode:
  *
  *  - SHARPNESS = variance of the Laplacian (Pech-Pacheco et al.
  *    2000, the standard focus measure): the 4-neighbor Laplacian
  *    responds to edges; blur suppresses edges, collapsing the
  *    variance. Scale-controlled by downsampling to a bounded grid
  *    first (≤ 256×256 — cost independent of megapixels, the
  *    [[Multimodal.meanLumaOf]] discipline).
  *  - CONTRAST = standard deviation of the luma itself (flat or
  *    near-solid images score ~0 and are usually placeholders).
  *
  * All integer-free arithmetic is plain IEEE doubles over the same
  * sampled grid in a fixed scan order — deterministic everywhere.
  * Undecodable payloads yield null columns (the decode contract). */
object ImageQuality {

  /** (laplacian_var, luma_std) of a decoded image over the bounded
    * sample grid. */
  private[multimodal] def qualityOf(
      img: java.awt.image.BufferedImage): (Double, Double) = {
    val (h, w) = (img.getHeight, img.getWidth)
    val gh = math.min(256, h)
    val gw = math.min(256, w)
    if (gh < 3 || gw < 3) return (0.0, 0.0)
    // sampled luma grid (nearest-pixel, fixed mapping)
    val luma = Array.ofDim[Double](gh, gw)
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        val rgb = img.getRGB(x * w / gw, y * h / gh)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        luma(y)(x) = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        x += 1
      }
      y += 1
    }
    var sumL = 0.0; var sumL2 = 0.0; var n = 0L
    var sumLap = 0.0; var sumLap2 = 0.0; var nLap = 0L
    y = 0
    while (y < gh) {
      var x = 0
      while (x < gw) {
        val v = luma(y)(x)
        sumL += v; sumL2 += v * v; n += 1
        if (y > 0 && y < gh - 1 && x > 0 && x < gw - 1) {
          val lap = luma(y - 1)(x) + luma(y + 1)(x) +
            luma(y)(x - 1) + luma(y)(x + 1) - 4.0 * v
          sumLap += lap; sumLap2 += lap * lap; nLap += 1
        }
        x += 1
      }
      y += 1
    }
    val lumaVar = sumL2 / n - (sumL / n) * (sumL / n)
    val lapVar = sumLap2 / nLap - (sumLap / nLap) * (sumLap / nLap)
    (lapVar, math.sqrt(math.max(0.0, lumaVar)))
  }

  /** Appends `laplacian_var` and `luma_std` (double, null when the
    * payload does not decode) to `df`. One mapPartitions over the
    * binary column — the multimodal per-row kernel convention. */
  def score(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("laplacian_var",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("luma_std",
        org.apache.spark.sql.types.DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val extra: Seq[Any] =
          if (r.isNullAt(idx)) Seq(null, null)
          else {
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](idx)))
              if (img == null) Seq(null, null)
              else {
                val (lap, std) = qualityOf(img)
                Seq[Any](lap, std)
              }
            } catch { case scala.util.control.NonFatal(_) => Seq(null, null) }
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }
}
