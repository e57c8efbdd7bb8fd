package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageQualitySpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  /** 3x3 box blur of a checkerboard-pixel function. */
  private def blurred(sharpPix: (Int, Int) => Int)(x: Int, y: Int): Int = {
    val vs = for (dy <- -1 to 1; dx <- -1 to 1)
      yield sharpPix(math.max(0, x + dx), math.max(0, y + dy)) & 0xff
    gray(vs.sum / vs.length)
  }

  test("sharp checkerboard scores far higher Laplacian variance than its blur") {
    def checker(x: Int, y: Int): Int = gray(if ((x + y) % 2 == 0) 230 else 20)
    val docs = Seq(
      (1L, png(64, 64)(checker)),
      (2L, png(64, 64)(blurred(checker)))).toDF("media_id", "payload")
    val out = ImageQuality.score(docs, "payload")
      .select("media_id", "laplacian_var").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L) * 3, out)
  }

  test("flat image scores ~zero on both signals; gradient has contrast but little edge") {
    val docs = Seq(
      (1L, png(64, 64)((_, _) => gray(128))),
      (2L, png(64, 64)((x, _) => gray(x * 4)))).toDF("media_id", "payload")
    val out = ImageQuality.score(docs, "payload")
      .select("media_id", "laplacian_var", "luma_std")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 < 1e-9 && out(1L)._2 < 1e-9, out)
    assert(out(2L)._2 > 0.1, out)
    assert(out(2L)._1 < 0.001, out) // smooth ramp: contrast without edges
  }

  test("undecodable payloads yield nulls, not failures") {
    val docs = Seq((1L, Array[Byte](9, 9, 9)),
      (2L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val out = ImageQuality.score(docs, "payload")
    assert(out.where(col("laplacian_var").isNull).count() == 2)
  }

  test("deterministic across partitionings") {
    def noise(x: Int, y: Int): Int = gray((x * 31 + y * 17) % 251)
    val docs = Seq((1L, png(100, 80)(noise))).toDF("media_id", "payload")
    def run(p: Int) = ImageQuality.score(docs.repartition(p), "payload")
      .select("laplacian_var", "luma_std").as[(Double, Double)].head()
    assert(run(1) == run(5))
  }
}
