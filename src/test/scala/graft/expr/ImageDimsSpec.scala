package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  test("header probe matches the real encoder for png/jpeg/gif/bmp") {
    val cases = Seq(
      ("png", 640, 480), ("jpg", 123, 77), ("gif", 31, 64), ("bmp", 200, 10))
    val df = cases.map { case (f, w, h) => (f, w, h, encoded(f, w, h)) }
      .toDF("fmt", "w", "h", "payload")
    val rows = df.select(col("fmt"), col("w"), col("h"),
        ImageDims.imageDims(col("payload")).as("d"))
      .select("fmt", "w", "h", "d.format", "d.width", "d.height")
      .collect()
    rows.foreach { r =>
      val expectFmt = if (r.getString(0) == "jpg") "jpeg" else r.getString(0)
      assert(r.getString(3) == expectFmt, r.toString)
      assert(r.getInt(4) == r.getInt(1) && r.getInt(5) == r.getInt(2), r.toString)
    }
  }

  test("header probe agrees with full ImageIO decode on dimensions") {
    val payloads = Seq(encoded("png", 48, 96), encoded("jpg", 97, 33))
    payloads.foreach { p =>
      val full = ImageIO.read(new java.io.ByteArrayInputStream(p))
      val packed = Kernels.imageDimsPacked(p)
      assert(((packed >> 24) & 0xffffff) == full.getWidth)
      assert((packed & 0xffffff) == full.getHeight)
    }
  }

  test("hostile payloads are NULL, never an exception") {
    val bad = Seq(
      Array.emptyByteArray,
      "not an image".getBytes("UTF-8"),
      encoded("png", 10, 10).take(12),          // truncated before IHDR
      encoded("jpg", 10, 10).take(3),           // SOI only
      Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x41), // jpeg losing sync
      Array.fill[Byte](64)(0xff.toByte))
    val df = bad.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
    val out = df.select(ImageDims.imageDims(col("payload")).as("d"))
      .where(col("d").isNotNull).count()
    assert(out == 0L)
  }

  test("null payloads pass through as NULL") {
    val df = Seq((1, Option.empty[Array[Byte]]),
      (2, Some(encoded("png", 5, 7)))).toDF("i", "payload")
    val rows = df.select(col("i"), ImageDims.imageDims(col("payload")).as("d"))
      .orderBy("i").collect()
    assert(rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(1))
  }

  test("the probe stays inside whole-stage codegen") {
    // payload must depend on a column, or constant folding collapses
    // the whole projection into a LocalTableScan before codegen
    val a = encoded("png", 5, 7)
    val b = encoded("gif", 9, 4)
    val df = spark.range(4).select(
        when(col("id") % 2 === 0, lit(a)).otherwise(lit(b)).as("payload"))
      .select(ImageDims.imageDims(col("payload")).as("d"))
    // '*(n)' is WholeStageCodegenExec's toString marker; a
    // CodegenFallback expression would strip it from the Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val rows = df.collect() // the generated code compiles and runs
    assert(rows.forall(!_.isNullAt(0)))
  }

  test("SQL surface: image_dims_packed registered") {
    graft.GraftFunctions.register(spark)
    Seq((1, encoded("gif", 21, 9))).toDF("i", "payload")
      .createOrReplaceTempView("img_in")
    val packed = spark.sql("SELECT image_dims_packed(payload) AS p FROM img_in")
      .collect()(0).getLong(0)
    assert((packed >> 48) == 3L)
    assert(((packed >> 24) & 0xffffff) == 21L && (packed & 0xffffff) == 9L)
  }
}
