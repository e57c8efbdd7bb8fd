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

  // WebP containers per the RIFF/VP8 bitstream spec — no JDK encoder
  // exists, so the fixtures are built to the byte layout real encoders
  // emit (frame tag + 9D 01 2A start code for lossy, 2F signature +
  // packed 14-bit dims for lossless, 24-bit canvas for VP8X)
  private def riff(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + payload.length))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(fourcc.getBytes("US-ASCII"))
    out.write(le32(payload.length))
    out.write(payload)
    out.toByteArray
  }
  private def webpLossy(w: Int, h: Int): Array[Byte] =
    riff("VP8 ", Array[Byte](0x30, 0x01, 0x00, // frame tag
      0x9d.toByte, 0x01, 0x2a, // start code
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte))
  private def webpLossless(w: Int, h: Int): Array[Byte] = {
    val b = (w - 1) | ((h - 1) << 14)
    riff("VP8L", Array[Byte](0x2f,
      (b & 0xff).toByte, ((b >> 8) & 0xff).toByte,
      ((b >> 16) & 0xff).toByte, ((b >> 24) & 0xff).toByte))
  }
  private def webpExtended(w: Int, h: Int): Array[Byte] =
    riff("VP8X", Array[Byte](0x02, 0, 0, 0,
      ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
      (((w - 1) >> 16) & 0xff).toByte,
      ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
      (((h - 1) >> 16) & 0xff).toByte))

  test("webp: lossy, lossless, and extended container dims") {
    val cases = Seq(
      (webpLossy(320, 240), 320, 240),
      (webpLossless(800, 600), 800, 600),
      (webpExtended(1920, 1080), 1920, 1080),
      (webpLossless(1, 1), 1, 1),
      (webpLossless(16383, 16383), 16383, 16383)) // 14-bit max
    cases.foreach { case (bytes, w, h) =>
      val p = Kernels.imageDimsPacked(bytes)
      assert((p >> 48) == 5L, s"fmt for ${w}x$h")
      assert(((p >> 24) & 0xffffff) == w && (p & 0xffffff) == h, s"${w}x$h: $p")
    }
  }

  test("tiff: real JDK encoder round-trip (II) plus hand-built MM") {
    // the JDK ships a real TIFF encoder since 9 — same real-encoder
    // discipline as png/jpeg/gif/bmp
    val realTiff = encoded("tiff", 257, 131)
    val p = Kernels.imageDimsPacked(realTiff)
    assert((p >> 48) == 6L, p.toString)
    assert(((p >> 24) & 0xffffff) == 257 && (p & 0xffffff) == 131)
    // big-endian variant: MM header, IFD0 with SHORT width/LONG height
    val mm = new ByteArrayOutputStream()
    def be16(v: Int): Array[Byte] = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Int): Array[Byte] = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    mm.write("MM".getBytes("US-ASCII")); mm.write(be16(42)); mm.write(be32(8))
    mm.write(be16(2)) // 2 IFD entries
    mm.write(be16(0x0100)); mm.write(be16(3)); mm.write(be32(1))
    mm.write(be16(640)); mm.write(be16(0)) // SHORT left-justified
    mm.write(be16(0x0101)); mm.write(be16(4)); mm.write(be32(1))
    mm.write(be32(480))
    mm.write(be32(0)) // next-IFD terminator
    val pm = Kernels.imageDimsPacked(mm.toByteArray)
    assert((pm >> 48) == 6L && ((pm >> 24) & 0xffffff) == 640 &&
      (pm & 0xffffff) == 480, pm.toString)
  }

  test("webp/tiff hostile payloads are NULL, never an exception") {
    val bad = Seq(
      webpLossy(320, 240).take(20),             // truncated before dims
      webpLossless(800, 600).take(22),          // truncated mid-dims
      { val b = webpLossy(320, 240); b(23) = 0x00; b }, // bad start code
      { val b = webpLossless(10, 10); b(20) = 0x30; b }, // bad signature
      riff("VP8Z", Array[Byte](1, 2, 3, 4)),    // unknown chunk
      Array[Byte](0x49, 0x49, 42, 0),           // "II" tiff magic only
      Array[Byte](0x49, 0x49, 42, 0,            // IFD offset beyond eof
        0xff.toByte, 0xff.toByte, 0xff.toByte, 0x00),
      Array[Byte](0x4d, 0x4d, 0, 42, 0, 0, 0, 8, // MM huge count, truncated
        0xff.toByte, 0xff.toByte),
      encoded("tiff", 8, 8).take(9))            // truncated real tiff
    val df = bad.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "payload")
    val out = df.select(ImageDims.imageDims(col("payload")).as("d"))
      .where(col("d").isNotNull).count()
    assert(out == 0L)
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
