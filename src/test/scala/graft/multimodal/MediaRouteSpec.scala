package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaRouteSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wav(rate: Float, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def pdf: Array[Byte] =
    "%PDF-1.4\n1 0 obj << /Length 13 >> stream\nBT (x) Tj ET\nendstream endobj\n%%EOF\n"
      .getBytes("ISO-8859-1")

  test("route: one pass classifies, attaches metadata, scrubs") {
    val rows = Seq(
      (1L, png(40, 25)),
      (2L, wav(16000f, 8000)),
      (3L, pdf),
      (4L, "who knows".getBytes("UTF-8")))
    val out = MediaRoute.route(rows.toDF("id", "payload"), "payload")
      .orderBy("id")
      .select("media_format", "width", "height", "sample_rate", "duration_s",
        "exif_gps")
      .collect()
    assert(out(0).getString(0) == "image/png" &&
      out(0).getInt(1) == 40 && out(0).getInt(2) == 25)
    assert(out(0).isNullAt(3)) // no audio meta on an image
    assert(out(1).getString(0) == "audio/wav" &&
      out(1).getInt(3) == 16000 && out(1).getDouble(4) == 0.5)
    assert(out(1).isNullAt(1)) // no dims on audio
    assert(out(2).getString(0) == "pdf")
    assert(out(3).getString(0) == "unknown")
    // exif_gps is a concrete false (not null) for every present payload
    assert((0 to 3).forall(i => !out(i).getBoolean(5)))
  }

  test("payload_clean is reference-identical where the strip no-ops") {
    val p = png(5, 5)
    val got = MediaRoute.route(Seq((1L, p)).toDF("id", "payload"), "payload")
      .select("payload_clean").collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(got, p))
  }

  test("webp is routed image, never claimed by the RIFF audio walk") {
    // VP8L container — RIFF form WEBP, not WAVE
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(17)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(5)
    out.write(0x2f); le32((100 - 1) | ((50 - 1) << 14))
    val got = MediaRoute.route(
        Seq((1L, out.toByteArray)).toDF("id", "payload"), "payload")
      .select("media_format", "width", "height").collect()(0)
    assert(got.getString(0) == "image/webp" &&
      got.getInt(1) == 100 && got.getInt(2) == 50)
  }

  test("the router stays inside whole-stage codegen") {
    val a = png(5, 7)
    val b = wav(8000f, 100)
    val df = spark.range(4).select(
        when(col("id") % 2 === 0, lit(a)).otherwise(lit(b)).as("payload"))
    val routed = MediaRoute.route(df, "payload")
      .select("media_format", "width", "sample_rate")
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(routed.collect().length == 4)
  }
}
