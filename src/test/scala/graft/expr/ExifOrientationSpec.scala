package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExifOrientationSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal JPEG: SOI + one EXIF APP1 with a single IFD0 orientation
    * entry, big- or little-endian TIFF. */
  private def jpegWithExif(orientation: Int, le: Boolean): Array[Byte] = {
    def u16(v: Int): Seq[Byte] =
      if (le) Seq((v & 0xff).toByte, (v >> 8).toByte)
      else Seq((v >> 8).toByte, (v & 0xff).toByte)
    def u32(v: Int): Seq[Byte] =
      if (le) Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24).map(_.toByte)
      else Seq(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).map(_.toByte)
    val order = if (le) Seq('I'.toByte, 'I'.toByte) else Seq('M'.toByte, 'M'.toByte)
    val tiff = order ++ u16(42) ++ u32(8) ++ // header, IFD0 at offset 8
      u16(1) ++ // one entry
      u16(0x0112) ++ u16(3) ++ u32(1) ++ u16(orientation) ++ u16(0)
    val payload = "Exif".getBytes :+ 0.toByte :+ 0.toByte
    val app1 = payload ++ tiff
    val segLen = app1.length + 2
    (Seq(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      (segLen >> 8).toByte, (segLen & 0xff).toByte) ++ app1 ++
      Seq(0xff.toByte, 0xd9.toByte)).toArray
  }

  private def probe(b: Array[Byte]): Option[Int] = {
    val r = Seq(Tuple1(b)).toDF("img")
      .select(ImageDims.exifOrientation(col("img")).as("o")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  test("orientation extracted under both TIFF byte orders") {
    for (o <- Seq(1, 3, 6, 8); le <- Seq(true, false))
      assert(probe(jpegWithExif(o, le)) == Some(o), s"o=$o le=$le")
  }

  test("kernel agrees with the column path; hostile inputs are NULL, never a throw") {
    assert(Kernels.exifOrientation(jpegWithExif(6, le = true)) == 6)
    // no APP1 at all
    assert(probe(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == None)
    // not a JPEG
    assert(probe("PNG..nope".getBytes) == None)
    // out-of-range orientation value
    assert(probe(jpegWithExif(9, le = true)) == None)
    // truncations at every length must never throw; below the end of
    // the APP1 segment (34 bytes here) they must return NULL — at or
    // past it the orientation is legitimately present
    val full = jpegWithExif(6, le = true)
    for (len <- 0 until full.length) {
      val got = Kernels.exifOrientation(full.take(len))
      if (len < 34) assert(got == 0, s"len $len")
      else assert(got == 6, s"len $len")
    }
    // hostile IFD offset: point the directory far outside the segment
    val evil = full.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    assert(Kernels.exifOrientation(evil) == 0)
  }

  test("real JPEGs without EXIF (ImageIO output) probe NULL") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(probe(bos.toByteArray) == None)
  }

  /** Real ImageIO JPEG with a hand-spliced EXIF APP1 carrying an
    * orientation entry and, optionally, a GPS IFD pointer (0x8825) —
    * spliced right after SOI, the layout real cameras emit. */
  private def realJpegWithExif(gps: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(23, 11,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 23).foreach(x => (0 until 11).foreach(y =>
      img.setRGB(x, y, (x * 13 + y * 7) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val base = bos.toByteArray
    def u16(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, (v >> 8).toByte)
    def u32(v: Int): Seq[Byte] =
      Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24).map(_.toByte)
    val nEntries = if (gps) 2 else 1
    val tiff = Seq('I'.toByte, 'I'.toByte) ++ u16(42) ++ u32(8) ++
      u16(nEntries) ++
      u16(0x0112) ++ u16(3) ++ u32(1) ++ u16(6) ++ u16(0) ++
      (if (gps) u16(0x8825) ++ u16(4) ++ u32(1) ++ u32(0) else Seq.empty) ++
      u32(0)
    val app1 = ("Exif".getBytes("US-ASCII") :+ 0.toByte :+ 0.toByte) ++ tiff
    val segLen = app1.length + 2
    (base.take(2) ++
      Seq(0xff.toByte, 0xe1.toByte, (segLen >> 8).toByte, (segLen & 0xff).toByte) ++
      app1 ++ base.drop(2)).toArray
  }

  test("exifHasGps: flags the GPS IFD pointer, false everywhere else") {
    assert(Kernels.exifHasGps(realJpegWithExif(gps = true)))
    assert(!Kernels.exifHasGps(realJpegWithExif(gps = false)))
    assert(!Kernels.exifHasGps(jpegWithExif(6, le = true))) // orientation only
    assert(!Kernels.exifHasGps("not a jpeg".getBytes("UTF-8")))
    val withGps = realJpegWithExif(gps = true)
    (0 to withGps.length by 7).foreach(k =>
      Kernels.exifHasGps(withGps.take(k))) // truncations never throw
    // column path
    val r = Seq(Tuple1(withGps)).toDF("img")
      .select(ImageDims.exifHasGps(col("img"))).collect()(0)
    assert(r.getBoolean(0))
  }

  test("stripExif: APP1 spliced out, image decodes identically, probes go dark") {
    val before = realJpegWithExif(gps = true)
    assert(Kernels.exifHasGps(before) && Kernels.exifOrientation(before) == 6)
    val after = Kernels.stripExifSegments(before)
    assert(after.length < before.length)
    assert(!Kernels.exifHasGps(after))
    assert(Kernels.exifOrientation(after) == 0)
    // the image stream is untouched: full decode agrees before/after
    val da = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(after))
    val db = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(before))
    assert(da.getWidth == db.getWidth && da.getHeight == db.getHeight)
    (0 until da.getWidth).foreach(x => (0 until da.getHeight).foreach(y =>
      assert(da.getRGB(x, y) == db.getRGB(x, y), s"pixel $x,$y")))
    // non-JPEG and unparseable inputs pass through unchanged
    val png = "not jpeg".getBytes("UTF-8")
    assert(Kernels.stripExifSegments(png) eq png)
    val truncated = before.take(9)
    assert(Kernels.stripExifSegments(truncated) eq truncated)
    // a JPEG with no APP1 at all returns the ORIGINAL array (no copy)
    val bos = new java.io.ByteArrayOutputStream()
    val img = new java.awt.image.BufferedImage(5, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val plain = bos.toByteArray
    assert(Kernels.stripExifSegments(plain) eq plain)
    // column path round trip
    val got = Seq(Tuple1(before)).toDF("img")
      .select(ImageDims.stripExif(col("img")).as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(got, after))
  }
}
