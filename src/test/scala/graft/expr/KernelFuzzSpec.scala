package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz pass over every binary header-walk kernel: crawl payloads are
  * HOSTILE, and the contract everywhere is "degrade to 0/null, never
  * throw". Three generators, all seeded-deterministic:
  *   1. pure random bytes (lengths 0..4096);
  *   2. valid fixtures with random single-byte flips (framing mostly
  *      intact, fields corrupted — the hardest case for cursor math);
  *   3. valid fixtures truncated at every short prefix and random
  *      longer cuts.
  * No Spark session needed — kernels are plain JVM functions. */
class KernelFuzzSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(0xf00dL)

  private def randomBytes(maxLen: Int): Array[Byte] = {
    val b = new Array[Byte](rnd.nextInt(maxLen + 1))
    rnd.nextBytes(b)
    b
  }

  // valid seeds for the mutation/truncation generators
  private def validFixtures: Seq[Array[Byte]] = {
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val wav = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](400)
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 200L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val flac = Array[Byte]('f', 'L', 'a', 'C', 0x80.toByte, 0, 0, 34) ++
      new Array[Byte](34)
    val mp3 = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0) ++
      new Array[Byte](500)
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 13 >> stream\n" +
      "BT (ok) Tj ET\nendstream endobj\ntrailer << /Size 2 >>\n%%EOF\n")
      .getBytes("ISO-8859-1")
    Seq(enc("png"), enc("jpg"), enc("gif"), enc("bmp"), enc("tiff"),
      wav, flac, mp3, pdf)
  }

  private def probes(bytes: Array[Byte]): Unit = {
    Kernels.imageDimsPacked(bytes)
    Kernels.audioMetaPacked(bytes)
    Kernels.exifOrientation(bytes)
    Kernels.exifHasGps(bytes)
    Kernels.stripExifSegments(bytes)
    graft.sources.Pdf.parse("fuzz", bytes)
  }

  test("pure random payloads never throw (2000 cases)") {
    (1 to 2000).foreach(_ => probes(randomBytes(4096)))
  }

  test("single-byte flips of valid fixtures never throw (4000 cases)") {
    val seeds = validFixtures
    (1 to 4000).foreach { _ =>
      val base = seeds(rnd.nextInt(seeds.length))
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      probes(b)
    }
  }

  test("every short truncation of valid fixtures never throws") {
    validFixtures.foreach { base =>
      (0 to math.min(base.length, 128)).foreach(k => probes(base.take(k)))
      (1 to 50).foreach(_ => probes(base.take(rnd.nextInt(base.length + 1))))
    }
  }

  test("langScriptRoute never throws on random UTF-8 and random bytes-as-string") {
    (1 to 1000).foreach { _ =>
      val s = org.apache.spark.unsafe.types.UTF8String
        .fromBytes(randomBytes(512))
      Kernels.langScriptRoute(s)
    }
    // valid multi-script text with random cuts (may split a UTF-8
    // sequence mid-char — the kernel's decoder must not over-read)
    val mixed = "abc да 中文 あ Αθ " +
      "של สว 😀"
    val raw = mixed.getBytes("UTF-8")
    (0 to raw.length).foreach { k =>
      Kernels.langScriptRoute(
        org.apache.spark.unsafe.types.UTF8String.fromBytes(raw.take(k)))
    }
  }

  test("adcTable and adcScore never throw on ragged nested arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (1 to 500).foreach { _ =>
      val dim = rnd.nextInt(20)
      val vec = new GenericArrayData(
        Array.fill[Any](dim)(rnd.nextFloat()))
      val m = rnd.nextInt(5)
      val books = new GenericArrayData(Array.fill[Any](m) {
        val ksub = rnd.nextInt(5)
        new GenericArrayData(Array.fill[Any](ksub) {
          new GenericArrayData(Array.fill[Any](rnd.nextInt(8))(rnd.nextFloat()))
        })
      })
      val tbl = Kernels.adcTable(vec, books)
      if (tbl != null) {
        val codes = new GenericArrayData(
          Array.fill[Any](rnd.nextInt(6))(rnd.nextInt(10)))
        Kernels.adcScore(codes, tbl)
      }
    }
  }
}
