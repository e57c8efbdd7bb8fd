package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PDF-source scale smoke: N generated single-page PDFs (FlateDecode
  * content streams — the common real-generator shape — with an
  * id-derived sentence split across Tj and TJ operators), parsed by
  * [[graft.sources.Pdf.extractAll]] over a parquet-backed binary
  * column (the WARC-payload path). The check is EXACT per row: the
  * extracted text must equal the planted sentence, so throughput is
  * measured on verified-correct work. A 10% slice of corrupt payloads
  * rides along to prove per-row isolation at scale. One JSON line →
  * BENCH_SCALE_PDF.json. */
object PdfScaleSmoke {

  private def genPdf(id: Long): Array[Byte] = {
    val words = (0 until 8).map(k =>
      java.lang.Long.toHexString(id * 31 + k * 7 + 11))
    val content = s"BT /F1 12 Tf 72 720 Td (doc $id:) Tj " +
      words.take(4).map(w => s"($w) Tj").mkString(" ") +
      " [" + words.drop(4).map(w => s"($w) -120").mkString(" ") + "] TJ ET"
    val raw = content.getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val k = d.deflate(buf); d.end()
    val body = java.util.Arrays.copyOf(buf, k)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length} /Filter /FlateDecode >> stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    w("trailer << /Size 5 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  private def expectedText(id: Long): String = {
    val words = (0 until 8).map(k =>
      java.lang.Long.toHexString(id * 31 + k * 7 + 11))
    s"doc $id: " + words.take(4).mkString(" ") + " " + words.drop(4).mkString("")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val root = java.nio.file.Files.createTempDirectory("pdf-scale").toString
    spark.range(n).map { id =>
      val payload =
        if (id % 10 == 9) s"junk payload $id".getBytes("UTF-8") // corrupt 10%
        else genPdf(id)
      (s"doc-$id.pdf", id, payload)
    }.toDF("path", "id", "payload")
      .write.mode("overwrite").parquet(s"$root/pdfs")
    val pdfs = spark.read.parquet(s"$root/pdfs")
    val t0 = System.nanoTime()
    val parsed = graft.sources.Pdf.extractAll(pdfs, "path", "payload")
    val okCount = parsed.where(!col("_corrupt")).count()
    val corruptCount = parsed.where(col("_corrupt")).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // exact per-row text check (joined back on the id parsed from path)
    val t1 = System.nanoTime()
    val exact = graft.sources.Pdf.extractAll(pdfs, "path", "payload")
      .where(!col("_corrupt"))
      .select(regexp_extract(col("path"), "doc-(\\d+)", 1)
        .cast("long").as("id"), col("text"))
      .as[(Long, String)]
      .filter { case (id, text) => text == expectedText(id) }
      .count()
    val exactSec = (System.nanoTime() - t1) / 1e9
    val expectOk = n - (n + 0) / 10 // ids ending in 9
    require(okCount == expectOk && corruptCount == n - expectOk,
      s"ok $okCount corrupt $corruptCount of $n")
    require(exact == expectOk, s"exact $exact != $expectOk")
    val json = s"""{"metric":"pdf_scale","docs":$n,"corrupt_planted":${n - expectOk},""" +
      s""""parsed_ok":$okCount,"corrupt_isolated":$corruptCount,""" +
      s""""text_exact":$exact,"parse_sec":${fmt(sec)},""" +
      s""""docs_per_sec":${(okCount / sec).toLong},""" +
      s""""exact_check_sec":${fmt(exactSec)}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SCALE_PDF.json"), json)
    spark.stop()
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
  }
}
