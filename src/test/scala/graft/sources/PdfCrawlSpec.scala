package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** END-TO-END composition of the r13 crawl additions: a WARC segment
  * carrying HTML, PDF, image, and junk responses flows through
  * Warc.responses → MediaRoute (format sniff on the payload bytes) →
  * per-type extraction (Pdf.extractAll for PDFs with hyphen-wrapped
  * text, Html.stripHtml for pages) → unwrapLines → the quality gate.
  * The assertion is exact: the planted PDF sentence must survive the
  * whole chain dehyphenated, the HTML text must survive stripping,
  * the image must route as an image, and the junk must flag corrupt —
  * all from ONE WARC file read. */
class PdfCrawlSpec extends SparkSpec {
  import spark.implicits._

  private def record(wtype: String, uri: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    sb.append(s"WARC-Type: $wtype\r\n")
    sb.append(s"WARC-Record-ID: <urn:uuid:$wtype-${String.valueOf(uri).hashCode}>\r\n")
    if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append("WARC-Date: 2026-02-03T04:05:06Z\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes(ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def httpResponse(contentType: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1))
    out.write(body)
    out.toByteArray
  }

  private def pdfWithWrappedText: Array[Byte] = {
    // a PDF literal string may carry RAW newlines — the visual line
    // wraps with hyphen breaks that unwrapLines exists to undo
    val bytes = ("BT /F1 12 Tf (the quick brown document trans-\nformed " +
      "by extraction survives hyphen-\nation intact) Tj ET")
      .getBytes(ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](bytes.length * 2 + 64)
    val k = d.deflate(buf); d.end()
    val body = java.util.Arrays.copyOf(buf, k)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length} /Filter /FlateDecode >> stream\n")
    out.write(body)
    w("\nendstream endobj\n%%EOF\n")
    out.toByteArray
  }

  private def png: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(30, 20,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("WARC -> route -> per-type extraction -> unwrap, end to end") {
    val dir = java.nio.file.Files.createTempDirectory("pdf-crawl").toString
    val warc = new ByteArrayOutputStream()
    warc.write(record("response", "http://x.test/page",
      "application/http; msgtype=response",
      httpResponse("text/html",
        "<html><body><p>hello crawl page</p></body></html>".getBytes(ISO_8859_1))))
    warc.write(record("response", "http://x.test/doc.pdf",
      "application/http; msgtype=response",
      httpResponse("application/pdf", pdfWithWrappedText)))
    warc.write(record("response", "http://x.test/pic.png",
      "application/http; msgtype=response",
      httpResponse("image/png", png)))
    warc.write(record("response", "http://x.test/junk",
      "application/http; msgtype=response",
      httpResponse("application/pdf", "not actually a pdf".getBytes(ISO_8859_1))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/seg.warc"), warc.toByteArray)

    val responses = Warc.responses(spark, s"$dir/seg.warc")
    val routed = graft.multimodal.MediaRoute.route(responses, "body")

    // images route by MAGIC, not by the server's content type
    val img = routed.where(col("media_format").startsWith("image"))
      .select("url", "width", "height").collect()
    assert(img.toSeq.map(r => (r.getString(0), r.getInt(1), r.getInt(2))) ==
      Seq(("http://x.test/pic.png", 30, 20)))

    // PDFs: extract → unwrap → the planted sentence arrives
    // dehyphenated; the junk row (server LIED about the type) flags
    // corrupt instead of poisoning the batch
    val pdfRows = routed.where(col("media_format") === "pdf" ||
        col("content_type").contains("pdf"))
    val extracted = Pdf.extractAll(pdfRows, "url", "body")
    val okDocs = extracted.where(!col("_corrupt"))
      .select(col("path"),
        graft.text.TextAnalysis.unwrapLines(col("text")).as("clean"))
      .as[(String, String)].collect().toMap
    assert(okDocs == Map("http://x.test/doc.pdf" ->
      "the quick brown document transformed by extraction survives hyphenation intact"))
    assert(extracted.where(col("_corrupt")).select("path")
      .as[String].collect().toSeq == Seq("http://x.test/junk"))

    // HTML: strip + gate
    val htmlText = routed.where(col("content_type").contains("text/html"))
      .select(graft.text.Html.stripHtml(col("body").cast("string")).as("t"))
      .as[String].collect()
    assert(htmlText.toSeq == Seq("hello crawl page"))

    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }
}
