package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PdfSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal spec-valid single-page PDF with the given content
    * stream; `flate` compresses it like real generators do. */
  private def pdf(content: String, flate: Boolean = true,
      encrypt: Boolean = false): Array[Byte] = {
    val raw = content.getBytes("ISO-8859-1")
    val body =
      if (flate) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length * 2 + 64)
        val k = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, k)
      } else raw
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val enc = if (encrypt) " /Encrypt 9 0 R" else ""
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${body.length}$filter >> stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    w(s"trailer << /Size 5 /Root 1 0 R$enc >>\nstartxref\n0\n%%EOF\n")
    out.toByteArray
  }

  test("flate and plain content streams: Tj, quote ops, and TJ arrays") {
    val content = "BT /F1 12 Tf 72 720 Td (Hello) Tj (world) ' " +
      "[(ker) -120 (ning)] TJ 0 0 (again) \" ET"
    for (flate <- Seq(true, false)) {
      val doc = Pdf.parse("p", pdf(content, flate))
      assert(!doc._corrupt && !doc.encrypted)
      assert(doc.version == "1.4")
      assert(doc.n_pages == 1, doc.toString) // /Pages does NOT count
      assert(doc.n_objects == 4)
      assert(doc.n_streams == 1)
      assert(doc.n_flate_streams == (if (flate) 1 else 0))
      assert(doc.text == "Hello world kerning again", s"'${doc.text}'")
    }
  }

  test("escapes: nested parens, octal, line continuation, specials") {
    val content = "BT (a\\(b\\)c) Tj ((nested) ok) Tj (\\101\\102) Tj " +
      "(li\\\nne) Tj (t\\tab) Tj ET"
    val doc = Pdf.parse("p", pdf(content))
    assert(doc.text == "a(b)c (nested) ok AB line t\tab", s"'${doc.text}'")
  }

  test("strings NOT followed by a text operator are ignored") {
    val content = "/Title (not shown) BT (shown) Tj ET"
    val doc = Pdf.parse("p", pdf(content))
    assert(doc.text == "shown", s"'${doc.text}'")
  }

  test("hex strings decode through the Latin-1 path for simple fonts") {
    // <48656C6C6F> = Hello; whitespace inside ignored; odd trailing
    // digit pads a 0 low nibble (<7> = 0x70 = p); TJ arrays mix hex
    // and literal elements
    val content = "BT <48656C6C6F> Tj (lit) Tj <77 6F 72> Tj <7> Tj " +
      "[<6B65> (r) <6E>] TJ ET"
    val doc = Pdf.parse("p", pdf(content))
    assert(doc.text == "Hello lit wor p kern", s"'${doc.text}'")
  }

  test("hex escape parity: hex and literal spell the same bytes") {
    val lit = Pdf.parse("p", pdf("BT (AB\\tC) Tj ET"))
    val hex = Pdf.parse("p", pdf("BT <41420943> Tj ET"))
    assert(lit.text == "AB\tC" && hex.text == lit.text,
      s"'${lit.text}' vs '${hex.text}'")
  }

  test("hex strings NOT behind a text operator, or malformed, stay out") {
    val doc = Pdf.parse("p", pdf("BT <4869> (yes) Tj <4X69> Tj ET"))
    // <4869> has no operator; <4X69> is malformed
    assert(doc.text == "yes", s"'${doc.text}'")
  }

  test("CID font declared: hex strings are skipped (CMap codes, not chars)") {
    // the font dict is a RAW object (where real PDFs put it) — the
    // document-level probe must flip hex decoding off for the doc
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Font /Subtype /Type0 /Encoding /Identity-H >> endobj\n")
    w("2 0 obj << /Length 33 >> stream\nBT <0048> Tj (literal ok) Tj ET\nendstream endobj\n")
    w("%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.text == "literal ok", s"'${doc.text}'")
  }

  test("/Encrypt in a content stream does NOT flag the doc encrypted") {
    // the r13 finding: the whole-payload probe lost ALL text of any
    // benign document that merely mentions /Encrypt in its content
    val content = "BT (how the /Encrypt dictionary works) Tj ET"
    val doc = Pdf.parse("p", pdf(content, flate = false))
    assert(!doc.encrypted, "content-stream /Encrypt must not flag")
    assert(doc.text == "how the /Encrypt dictionary works", s"'${doc.text}'")
  }

  test("/Encrypt in the trailer still detects (both helper paths)") {
    assert(Pdf.parse("p", pdf("BT (s) Tj ET", encrypt = true)).encrypted)
  }

  test("10+ digit integers are overflow, not a truncated prefix") {
    // a ≥1 GB file's startxref doesn't fit the 9-digit parse cap; a
    // truncated prefix would aim the /Encrypt probe at an arbitrary
    // byte — the match must be skipped instead
    def p(s: String) = {
      val b = s.getBytes("ISO-8859-1")
      Pdf.parseIntAfter(b, "startxref", 0, b.length)
    }
    assert(p("startxref\n10000000001\n%%EOF") == -1)
    // a later in-range occurrence still parses after a skipped one
    assert(p("startxref\n10000000001\nstartxref\n42\n%%EOF") == 42)
    // leading zeros are magnitude, not overflow
    assert(p("startxref\n0000000042\n%%EOF") == 42)
    // the cap's largest parseable value survives
    assert(p("startxref\n999999999\n%%EOF") == 999999999)
    // end-to-end: an overflowed startxref never locates a probe window
    val body = "%PDF-1.4 /Encrypt 1 0 R padding " +
      "1 0 obj << /Type /Page >> endobj " +
      "startxref\n10000000001\n%%EOF"
    val doc = Pdf.parse("p", body.getBytes("ISO-8859-1"))
    assert(!doc.encrypted, "overflowed startxref must not locate a probe window")
  }

  test("long dict (>512 bytes) before stream: /Filter still found") {
    // the r13 ADVICE finding: a fixed 512-byte window treated streams
    // with long dicts (DecodeParms/metadata) as unfiltered and fed
    // raw deflate bytes to the text walk
    val pad = "/Meta (" + ("x" * 700) + ")"
    val raw = "BT (deep dict) Tj ET".getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val k = d.deflate(buf); d.end()
    val body = java.util.Arrays.copyOf(buf, k)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w(s"1 0 obj << /Filter /FlateDecode $pad /Length ${body.length} >> stream\n")
    out.write(body)
    w("\nendstream endobj\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_flate_streams == 1, doc.toString)
    assert(doc.text == "deep dict", s"'${doc.text}'")
    assert(doc.n_skipped_streams == 0)
  }

  test("/Type /ObjStm: pages and objects inside the stream are counted") {
    // PDF 1.5+ layout: page dicts live inside a compressed object
    // stream; the raw-byte scan sees none of them
    val inner = "3 0 <</Type /Pages /Kids [4 0 R 5 0 R] /Count 2>> " +
      "4 0 <</Type /Page /Parent 3 0 R>> 5 0 <</Type /Page /Parent 3 0 R>>"
    val innerBytes = inner.getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(innerBytes); d.finish()
    val buf = new Array[Byte](innerBytes.length * 2 + 64)
    val k = d.deflate(buf); d.end()
    val body = java.util.Arrays.copyOf(buf, k)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"2 0 obj << /Type /ObjStm /N 3 /First 10 /Filter /FlateDecode " +
      s"/Length ${body.length} >> stream\n")
    out.write(body)
    w("\nendstream endobj\n")
    w("6 0 obj << /Length 14 >> stream\nBT (pg) Tj ET\nendstream endobj\n")
    w("%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_pages == 2, doc.toString)          // both INSIDE the ObjStm
    assert(doc.n_objects == 2 + 3, doc.toString)    // 2 raw + /N 3 compressed
    assert(doc.text == "pg", s"'${doc.text}'")      // ObjStm adds no text
    assert(doc.n_skipped_streams == 0)
  }

  test("xref stream W-field table is the object-count authority") {
    // 4 live objects (1 catalog, 2 pages, 3 page, 4 the xref stream)
    // plus a STALE '5 0 obj' body superseded by the table (type 0
    // free) — the token scan says 5, the xref table says 4
    def rows(entries: Seq[(Int, Int, Int)]): Array[Byte] =
      entries.flatMap { case (t, f2, f3) =>
        Seq(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte, f3.toByte)
      }.toArray
    val table = rows(Seq((0, 0, 255), (1, 10, 0), (1, 20, 0), (1, 30, 0),
      (1, 40, 0), (0, 0, 0))) // obj 0 free, 1-4 in use, 5 FREE
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R >> endobj\n")
    w("5 0 obj << /Stale (superseded revision) >> endobj\n")
    w(s"4 0 obj << /Type /XRef /Size 6 /W [1 2 1] " +
      s"/Length ${table.length} >> stream\n")
    out.write(table)
    w("\nendstream endobj\nstartxref\n0\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 4, doc.toString)
    assert(doc.n_pages == 1, doc.toString)
  }

  test("xref stream with PNG Up predictor and /Index decodes exactly") {
    // table covers objects [2..5): 2,3 in use, 4 compressed (type 2)
    // — compressed entries COUNT (they live in an ObjStm); raw rows
    // Up-filtered (PNG type 2) before encoding
    val raw = Seq[Array[Int]](
      Array(1, 0, 10, 0), Array(1, 0, 20, 0), Array(2, 0, 1, 0))
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = Array(0, 0, 0, 0)
    raw.foreach { row =>
      filtered.write(2) // PNG Up
      row.zip(prev).foreach { case (cur, up) =>
        filtered.write((cur - up) & 0xff)
      }
      prev = row
    }
    val table = filtered.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("2 0 obj << /Type /Page >> endobj\n")
    w("3 0 obj << /Type /Page >> endobj\n")
    w(s"6 0 obj << /Type /XRef /Size 5 /W [1 2 1] /Index [2 3] " +
      s"/DecodeParms << /Predictor 12 /Columns 4 >> " +
      s"/Length ${table.length} >> stream\n")
    out.write(table)
    w("\nendstream endobj\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 3, doc.toString) // 2,3 in-use + 4 compressed
  }

  test("malformed xref table falls back to the token scan, never throws") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Page >> endobj\n")
    // /W sums to 4 but the payload is 3 bytes — size mismatch
    w("2 0 obj << /Type /XRef /Size 2 /W [1 2 1] /Length 3 >> stream\n")
    out.write(Array[Byte](1, 0, 9))
    w("\nendstream endobj\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 2, doc.toString) // token scan: objects 1 and 2
    assert(doc.n_pages == 1)
  }

  test("hybrid classic-xref + xref-stream file drops the stream authority") {
    // a classic 'xref' keyword section records object 9 that the xref
    // STREAM never saw — stream-only counting would report 2; the
    // classic section must drop the authority so the token scan (3
    // objects) stands
    def rows(entries: Seq[(Int, Int, Int)]): Array[Byte] =
      entries.flatMap { case (t, f2, f3) =>
        Seq(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte, f3.toByte)
      }.toArray
    val table = rows(Seq((0, 0, 255), (1, 10, 0), (1, 20, 0)))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Page >> endobj\n")
    w("9 0 obj << /OnlyInClassicSection true >> endobj\n")
    w("xref\n0 1\n0000000000 65535 f \n9 1\n0000000052 00000 n \n")
    w("trailer << /Size 10 >>\n")
    w(s"2 0 obj << /Type /XRef /Size 3 /W [1 2 1] " +
      s"/Length ${table.length} >> stream\n")
    out.write(table)
    w("\nendstream endobj\nstartxref\n0\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 3, doc.toString) // token scan: 1, 9, 2
  }

  test("hostile /W type width over 4 bytes is malformation, not garbage counts") {
    // W[0]=5 would accumulate the type field into an Int with
    // (v << 8) | b and silently overflow — must fall back to the
    // token scan instead of reporting a skewed authoritative count
    val table = Array.fill[Byte](16)(1) // 2 rows of W [5 2 1]
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Page >> endobj\n")
    w(s"2 0 obj << /Type /XRef /Size 2 /W [5 2 1] " +
      s"/Length ${table.length} >> stream\n")
    out.write(table)
    w("\nendstream endobj\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 2, doc.toString) // token scan: objects 1 and 2
  }

  test("uncompressed stream embedding another PDF does not inflate counts") {
    val embedded = "%PDF-1.1\n7 0 obj <</Type /Page>> endobj\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Page >> endobj\n")
    w(s"2 0 obj << /Length ${embedded.length} >> stream\n")
    w(embedded)
    w("\nendstream endobj\n%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_objects == 2, doc.toString) // not the embedded '7 0 obj'
    assert(doc.n_pages == 1, doc.toString)   // not the embedded /Type /Page
  }

  test("encrypted: metadata yes, text no") {
    val doc = Pdf.parse("p", pdf("BT (secret) Tj ET", encrypt = true))
    assert(doc.encrypted && doc.text == null && !doc._corrupt)
    assert(doc.version == "1.4")
  }

  test("unknown filter streams are skipped and counted, not decoded") {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.7\n")
    w("1 0 obj << /Length 4 /Filter /DCTDecode >> stream\n" +
      "\u00ff\u00d8\u00ff\u00e0\nendstream endobj\n")
    w("2 0 obj << /Length 13 >> stream\nBT (ok) Tj ET\nendstream endobj\n")
    w("%%EOF\n")
    val doc = Pdf.parse("p", out.toByteArray)
    assert(doc.n_streams == 2 && doc.n_skipped_streams == 1)
    assert(doc.text == "ok", s"'${doc.text}'")
  }

  test("hostile payloads degrade per row, never an exception") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "not a pdf at all".getBytes("UTF-8"),
      pdf("BT (x) Tj ET").take(20),                   // truncated mid-object
      {                                               // corrupt deflate bytes
        val b = pdf("BT (x) Tj ET"); b(b.length / 2) = 0x00; b
      },
      "%PDF-1.5\nstream\n".getBytes("UTF-8"),         // stream, no endstream
      ("%PDF-1.5\n1 0 obj << /Length 3 >> stream\n(((" +
        "\nendstream endobj\n").getBytes("UTF-8"),    // unterminated string
      // hostile xref-stream dicts (r15 W-field decode paths): every
      // malformation must fall back to the token scan, never throw
      ("%PDF-1.5\n1 0 obj << /Type /XRef /Size 2 /W [9 9 9] /Length 4 " +
        ">> stream\nABCD\nendstream endobj\n").getBytes("UTF-8"), // widths > 8
      ("%PDF-1.5\n1 0 obj << /Type /XRef /Size 2 /W [1 2 1] /Index [5] " +
        "/Length 8 >> stream\nABCDEFGH\nendstream endobj\n")
        .getBytes("UTF-8"),                           // odd /Index
      ("%PDF-1.5\n1 0 obj << /Type /XRef /Size 999999999 /W [1 2 1] " +
        "/Length 4 >> stream\nABCD\nendstream endobj\n")
        .getBytes("UTF-8"),                           // insane /Size
      ("%PDF-1.5\n1 0 obj << /Type /XRef /Size 2 /W [1 2 1] " +
        "/DecodeParms << /Predictor 12 /Columns 4 >> /Length 7 " +
        ">> stream\n	ABCDEF\nendstream endobj\n")
        .getBytes("ISO-8859-1"),                      // bad predictor rows
      ("%PDF-1.5\n1 0 obj << /Type /XRef /Size 2 /W [0 0 0] /Length 4 " +
        ">> stream\nABCD\nendstream endobj\n").getBytes("UTF-8")) // zero widths
    val docs = cases.map(Pdf.parse("p", _))
    assert(docs(0)._corrupt && docs(1)._corrupt)
    assert(docs.drop(2).forall(!_._corrupt)) // framing survives, partial data
    // the malformed-xref rows fell back to the token scan (1 obj each)
    assert(docs.drop(6).forall(_.n_objects == 1), docs.drop(6).mkString("\n"))
  }

  test("extractAll: corrupt isolation per row on a mixed frame") {
    val rows = Seq(
      ("a.pdf", pdf("BT (alpha doc) Tj ET")),
      ("b.pdf", "garbage".getBytes("UTF-8")),
      ("c.pdf", pdf("BT (gamma doc) Tj ET", flate = false)))
    val got = Pdf.extractAll(rows.toDF("path", "payload"), "path", "payload")
      .orderBy("path")
      .select("path", "text", "_corrupt")
      .collect()
    assert(got(0).getString(1) == "alpha doc" && !got(0).getBoolean(2))
    assert(got(1).isNullAt(1) && got(1).getBoolean(2))
    assert(got(2).getString(1) == "gamma doc" && !got(2).getBoolean(2))
  }

  test("readDocuments: binaryFile glob, one row per file") {
    val dir = java.nio.file.Files.createTempDirectory("pdf-spec")
    try {
      java.nio.file.Files.write(dir.resolve("one.pdf"),
        pdf("BT (first file) Tj ET"))
      java.nio.file.Files.write(dir.resolve("two.pdf"),
        pdf("BT (second file) Tj ET"))
      val got = Pdf.readDocuments(spark, s"$dir/*.pdf")
        .select("text").as[String].collect().sorted.toSeq
      assert(got == Seq("first file", "second file"))
    } finally {
      new scala.reflect.io.Directory(dir.toFile).deleteRecursively()
    }
  }
}
