package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF source probe — the one major crawl container this engine had
  * no reader for (WARC/HTML/notebooks/xlsx/fixed-width all exist): a
  * header/metadata walk plus text extraction for the COMMON CASE of
  * unencrypted PDFs with literal-string text operators in plain or
  * FlateDecode content streams. The reference ingests format-sniffed
  * file drops (DM_bankfile_validate_pipeline.py, extension-scenario
  * area); this grows that surface to the container web corpora
  * actually carry (~2-4% of crawl fetches are PDFs).
  *
  * Honest scope, documented rather than papered over:
  *   - literal strings `(…) Tj/'/"` and `[…] TJ` arrays are
  *     extracted, with PDF escape/octal/nested-paren rules; HEX
  *     strings and CID/Type0 fonts (which need CMap/ToUnicode tables)
  *     are NOT mapped — their bytes would be garbage, so they are
  *     skipped and counted, and downstream quality gates (mojibake,
  *     langId, gopher) do what they exist for;
  *   - FlateDecode is the only filter decoded (it covers the vast
  *     majority of text content streams); other filters are skipped
  *     and counted;
  *   - pages inside compressed object streams (/ObjStm) are invisible
  *     to the raw-byte page count — `n_pages` is a lower bound there;
  *   - encrypted documents (/Encrypt in the trailer) yield metadata
  *     with `encrypted = true` and NO text (the bytes are ciphertext).
  *
  * Scale shape: one narrow map over (path, payload) rows — no
  * shuffle, no driver parsing; the unit of parallelism is the file
  * (PDFs are not splittable), exactly the [[Warc]] discipline. Every
  * walk bounds-checks; inflation is capped per stream and per
  * document so a hostile payload (zip bomb, truncated dict, lost
  * framing) degrades to a `_corrupt`/partial row, never an exception
  * and never an OOM. */
object Pdf {

  /** Per-stream inflate cap (decoded bytes) — a content stream past
    * this is a rendering asset or an attack, not text. */
  val MaxStreamBytes: Int = 8 * 1024 * 1024
  /** Per-document extracted-text cap. */
  val MaxTextChars: Int = 4 * 1024 * 1024

  final case class PdfDoc(
      path: String,
      version: String,
      n_objects: Int,
      n_pages: Int,
      encrypted: Boolean,
      n_streams: Int,
      n_flate_streams: Int,
      n_skipped_streams: Int,
      text: String,
      _corrupt: Boolean)

  /** Find the next occurrence of `needle` (ASCII) in `hay` at or
    * after `from`; -1 when absent. */
  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    if (needle.length == 0) return from
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def isDelim(b: Int): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'
  private def isWs(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0

  /** Count `/Type /Page` (not /Pages) occurrences in raw bytes —
    * whitespace between name tokens optional per the spec. */
  private def countPages(bytes: Array[Byte]): Int = {
    val t = "/Type".getBytes("US-ASCII")
    var i = 0
    var pages = 0
    while ({ i = indexOf(bytes, t, i); i >= 0 }) {
      var j = i + t.length
      while (j < bytes.length && isWs(bytes(j) & 0xff)) j += 1
      if (j + 5 <= bytes.length && bytes(j) == '/' && bytes(j + 1) == 'P' &&
          bytes(j + 2) == 'a' && bytes(j + 3) == 'g' && bytes(j + 4) == 'e' &&
          (j + 5 == bytes.length ||
            isWs(bytes(j + 5) & 0xff) || isDelim(bytes(j + 5) & 0xff)))
        pages += 1
      i += t.length
    }
    pages
  }

  private def countToken(bytes: Array[Byte], tok: String): Int = {
    val t = tok.getBytes("US-ASCII")
    var i = 0
    var c = 0
    while ({ i = indexOf(bytes, t, i); i >= 0 }) {
      val before = if (i == 0) ' '.toInt else bytes(i - 1) & 0xff
      val afterIdx = i + t.length
      val after = if (afterIdx >= bytes.length) ' '.toInt else bytes(afterIdx) & 0xff
      if ((isWs(before) || isDelim(before)) && (isWs(after) || isDelim(after))) c += 1
      i += t.length
    }
    c
  }

  /** Extract text-showing operator strings from one DECODED content
    * stream: literal strings followed by Tj / ' / ", and [ … ] TJ
    * arrays (kerning numbers between elements join with nothing, the
    * standard naive extraction). Latin-1 byte→char for simple fonts;
    * hex strings are skipped. */
  private[sources] def textFromContent(s: Array[Byte], out: StringBuilder): Unit = {
    val n = s.length
    var i = 0
    var arrayBuf: StringBuilder = null // inside [ … ] collecting for TJ
    def peekOp(from: Int): String = {
      var k = from
      while (k < n && isWs(s(k) & 0xff)) k += 1
      val start = k
      while (k < n && !isWs(s(k) & 0xff) && !isDelim(s(k) & 0xff) && k - start < 3) k += 1
      if (k == start && start < n) { // single delimiter-class op like '
        val c = s(start) & 0xff
        if (c == '\'') return "'" else return ""
      }
      new String(s, start, k - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    while (i < n && out.length < MaxTextChars) {
      val c = s(i) & 0xff
      if (c == '(') {
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val b = s(i) & 0xff
          if (b == '\\' && i + 1 < n) {
            i += 1
            val e = s(i) & 0xff
            (e: @annotation.switch) match {
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case '(' => sb.append('(')
              case ')' => sb.append(')')
              case '\\' => sb.append('\\')
              case '\n' => () // line continuation
              case '\r' => if (i + 1 < n && s(i + 1) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && i + 1 < n &&
                    s(i + 1) >= '0' && s(i + 1) <= '7') {
                  i += 1; v = v * 8 + (s(i) - '0'); k += 1
                }
                sb.append((v & 0xff).toChar)
              case other => sb.append(other.toChar)
            }
          } else if (b == '(') { depth += 1; sb.append('(') }
          else if (b == ')') { depth -= 1; if (depth > 0) sb.append(')') }
          else sb.append(b.toChar)
          i += 1
        }
        if (arrayBuf != null) arrayBuf.append(sb)
        else {
          val op = peekOp(i)
          if (op == "Tj" || op == "'" || op == "\"") {
            if (out.nonEmpty) out.append(' ')
            out.append(sb)
          }
        }
      } else if (c == '[') { arrayBuf = new StringBuilder; i += 1 }
      else if (c == ']') {
        val op = peekOp(i + 1)
        if (arrayBuf != null && op == "TJ" && arrayBuf.nonEmpty) {
          if (out.nonEmpty) out.append(' ')
          out.append(arrayBuf)
        }
        arrayBuf = null
        i += 1
      } else if (c == '<') {
        // hex string or dict — skip to the matching close (unmapped
        // CID text would be garbage; counted by the caller's skip
        // bookkeeping only at the stream level)
        if (i + 1 < n && s(i + 1) == '<') { i += 2 }
        else {
          var k = i + 1
          while (k < n && s(k) != '>') k += 1
          i = k + 1
        }
      } else if (c == '%') {
        var k = i + 1
        while (k < n && s(k) != '\n' && s(k) != '\r') k += 1
        i = k
      } else i += 1
    }
  }

  private def inflate(data: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data, off, len)
      val out = new java.io.ByteArrayOutputStream(math.min(len * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput() && out.size() < MaxStreamBytes) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, k)
        else if (k == 0 && inf.needsDictionary()) return None
      }
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Parse one PDF payload. Never throws on hostile bytes. */
  def parse(path: String, bytes: Array[Byte]): PdfDoc = {
    val n = bytes.length
    val header = n >= 8 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'
    if (!header)
      return PdfDoc(path, null, 0, 0, encrypted = false, 0, 0, 0, null,
        _corrupt = true)
    val version = {
      var k = 5
      while (k < n && k < 12 && bytes(k) != '\r' && bytes(k) != '\n' &&
        !isWs(bytes(k) & 0xff)) k += 1
      new String(bytes, 5, k - 5, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val encrypted = indexOf(bytes, "/Encrypt".getBytes("US-ASCII"), 0) >= 0
    // countToken's delimiter guard already rejects endobj's inner
    // "obj" (preceded by 'd'), so the token count IS the object count
    val nObjects = countToken(bytes, "obj")
    val nPages = countPages(bytes)
    // stream walk: each "stream" keyword starts payload after CRLF/LF;
    // the dict immediately before decides the filter
    val streamTok = "stream".getBytes("US-ASCII")
    val endTok = "endstream".getBytes("US-ASCII")
    val flateTok = "/FlateDecode".getBytes("US-ASCII")
    val filterTok = "/Filter".getBytes("US-ASCII")
    val out = new StringBuilder
    var i = 0
    var nStreams = 0
    var nFlate = 0
    var nSkipped = 0
    var prevEnd = 0 // end of the previous stream's endstream token
    while (!encrypted && { i = indexOf(bytes, streamTok, i); i >= 0 }) {
      // reject "endstream" matches: token must not be preceded by 'd'
      val before = if (i == 0) ' '.toInt else bytes(i - 1) & 0xff
      if (isWs(before) || isDelim(before)) {
        var ds = i + streamTok.length
        if (ds < n && bytes(ds) == '\r') ds += 1
        if (ds < n && bytes(ds) == '\n') ds += 1
        val de = indexOf(bytes, endTok, ds)
        if (de > ds) {
          nStreams += 1
          // dict scan: at most 512 bytes before "stream", clamped past
          // the PREVIOUS stream's end so one object's /Filter never
          // leaks into the next stream's dict window
          val dictFrom = math.max(prevEnd, i - 512)
          val hasFilter = {
            val k = indexOf(bytes, filterTok, dictFrom); k >= 0 && k < i
          }
          val isFlate = {
            val k = indexOf(bytes, flateTok, dictFrom); k >= 0 && k < i
          }
          // trim the trailing EOL the spec puts before "endstream"
          var pe = de
          if (pe > ds && bytes(pe - 1) == '\n') pe -= 1
          if (pe > ds && bytes(pe - 1) == '\r') pe -= 1
          if (isFlate) {
            nFlate += 1
            inflate(bytes, ds, pe - ds) match {
              case Some(dec) => textFromContent(dec, out)
              case None => nSkipped += 1
            }
          } else if (!hasFilter) {
            val slice = java.util.Arrays.copyOfRange(bytes, ds, pe)
            textFromContent(slice, out)
          } else nSkipped += 1
          i = de + endTok.length
          prevEnd = i
        } else i = n // endstream missing: framing lost, stop the walk
      } else i += streamTok.length
    }
    PdfDoc(path, version, math.max(nObjects, 0), nPages, encrypted,
      nStreams, nFlate, nSkipped,
      if (encrypted) null else out.toString(), _corrupt = false)
  }

  /** One row per (path, payload) input row — the WARC-pipeline entry
    * point (payload column from response records). Narrow map, no
    * shuffle, corrupt isolation per ROW. */
  def extractAll(df: DataFrame, pathCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(pathCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (p, b) =>
        parse(p, if (b == null) Array.emptyByteArray else b) }
      .toDF()
  }

  /** Read every PDF under `glob` (Spark's binaryFile source: one row
    * per file, parallelism = files) and parse. */
  def readDocuments(spark: SparkSession, glob: String): DataFrame =
    extractAll(
      spark.read.format("binaryFile").load(glob)
        .select(col("path"), col("content")),
      "path", "content")
}
