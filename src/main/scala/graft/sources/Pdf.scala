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
  *     strings `<4861…>` behind the same operators decode through the
  *     identical Latin-1 byte→char path UNLESS the document declares
  *     a CID font (/Type0, /CIDFont, /Identity-H anywhere, including
  *     inside decoded object streams) — CID code bytes would be
  *     garbage without CMap/ToUnicode tables, so those documents skip
  *     hex strings entirely and downstream quality gates (mojibake,
  *     langId, gopher) do what they exist for;
  *   - FlateDecode is the only filter decoded (it covers the vast
  *     majority of text content streams); other filters are skipped
  *     and counted;
  *   - compressed object streams (/Type /ObjStm, where PDF 1.5+ puts
  *     most page/object dicts) are inflated and their page/object
  *     counts folded in: `n_pages` adds `/Type /Page` dicts found in
  *     the decoded bytes, `n_objects` adds the stream's declared /N.
  *     Cross-reference streams (/Type /XRef) are never text-extracted
  *     (binary tables, not text) — their W-field object tables ARE
  *     decoded (r15, incl. PNG predictors), and when every xref
  *     stream decodes cleanly the table's in-use + compressed entry
  *     count (later revisions overriding earlier per object id) is
  *     the `n_objects` authority instead of the token scan — the
  *     table knows free slots and superseded objects raw bytes can't;
  *   - object/page counters only look OUTSIDE stream payloads — an
  *     uncompressed stream embedding another PDF (or any payload
  *     containing delimited `obj` bytes) no longer inflates counts;
  *   - encryption is probed where the spec puts /Encrypt — the
  *     trailer dictionary (after the LAST `trailer` keyword) or the
  *     xref-stream dict in the file tail — so a benign document whose
  *     CONTENT merely mentions `/Encrypt` keeps its text. Encrypted
  *     documents yield metadata with `encrypted = true` and NO text
  *     (the bytes are ciphertext).
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

  /** Spans of stream payload bytes, sorted and disjoint (the walk
    * discovers them left to right) — counters skip hits inside. */
  private type Spans = scala.collection.IndexedSeq[(Int, Int)]
  private val NoSpans: Spans = Vector.empty

  /** True when `idx` falls inside one of the sorted disjoint spans.
    * Callers probe in increasing `idx` order; the cursor makes the
    * whole scan linear. */
  private final class SpanCursor(spans: Spans) {
    private var k = 0
    def inside(idx: Int): Boolean = {
      while (k < spans.length && spans(k)._2 <= idx) k += 1
      k < spans.length && idx >= spans(k)._1
    }
  }

  /** Count `/Type /Page` (not /Pages) occurrences — whitespace
    * between name tokens optional per the spec; hits inside stream
    * payload spans don't count (they're data, not object dicts). */
  private def countPages(bytes: Array[Byte], spans: Spans = NoSpans): Int = {
    val t = "/Type".getBytes("US-ASCII")
    val cur = new SpanCursor(spans)
    var i = 0
    var pages = 0
    while ({ i = indexOf(bytes, t, i); i >= 0 }) {
      var j = i + t.length
      while (j < bytes.length && isWs(bytes(j) & 0xff)) j += 1
      if (j + 5 <= bytes.length && bytes(j) == '/' && bytes(j + 1) == 'P' &&
          bytes(j + 2) == 'a' && bytes(j + 3) == 'g' && bytes(j + 4) == 'e' &&
          (j + 5 == bytes.length ||
            isWs(bytes(j + 5) & 0xff) || isDelim(bytes(j + 5) & 0xff)) &&
          !cur.inside(i))
        pages += 1
      i += t.length
    }
    pages
  }

  private def countToken(bytes: Array[Byte], tok: String,
      spans: Spans = NoSpans): Int = {
    val t = tok.getBytes("US-ASCII")
    val cur = new SpanCursor(spans)
    var i = 0
    var c = 0
    while ({ i = indexOf(bytes, t, i); i >= 0 }) {
      val before = if (i == 0) ' '.toInt else bytes(i - 1) & 0xff
      val afterIdx = i + t.length
      val after = if (afterIdx >= bytes.length) ' '.toInt else bytes(afterIdx) & 0xff
      if ((isWs(before) || isDelim(before)) && (isWs(after) || isDelim(after)) &&
        !cur.inside(i)) c += 1
      i += t.length
    }
    c
  }

  /** Last start index of delimited token `tok` in [from, until), or
    * -1. Forward scan — callers pass disjoint windows, so the whole
    * walk stays linear. */
  private def lastTokenBefore(bytes: Array[Byte], tok: String,
      from: Int, until: Int): Int = {
    val t = tok.getBytes("US-ASCII")
    var i = math.max(from, 0)
    var last = -1
    while ({ i = indexOf(bytes, t, i); i >= 0 && i + t.length <= until }) {
      val before = if (i == 0) ' '.toInt else bytes(i - 1) & 0xff
      val afterIdx = i + t.length
      val after = if (afterIdx >= bytes.length) ' '.toInt else bytes(afterIdx) & 0xff
      if ((isWs(before) || isDelim(before)) && (isWs(after) || isDelim(after)))
        last = i
      i += t.length
    }
    last
  }

  /** Parse the `[ i i ... ]` integer array following name token `tok`
    * in [from, until); empty when absent or malformed. Same 9-digit
    * overflow rule as [[parseIntAfter]] (an overflowed element voids
    * the array — a truncated width would misparse every row). */
  private[sources] def parseIntArrayAfter(bytes: Array[Byte], tok: String,
      from: Int, until: Int, cap: Int = 128): Seq[Int] = {
    val t = tok.getBytes("US-ASCII")
    var k = math.max(from, 0)
    while ({ k = indexOf(bytes, t, k); k >= 0 && k < until }) {
      var j = k + t.length
      while (j < until && isWs(bytes(j) & 0xff)) j += 1
      if (j < until && bytes(j) == '[') {
        j += 1
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var bad = false
        var done = false
        while (!done && !bad && j < until && out.length <= cap) {
          while (j < until && isWs(bytes(j) & 0xff)) j += 1
          if (j < until && bytes(j) == ']') { done = true }
          else if (j < until && bytes(j) >= '0' && bytes(j) <= '9') {
            var v = 0
            var overflow = false
            while (j < until && bytes(j) >= '0' && bytes(j) <= '9') {
              if (v < 100000000) v = v * 10 + (bytes(j) - '0')
              else overflow = true
              j += 1
            }
            if (overflow) bad = true else out += v
          } else bad = true
        }
        if (done && !bad) return out.toSeq
        return Seq.empty
      }
      k += t.length
    }
    Seq.empty
  }

  /** Undo a PNG row predictor (filters 0-4, bpp = 1 byte — the
    * Colors 1 / BitsPerComponent 8 shape xref streams use): rows of
    * (1 filter byte + rowLen data). None on size mismatch or an
    * unknown filter type. */
  private def pngUnfilter(data: Array[Byte], rowLen: Int): Option[Array[Byte]] = {
    if (rowLen <= 0 || data.length % (rowLen + 1) != 0) return None
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i > 0) out(dst + i - 1) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) out(dst - rowLen + i - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  /** Decode a /Type /XRef stream's object table (ISO 32000 §7.5.8):
    * fixed-width (type, field2, field3) rows per the dict's /W
    * widths, object numbers from /Index pairs (default `[0 /Size]`),
    * PNG predictors (/Predictor ≥ 10) unfiltered first. Returns
    * (objNum, type) rows — type 0 free, 1 in-use, 2 compressed-in-
    * ObjStm; None on ANY malformation, sending the caller back to the
    * token-scan fallback (object counting is metadata, never worth a
    * throw). */
  private def xrefTable(bytes: Array[Byte], dictFrom: Int, until: Int,
      payload: Array[Byte]): Option[Seq[(Int, Int)]] = {
    val w = parseIntArrayAfter(bytes, "/W", dictFrom, until, cap = 3)
    if (w.length != 3 || w.exists(x => x < 0 || x > 8) || w.sum == 0) return None
    // the TYPE field is 0/1/2 per spec and is accumulated below into
    // an Int via (v << 8) | b — a hostile W[0] of 5-8 would silently
    // overflow into a garbage type value that skews the authoritative
    // object count; treat it as malformation (token-scan fallback)
    if (w(0) > 4) return None
    val rowLen = w.sum
    val size = parseIntAfter(bytes, "/Size", dictFrom, until)
    if (size <= 0 || size > 1000000) return None
    val idx = parseIntArrayAfter(bytes, "/Index", dictFrom, until)
    // absent /Index defaults to [0, Size]; a PRESENT but odd-length
    // one is malformation — fall back rather than guess pair bounds
    val index =
      if (idx.isEmpty) Seq(0, size)
      else if (idx.length % 2 == 0) idx
      else return None
    val pred = parseIntAfter(bytes, "/Predictor", dictFrom, until)
    val data =
      if (pred >= 10) pngUnfilter(payload, rowLen) match {
        case Some(d) => d
        case None => return None
      } else payload
    if (data.length % rowLen != 0) return None
    val nRows = data.length / rowLen
    val expected = index.grouped(2).map(_(1).toLong).sum
    if (expected > nRows || expected > 1000000) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var row = 0
    index.grouped(2).foreach { pair =>
      val start = pair(0)
      var k = 0
      while (k < pair(1)) {
        val off = row * rowLen
        var typ = 1 // W[0] == 0 => type defaults to 1 (spec)
        if (w(0) > 0) {
          var v = 0
          var i = 0
          while (i < w(0)) { v = (v << 8) | (data(off + i) & 0xff); i += 1 }
          typ = v
        }
        out += ((start + k, typ))
        row += 1
        k += 1
      }
    }
    Some(out.toSeq)
  }

  /** Parse the non-negative integer following name token `tok` (e.g.
    * `/N 12`) in [from, until); -1 when absent. A name that merely
    * PREFIXES another (`/N` vs `/Name`) doesn't match — the next byte
    * must be whitespace. A number past the 9-digit cap (a startxref
    * offset in a ≥1 GB file) is OVERFLOW, not a value — returning a
    * truncated prefix would point the caller at an arbitrary byte, so
    * the match is skipped instead. */
  private[sources] def parseIntAfter(bytes: Array[Byte], tok: String,
      from: Int, until: Int): Int = {
    val t = tok.getBytes("US-ASCII")
    var k = math.max(from, 0)
    while ({ k = indexOf(bytes, t, k); k >= 0 && k < until }) {
      var j = k + t.length
      if (j < until && isWs(bytes(j) & 0xff)) {
        while (j < until && isWs(bytes(j) & 0xff)) j += 1
        var v = 0
        var any = false
        var overflow = false
        while (j < until && bytes(j) >= '0' && bytes(j) <= '9') {
          if (v < 100000000) v = v * 10 + (bytes(j) - '0')
          else overflow = true
          any = true; j += 1
        }
        if (any && !overflow) return v
      }
      k += t.length
    }
    -1
  }

  /** Extract text-showing operator strings from one DECODED content
    * stream: literal strings followed by Tj / ' / ", and [ … ] TJ
    * arrays (kerning numbers between elements join with nothing, the
    * standard naive extraction). Latin-1 byte→char for simple fonts.
    * Hex strings `<4861…>` behind the same operators decode through
    * the identical byte→char path when `decodeHex` (the caller turns
    * it off for documents declaring CID fonts, whose hex bytes are
    * CMap codes, not characters). */
  private[sources] def textFromContent(s: Array[Byte], out: StringBuilder,
      decodeHex: Boolean = true): Unit = {
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
        if (i + 1 < n && s(i + 1) == '<') { i += 2 } // dict open: walk on
        else {
          // hex string: pairs of hex digits, whitespace ignored; an
          // odd trailing digit gets a 0 low nibble per spec. A
          // non-hex byte inside marks the string malformed — skipped,
          // never emitted as garbage.
          var k = i + 1
          val sb = new StringBuilder
          var hi = -1
          var bad = false
          while (k < n && s(k) != '>') {
            val h = s(k) & 0xff
            val d =
              if (h >= '0' && h <= '9') h - '0'
              else if (h >= 'A' && h <= 'F') h - 'A' + 10
              else if (h >= 'a' && h <= 'f') h - 'a' + 10
              else if (isWs(h)) -1
              else { bad = true; -1 }
            if (d >= 0) {
              if (hi < 0) hi = d
              else { sb.append(((hi << 4) | d).toChar); hi = -1 }
            }
            k += 1
          }
          if (hi >= 0) sb.append((hi << 4).toChar)
          i = k + 1
          if (decodeHex && !bad && sb.nonEmpty) {
            if (arrayBuf != null) arrayBuf.append(sb)
            else {
              val op = peekOp(i)
              if (op == "Tj" || op == "'" || op == "\"") {
                if (out.nonEmpty) out.append(' ')
                out.append(sb)
              }
            }
          }
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
    // /Encrypt lives in the trailer dictionary (or the xref-stream
    // dict startxref points at) per spec — probing the WHOLE payload
    // misclassified benign documents whose CONTENT mentions /Encrypt
    // (a PDF about PDF encryption) and silently dropped all their
    // text. Probe (a) from the LAST `trailer` keyword to EOF (after
    // the final trailer only dict + startxref + %%EOF remain in a
    // conforming file), and (b) the dict of the object the last
    // `startxref` offset points at (xref-stream PDFs have no
    // `trailer` keyword), clamped at that object's own `stream`
    // keyword so stream payload bytes never match.
    val encrypted = {
      val encTok = "/Encrypt".getBytes("US-ASCII")
      val lastTrailer = lastTokenBefore(bytes, "trailer", 0, n)
      val trailerHit =
        lastTrailer >= 0 && indexOf(bytes, encTok, lastTrailer) >= 0
      val xrefHit = {
        val sx = lastTokenBefore(bytes, "startxref", 0, n)
        val off = if (sx < 0) -1 else parseIntAfter(bytes, "startxref", sx, n)
        off >= 0 && off < n && {
          val streamKw = indexOf(bytes, "stream".getBytes("US-ASCII"), off)
          val until = if (streamKw < 0) math.min(off + 2048, n) else streamKw
          val k = indexOf(bytes, encTok, off)
          k >= 0 && k < until
        }
      }
      trailerHit || xrefHit
    }
    // PASS 1 — stream discovery: find every stream's payload span and
    // classify it from its OWN object's dict (the window runs back to
    // the enclosing `obj` token, clamped past the previous stream's
    // end, so a long dict — DecodeParms, metadata — can't push
    // /Filter out of a fixed-width window, and one object's filter
    // never leaks into the next). /Type /ObjStm streams are inflated
    // HERE: their decoded bytes carry the page/object dicts PDF 1.5+
    // compresses away from the raw scan, plus any CID-font
    // declarations the text pass must know about before it starts.
    val streamTok = "stream".getBytes("US-ASCII")
    val endTok = "endstream".getBytes("US-ASCII")
    val flateTok = "/FlateDecode".getBytes("US-ASCII")
    val filterTok = "/Filter".getBytes("US-ASCII")
    val objStmTok = "/ObjStm".getBytes("US-ASCII")
    val xrefTok = "/XRef".getBytes("US-ASCII")
    // (ds, pe, dictFrom, streamKw, isFlate, hasFilter, kind)
    // kind: 0 content, 1 ObjStm, 2 XRef
    final case class StreamRef(ds: Int, pe: Int, dictFrom: Int,
        kw: Int, isFlate: Boolean, hasFilter: Boolean, kind: Int)
    val streams = scala.collection.mutable.ArrayBuffer.empty[StreamRef]
    var i = 0
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
          val objStart = lastTokenBefore(bytes, "obj", prevEnd, i)
          val dictFrom =
            if (objStart >= 0) objStart else math.max(prevEnd, i - 512)
          def dictHas(tok: Array[Byte]): Boolean = {
            val k = indexOf(bytes, tok, dictFrom); k >= 0 && k < i
          }
          // trim the trailing EOL the spec puts before "endstream"
          var pe = de
          if (pe > ds && bytes(pe - 1) == '\n') pe -= 1
          if (pe > ds && bytes(pe - 1) == '\r') pe -= 1
          val kind =
            if (dictHas(objStmTok)) 1 else if (dictHas(xrefTok)) 2 else 0
          streams += StreamRef(ds, pe, dictFrom, i,
            dictHas(flateTok), dictHas(filterTok), kind)
          i = de + endTok.length
          prevEnd = i
        } else i = n // endstream missing: framing lost, stop the walk
      } else i += streamTok.length
    }
    val spans: Spans = streams.map(s => (s.ds, s.pe)).toVector
    val nStreams = streams.length
    var nFlate = 0
    var nSkipped = 0
    var objStmObjects = 0
    var objStmPages = 0
    val objStmDecoded = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    for (s <- streams if s.kind == 1) {
      val dec =
        if (s.isFlate) { nFlate += 1; inflate(bytes, s.ds, s.pe - s.ds) }
        else if (!s.hasFilter)
          Some(java.util.Arrays.copyOfRange(bytes, s.ds, s.pe))
        else None
      dec match {
        case Some(d) =>
          objStmDecoded += d
          objStmPages += countPages(d)
          val declaredN = parseIntAfter(bytes, "/N", s.dictFrom, s.kw)
          objStmObjects += math.max(declaredN, 0)
        case None => nSkipped += 1
      }
    }
    // CID-font probe decides hex-string handling for the WHOLE doc:
    // raw bytes plus every decoded object stream (where PDF 1.5+
    // keeps font dicts). Conservative by construction — a false
    // positive skips hex text, never emits CMap codes as Latin-1.
    val cidTokens = Seq("/Type0", "/CIDFont", "/Identity-H")
    val cidFonts = cidTokens.exists(t =>
      indexOf(bytes, t.getBytes("US-ASCII"), 0) >= 0 ||
        objStmDecoded.exists(d => indexOf(d, t.getBytes("US-ASCII"), 0) >= 0))
    // PASS 2 — text extraction from content streams only (ObjStm
    // carries dicts, not text operators; XRef payloads are binary
    // tables — both would only add noise).
    val out = new StringBuilder
    for (s <- streams if s.kind == 0) {
      if (s.isFlate) {
        nFlate += 1
        inflate(bytes, s.ds, s.pe - s.ds) match {
          case Some(dec) => textFromContent(dec, out, decodeHex = !cidFonts)
          case None => nSkipped += 1
        }
      } else if (!s.hasFilter) {
        val slice = java.util.Arrays.copyOfRange(bytes, s.ds, s.pe)
        textFromContent(slice, out, decodeHex = !cidFonts)
      } else nSkipped += 1
    }
    // Xref streams (r15): decode the W-field object table — when
    // EVERY xref stream in the file decodes cleanly, the table is the
    // object-count authority (it knows free slots and superseded
    // objects the raw token scan cannot); file order = revision
    // order, so later tables override earlier entries per object id.
    // Any malformed table drops the authority and the token scan
    // stands (counting is metadata, never worth a throw).
    val xrefTypes = scala.collection.mutable.Map.empty[Int, Int]
    var sawXrefTable = false
    var xrefAuthority = true
    for (s <- streams if s.kind == 2) {
      val dec =
        if (s.isFlate) { nFlate += 1; inflate(bytes, s.ds, s.pe - s.ds) }
        else if (!s.hasFilter)
          Some(java.util.Arrays.copyOfRange(bytes, s.ds, s.pe))
        else { nSkipped += 1; None }
      dec.flatMap(d => xrefTable(bytes, s.dictFrom, s.kw, d)) match {
        case Some(entries) =>
          sawXrefTable = true
          entries.foreach { case (o, t) => xrefTypes(o) = t }
        case None => xrefAuthority = false
      }
    }
    // hybrid-reference files (r16): a classic `xref` keyword table
    // outside stream payloads records objects the xref STREAMS never
    // saw — counting only decoded stream entries would drop them, so
    // a classic section anywhere drops the authority and the token
    // scan stands ("startxref" doesn't match: countToken's delimiter
    // guard rejects letter-preceded tokens)
    val classicXref = countToken(bytes, "xref", spans) > 0
    // countToken's delimiter guard already rejects endobj's inner
    // "obj" (preceded by 'd'); payload spans are excluded so embedded
    // documents inside uncompressed streams can't inflate the counts
    val nObjects =
      if (sawXrefTable && xrefAuthority && !classicXref)
        xrefTypes.valuesIterator.count(t => t == 1 || t == 2)
      else countToken(bytes, "obj", spans) + objStmObjects
    val nPages = countPages(bytes, spans) + objStmPages
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
