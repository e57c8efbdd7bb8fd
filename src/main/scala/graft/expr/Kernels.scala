package graft.expr

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted eval paths and the
  * generated code of [[MinHashSig]] / [[SimHash64]] / [[CosineSimF]]
  * (Scala objects emit static forwarders, so generated Java can call
  * `graft.expr.Kernels.minhashSig(...)` directly). */
object Kernels {

  /** Fused cosine similarity over two float arrays, accumulated in
    * double precision in index order — bit-identical to the sequential
    * `aggregate(zip_with(...))` higher-order formulation it replaces
    * (three independent sequential sums, same IEEE op order), but one
    * tight loop instead of interpreted lambda calls per element.
    * Boxed null iff lengths differ (zip_with's null-padding would
    * yield null there too). */
  def cosineF(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Spark `round(x, 6)` for doubles, exactly: the string-based
    * BigDecimal.valueOf (Spark's Round uses scala BigDecimal(double),
    * which delegates to the same valueOf) with HALF_UP; NaN/±Inf pass
    * through like Round's guard. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fused IVF cell assignment: argmax over a centroid array of
    * `round(cosine(vec, cent_vec), 6)`, ties and all-null scores
    * resolving to the EARLIEST element — bit-identical to the
    * composed `array_max(transform(cents, (c,i) -> struct(round(cos),
    * -i, cent_id)))` form it replaces ([[graft.ops.Ann.bestCellHof]]):
    * Double.compare ranks NaN above every value (Spark's total order),
    * strict `>` keeps the earliest on ties (max of -i), and a null
    * cosine (length mismatch) ranks below any score (null-first struct
    * order). One tight loop, vec consumed once per centroid with no
    * per-element lambda dispatch or struct allocation — the build-side
    * hot path of every IVF assignment (k × dim multiply-adds per
    * corpus row).
    *
    * `cents` must be array<struct<cent_id: long, cent_vec:
    * array<float>>> (the [[graft.ops.Ann.centroidArray]] shape). */
  def argmaxCosineCell(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                       cents: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val m = cents.numElements()
    if (m == 0) return null
    val n = vec.numElements()
    // the query norm is identical for every centroid — accumulate it
    // ONCE (same independent sequential sum as cosineF's na, so the
    // value is bit-identical) instead of re-deriving it per cell;
    // per-cell work drops from three fused accumulators to two
    var na = 0.0
    var j = 0
    while (j < n) { val x = vec.getFloat(j).toDouble; na += x * x; j += 1 }
    val sqrtNa = math.sqrt(na)
    var bestScore = 0.0
    var bestHasScore = false
    var bestId = 0L
    var i = 0
    while (i < m) {
      val c = cents.getStruct(i, 2)
      val cv = c.getArray(1)
      val score: java.lang.Double =
        if (cv.numElements() != n) null
        else {
          var dot = 0.0; var nb = 0.0; var k = 0
          while (k < n) {
            val x = vec.getFloat(k).toDouble
            val y = cv.getFloat(k).toDouble
            dot += x * y; nb += y * y
            k += 1
          }
          java.lang.Double.valueOf(round6(dot / (sqrtNa * math.sqrt(nb))))
        }
      if (i == 0) {
        bestId = c.getLong(0)
        if (score != null) { bestHasScore = true; bestScore = score.doubleValue() }
      } else if (score != null &&
          (!bestHasScore || java.lang.Double.compare(score.doubleValue(), bestScore) > 0)) {
        bestHasScore = true; bestScore = score.doubleValue(); bestId = c.getLong(0)
      }
      i += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  /** L2 argmin cell assignment — [[argmaxCosineCell]]'s squared-
    * euclidean sibling, the product-quantization encode kernel: PQ
    * subquantizers minimize L2 on raw subvectors (cosine would
    * re-normalize each subvector and distort the codebook). Distances
    * are rounded to 6 decimals before comparison (replay parity with
    * every other scored kernel here); ties go to the smaller cent_id;
    * dimension-mismatched centroids are skipped; empty codebook or
    * no valid centroid → null. */
  def argminL2Cell(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                   cents: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long = {
    val m = cents.numElements()
    if (m == 0) return null
    val n = vec.numElements()
    var bestScore = 0.0
    var bestHas = false
    var bestId = 0L
    var i = 0
    while (i < m) {
      val c = cents.getStruct(i, 2)
      val cv = c.getArray(1)
      if (cv.numElements() == n) {
        var d2 = 0.0
        var k = 0
        while (k < n) {
          val d = vec.getFloat(k).toDouble - cv.getFloat(k).toDouble
          d2 += d * d
          k += 1
        }
        val s = round6(d2)
        val id = c.getLong(0)
        if (!bestHas || java.lang.Double.compare(s, bestScore) < 0 ||
            (java.lang.Double.compare(s, bestScore) == 0 && id < bestId)) {
          bestHas = true; bestScore = s; bestId = id
        }
      }
      i += 1
    }
    if (!bestHas) null else java.lang.Long.valueOf(bestId)
  }

  /** Asymmetric-distance (ADC) score: `sum_s table[s][codes[s]]` — the
    * product-quantization probe kernel. `codes` is array<int> of
    * length m; `table` is array<array<double>> (m rows of ksub
    * per-codeword distances, precomputed once per query). Returns null
    * on ragged input (code out of a row's range or m mismatch) —
    * hostile inputs degrade to null, never an exception. */
  def adcScore(codes: org.apache.spark.sql.catalyst.util.ArrayData,
               table: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m != table.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      val row = table.getArray(i)
      if (row == null) return null // null sub-array: degrade, don't NPE
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements()) return null
      s += row.getDouble(c)
      i += 1
    }
    java.lang.Double.valueOf(round6(s))
  }

  /** ADC table build: `out[s][c] = Σ_k (vec[s·dsub+k] − books[s][c][k])²`
    * — the per-(query, cell) table the residual IVFADC probe needs
    * query·nprobe times (the raw probe builds it once per query). The
    * composed transform/zip_with/aggregate form pays m·ksub nested
    * interpreted lambda dispatches per row — measured as the residual
    * probe's dominant cost (17.5 s → sub-second table stage at 100k).
    * Float subtraction/multiply then double accumulation, mirroring
    * the HOF lambda's type chain exactly (PqSpec pins equivalence).
    * Null on ragged input: m = 0, vec length not m·dsub, or any
    * codeword length ≠ dsub. */
  def adcTable(vec: org.apache.spark.sql.catalyst.util.ArrayData,
               books: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = books.numElements()
    if (m == 0) return null
    val dim = vec.numElements()
    if (dim % m != 0) return null
    val dsub = dim / m
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val bs = books.getArray(s)
      // containsNull inputs pass checkInputDataTypes: a null sub-book
      // or codeword degrades to null like the HOF spec, never NPEs
      if (bs == null) return null
      val ksub = bs.numElements()
      val row = new Array[Any](ksub)
      var c = 0
      while (c < ksub) {
        val cw = bs.getArray(c)
        if (cw == null || cw.numElements() != dsub) return null
        var acc = 0.0
        var k = 0
        val off = s * dsub
        while (k < dsub) {
          val d = vec.getFloat(off + k) - cw.getFloat(k)
          val e = d * d
          acc += e.toDouble
          k += 1
        }
        row(c) = acc
        c += 1
      }
      rows(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Script routing for language ID in ONE UTF-8 byte pass — replaces
    * eighteen per-script `regexp_count` scans per row (the langId
    * front door runs over every document of a corpus). Counts code
    * points in the eighteen BMP script ranges of
    * [[graft.text.TextAnalysis.langScriptRanges]] (sorted name
    * order), picks the argmax with ties to the LARGER index — the
    * same winner as the composed struct-max over (hits, name), since
    * the names are sorted. Returns -1 when no script chars at all;
    * else bestIdx (0-17) | 0x100 when any kana was seen (the ja/zh
    * discriminator — a FLAG bit above the 5-bit index space, so
    * index 17 can never collide with it). Non-BMP code points count
    * nowhere, exactly like the char-class regexes. */
  def langScriptRoute(s: UTF8String): Int = {
    val n = s.numBytes
    val counts = new Array[Int](18)
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { len = 2; cp = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { len = 3; cp = b0 & 0x0f }
      else { len = 4; cp = b0 & 0x07 }
      var k = 1
      while (k < len && i + k < n) {
        cp = (cp << 6) | (s.getByte(i + k) & 0x3f)
        k += 1
      }
      i += len
      // indices = sorted langScriptRanges order:
      // 0 arabic, 1 bengali, 2 cyrillic, 3 devanagari, 4 greek,
      // 5 gujarati, 6 gurmukhi, 7 han, 8 hangul, 9 hebrew, 10 kana,
      // 11 kannada, 12 latin, 13 malayalam, 14 oriya, 15 tamil,
      // 16 telugu, 17 thai
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
          (cp >= 0xc0 && cp <= 0x24f)) counts(12) += 1
      else if (cp >= 0x400 && cp <= 0x4ff) counts(2) += 1
      else if (cp >= 0x370 && cp <= 0x3ff) counts(4) += 1
      else if (cp >= 0x600 && cp <= 0x6ff) counts(0) += 1
      else if (cp >= 0x590 && cp <= 0x5ff) counts(9) += 1
      else if (cp >= 0x900 && cp <= 0xd7f) {
        // the nine Indic 0x80-wide blocks U+0900..U+0D7F in layout
        // order: devanagari, bengali, gurmukhi, gujarati, oriya,
        // tamil, telugu, kannada, malayalam (r16: Odia routed —
        // single-language script, top-40 web language)
        counts(indicBlockIdx((cp - 0x900) >> 7)) += 1
      }
      else if (cp >= 0xe00 && cp <= 0xe7f) counts(17) += 1
      else if (cp >= 0x3040 && cp <= 0x30ff) counts(10) += 1
      else if (cp >= 0x4e00 && cp <= 0x9fff) counts(7) += 1
      else if (cp >= 0xac00 && cp <= 0xd7af) counts(8) += 1
    }
    var best = -1
    var bestC = 0
    var j = 0
    while (j < 18) {
      // >= keeps the LAST max: sorted names, so ties go to the
      // lexicographically-largest name like the struct-max spec
      if (counts(j) > 0 && counts(j) >= bestC) { best = j; bestC = counts(j) }
      j += 1
    }
    if (best < 0) -1
    else best | (if (counts(10) > 0) 0x100 else 0)
  }

  /** (cp - 0x900) >> 7 → script index for the contiguous Indic block
    * run — all nine blocks routed as of r16 (oriya was the gap). */
  private[this] val indicBlockIdx: Array[Int] =
    Array(3, 1, 6, 5, 14, 15, 16, 11, 13)

  // ------------------------------------------------------------------ //
  // Validation-rule kernels: allocation-free single-pass predicates
  // over UTF8String bytes. The Column formulations they replace
  // (trim-and-compare, translate-and-length, java.util.regex) allocate
  // per row per rule — at a ~68-rule stack that is the difference
  // between scan-bound and 3x slower. Each kernel's equivalence to its
  // regex/Column spec is pinned by property tests (StringCheckSpec).
  // ------------------------------------------------------------------ //

  /** trim(s) == "" without the trim allocation — Spark's SQL trim
    * strips ASCII space (0x20) ONLY, so a tab-only string is NOT
    * blank; this mirrors that exactly. */
  def isBlankStr(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) { if (s.getByte(i) != 0x20) return false; i += 1 }
    true
  }

  /** Every byte's bit set in the 128-bit ASCII mask (m0 = bytes 0-63,
    * m1 = 64-127); any non-ASCII byte fails — identical to a regex
    * char class / translate over an ASCII allowed set. */
  def allInSet(s: UTF8String, m0: Long, m1: Long): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b >= 128) return false
      val ok = if (b < 64) ((m0 >>> b) & 1L) == 1L else ((m1 >>> (b - 64)) & 1L) == 1L
      if (!ok) return false
      i += 1
    }
    true
  }

  /** Count of bytes whose bit is set in the 128-bit ASCII mask —
    * value-identical to `regexp_count(s, "[<class>]")` for an
    * ASCII-only single-char class: ASCII chars are single UTF-8 bytes,
    * every byte of a multi-byte sequence has the high bit set (never
    * in the mask), and an ASCII class can never match a non-ASCII
    * char, so counting mask-member BYTES counts exactly the regex's
    * per-char matches. */
  def countInSet(s: UTF8String, m0: Long, m1: Long): Int = {
    val n = s.numBytes
    var cnt = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 64) cnt += ((m0 >>> b) & 1L).toInt
      else if (b < 128) cnt += ((m1 >>> (b - 64)) & 1L).toInt
      i += 1
    }
    cnt
  }

  private def isDigitB(b: Int): Boolean = b >= '0' && b <= '9'
  private def isAlphaB(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  /** java.util.regex \s = [ \t\n\x0B\f\r] (ASCII only). */
  private def isWsB(b: Int): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Exact DFA of `^\+?[0-9().\-\s]+(x[0-9]+)?$`. */
  def isPhone(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    if (i < n && s.getByte(i) == '+') i += 1
    val start = i
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (isDigitB(b) || b == '(' || b == ')' || b == '.' || b == '-' || isWsB(b)) i += 1
      else if (b >= 128) return false
      else {
        // only a trailing x<digits...> extension may follow
        if (b != 'x' || i == start) return false
        i += 1
        if (i == n) return false
        while (i < n) { if (!isDigitB(s.getByte(i) & 0xff)) return false; i += 1 }
        return true
      }
    }
    i > start
  }

  /** Exact match of `^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$`:
    * local part, '@', then a domain whose last '.' is followed by >= 2
    * letters and preceded by >= 1 domain-class char (any earlier '.'
    * split the regex could pick implies this one works too). */
  def isEmail(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    // local part
    var nl = 0
    while (i < n && {
      val b = s.getByte(i) & 0xff
      isAlphaB(b) || isDigitB(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
    }) { i += 1; nl += 1 }
    if (nl == 0 || i >= n || s.getByte(i) != '@') return false
    i += 1
    val domStart = i
    var lastDot = -1
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (!(isAlphaB(b) || isDigitB(b) || b == '.' || b == '-')) return false
      if (b == '.') lastDot = i
      i += 1
    }
    if (lastDot < domStart + 1 || n - lastDot - 1 < 2) return false
    var j = lastDot + 1
    while (j < n) { if (!isAlphaB(s.getByte(j) & 0xff)) return false; j += 1 }
    true
  }

  /** Strict `yyyy-MM-dd` calendar validity in one pass: 4-2-2 digit
    * format AND a real proleptic-Gregorian date (leap-aware), exactly
    * what `regexp ^\d{4}-\d{2}-\d{2}$` + non-null
    * `try_to_date(c, 'yyyy-MM-dd')` accepts. */
  def isYmdDate(s: UTF8String): Boolean = {
    if (s.numBytes != 10) return false
    var i = 0
    while (i < 10) {
      val b = s.getByte(i) & 0xff
      if (i == 4 || i == 7) { if (b != '-') return false }
      else if (!isDigitB(b)) return false
      i += 1
    }
    def d(i: Int): Int = (s.getByte(i) & 0xff) - '0'
    val y = d(0) * 1000 + d(1) * 100 + d(2) * 10 + d(3)
    val m = d(5) * 10 + d(6)
    val dd = d(8) * 10 + d(9)
    if (m < 1 || m > 12 || dd < 1) return false
    val leap = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0
    val maxD = m match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    dd <= maxD
  }

  /** Unicode normalization (UAX#15) of a UTF8String. The
    * `isNormalized` fast path makes ASCII (and already-normalized)
    * text a near-no-op scan — the common case for web corpora — while
    * composed/decomposed variants of the same glyphs ("é" as U+00E9
    * vs e+U+0301) canonicalize to identical bytes, which is what makes
    * normalization-then-fingerprint a sound exact-dup key. */
  def normalizeText(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Symmetric per-vector int8 quantization in ONE pass: scale =
    * max(|v|)/127, q_i = floor(v_i/scale + 0.5) (half-up, identical
    * for any engine replaying the same doubles — no banker's-rounding
    * divergence). Returns (scale, int[] quants); all-zero vectors get
    * scale 0 and zero quants. The declarative formulation would
    * re-evaluate the array-max inside the per-element lambda after
    * CollapseProject inlining — O(dim²) per row; this kernel is
    * O(dim). */
  def quantizeInt8(vec: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var absmax = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(vec.getFloat(i).toDouble)
      if (x > absmax) absmax = x
      i += 1
    }
    val scale = absmax / 127.0
    val q = new Array[Int](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(vec.getFloat(i).toDouble / scale + 0.5).toInt
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  /** Sign-random-projection LSH bucket id over a float vector: bit p
    * of the result is set iff the dot product with pseudo-random
    * hyperplane p is ≥ 0. Plane components replicate the Column
    * formulation exactly — `pmod(xxhash64(p, i, 0x5eed), 2e6)/1e6 - 1`
    * with Spark's int-typed xxhash64 chain (seed 42) — so native and
    * composed buckets are identical. One fused loop per row instead of
    * numPlanes interpreted zip_with/aggregate passes. */
  def lshBucket(vec: org.apache.spark.sql.catalyst.util.ArrayData,
                numPlanes: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        var h = XXH64.hashInt(p, 42L)
        h = XXH64.hashInt(i, h)
        h = XXH64.hashInt(0x5eed, h)
        val comp = java.lang.Math.floorMod(h, 2000000L) / 1000000.0 - 1.0
        dot += vec.getFloat(i).toDouble * comp
        i += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Fraction of positions where two long-array signatures agree —
    * the MinHash estimated-Jaccard kernel. Matches the
    * `size(filter(zip_with(a, b, (x,y) -> x = y), v -> v)) / size(a)`
    * higher-order form (int/int division in Spark SQL is double).
    * Boxed null iff lengths differ or empty. */
  def sigAgreement(a: org.apache.spark.sql.catalyst.util.ArrayData,
                   b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    java.lang.Double.valueOf(eq.toDouble / n)
  }

  /** MinHash signature via K-M double hashing; null iff no k-gram. */
  def minhashSig(input: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val bytes = input.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return null
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h1 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      val h2 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 1337L) | 1L
      var j = 0
      var m = h1
      while (j < numHashes) {
        if (m < mins(j)) mins(j) = m
        m += h2 // wraps mod 2^64 — intentional
        j += 1
      }
      i += 1
    }
    mins
  }

  /** 64-bit SimHash over ASCII-whitespace tokens; MIN_VALUE sentinel
    * (never a real simhash of interest) signals "no tokens" so the
    * generated code can branch to null without boxing. */
  val NoTokens: Long = Long.MinValue

  def simhash64(input: UTF8String): Long = {
    val bytes = input.getBytes
    val n = bytes.length
    val sums = new Array[Int](64)
    var start = 0
    var i = 0
    var sawToken = false
    while (i <= n) {
      val isSep = i == n || bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r' || bytes(i) == '\f' ||
        bytes(i) == 0x0b
      if (isSep) {
        if (i > start) {
          sawToken = true
          val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!sawToken) NoTokens
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (sums(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }

  /** Thread-local Deflater: zlib native state reused across rows via
    * reset() — per-row allocation of native memory would dominate the
    * scan. DEFAULT_COMPRESSION, raw deflate (nowrap): the 6-byte
    * zlib header/checksum would bias short documents. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true))

  /** Compressed/raw byte-length ratio of the string's UTF-8 bytes;
    * 1.0 for the empty string. */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** One-pass character k-grams of a UTF-8 string: every (or every
    * DISTINCT, first-occurrence order) k-char window, as an array of
    * UTF8Strings sharing no copies of the input walk. The
    * `transform(sequence(1, len-k+1), i -> substring(s, i, k))`
    * formulation is O(len²): UTF8String.substring must walk from
    * byte 0 to find char position i for EVERY element (measured 14x
    * on a 4x longer doc). Here char start offsets are computed once
    * and each gram is a direct byte-slice — O(len·k) total. */
  def charGrams(s: UTF8String, k: Int, distinct: Boolean):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // char start byte-offsets (one extra slot for the end)
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0; var c = 0
    while (i < n) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(c) = n
    val total = c - k + 1
    if (total <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    if (!distinct) {
      val out = new Array[Any](total)
      var j = 0
      while (j < total) {
        out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + k) - starts(j))
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var j = 0
      while (j < total) {
        seen.add(UTF8String.fromBytes(bytes, starts(j), starts(j + k) - starts(j)))
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { out(m) = it.next(); m += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Image dimensions from container HEADERS — no pixel decode, no
    * BufferedImage allocation: the probe a 100 TB multimodal curation
    * pass runs to filter by resolution/format BEFORE paying for
    * decode. Recognizes PNG (IHDR), GIF87a/89a (logical screen
    * descriptor), BMP (BITMAPINFOHEADER), JPEG (marker walk to the
    * first SOF segment, skipping tables/APPn), WebP (RIFF container:
    * VP8 lossy frame header, VP8L lossless 14-bit dims, VP8X extended
    * 24-bit canvas — modern crawls are heavily WebP), and TIFF
    * (II/MM byte-order header, IFD0 entry walk for ImageWidth 0x0100 /
    * ImageLength 0x0101, SHORT or LONG). Packed return:
    * format(16 bits)<<48 | width(24)<<24 | height(24); 0 = not
    * recognized / truncated / dims out of the 24-bit range. Format
    * ids: 1 png, 2 jpeg, 3 gif, 4 bmp, 5 webp, 6 tiff. */
  def imageDimsPacked(bytes: Array[Byte]): Long = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
    def pack(fmt: Long, w: Long, h: Long): Long =
      if (w <= 0 || h <= 0 || w > 0xffffff || h > 0xffffff) 0L
      else (fmt << 48) | (w << 24) | h
    val n = bytes.length
    // PNG: 8-byte signature, IHDR payload at 16 (width, height BE32)
    if (n >= 24 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G')
      return pack(1L, be32(16), be32(20))
    // GIF: 'GIF87a'/'GIF89a', screen w/h LE16 at 6/8
    if (n >= 10 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8' &&
        (u(4) == '7' || u(4) == '9') && u(5) == 'a')
      return pack(3L, le16(6), le16(8))
    // BMP: 'BM', header size at 14 decides the dim layout
    if (n >= 26 && u(0) == 'B' && u(1) == 'M') {
      val hdr = le32(14)
      if (hdr >= 40 && n >= 30)
        // BITMAPINFOHEADER: signed LE32 w/h (negative h = top-down)
        return pack(4L, le32(18).toInt.toLong, math.abs(le32(22).toInt).toLong)
      if (hdr == 12)
        // BITMAPCOREHEADER: LE16 w/h
        return pack(4L, le16(18), le16(20))
      return 0L
    }
    // JPEG: walk marker segments to the first frame header (SOF)
    if (n >= 4 && u(0) == 0xff && u(1) == 0xd8) {
      return jpegDims(bytes)
    }
    // WebP: RIFF container, 'WEBP' form, first chunk VP8 /VP8L/VP8X
    if (n >= 16 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'E' && u(10) == 'B' && u(11) == 'P' &&
        u(12) == 'V' && u(13) == 'P' && u(14) == '8') {
      // lossy: 3-byte frame tag then start code 9D 01 2A, dims LE16
      // with the top 2 bits reserved for scaling hints
      if (u(15) == ' ' && n >= 30 &&
          u(23) == 0x9d && u(24) == 0x01 && u(25) == 0x2a)
        return pack(5L, (le16(26) & 0x3fff).toLong, (le16(28) & 0x3fff).toLong)
      // lossless: signature byte 2F then 14-bit width-1 / height-1
      if (u(15) == 'L' && n >= 25 && u(20) == 0x2f) {
        val b = le32(21)
        return pack(5L, (b & 0x3fff) + 1, ((b >> 14) & 0x3fff) + 1)
      }
      // extended: flags(1) + reserved(3), canvas w-1/h-1 24-bit LE
      if (u(15) == 'X' && n >= 30) {
        val w = (u(24) | (u(25) << 8) | (u(26) << 16)).toLong + 1
        val h = (u(27) | (u(28) << 8) | (u(29) << 16)).toLong + 1
        return pack(5L, w, h)
      }
      return 0L
    }
    // TIFF: II*\0 (little-endian) or MM\0* (big-endian), then the IFD0
    // entry walk — tags 0x0100 ImageWidth / 0x0101 ImageLength, value
    // inline for SHORT(3)/LONG(4) with count 1. Every cursor
    // bounds-checks before reading; entry count capped (a hostile
    // 65535-entry IFD is a 786 KB walk — bound it to sane headers).
    if (n >= 8 && ((u(0) == 'I' && u(1) == 'I' && u(2) == 42 && u(3) == 0) ||
                   (u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 42))) {
      val le = u(0) == 'I'
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Long = if (le) le32(i) else be32(i)
      val ifd = r32(4)
      if (ifd < 8 || ifd > n - 2) return 0L
      val base = ifd.toInt + 2
      val cnt = math.min(r16(ifd.toInt), 512)
      var w = 0L
      var h = 0L
      var e = 0
      while (e < cnt) {
        val off = base + 12 * e
        if (off + 12 > n) return 0L
        val tag = r16(off)
        if (tag == 0x0100 || tag == 0x0101) {
          val typ = r16(off + 2)
          val count = r32(off + 4)
          if (count == 1L) {
            val v =
              if (typ == 3) r16(off + 8).toLong
              else if (typ == 4) r32(off + 8)
              else -1L
            if (v >= 0L) { if (tag == 0x0100) w = v else h = v }
          }
        }
        e += 1
      }
      if (w > 0 && h > 0) return pack(6L, w, h)
      return 0L
    }
    0L
  }

  private def jpegDims(bytes: Array[Byte]): Long = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def pack(fmt: Long, w: Long, h: Long): Long =
      if (w <= 0 || h <= 0 || w > 0xffffff || h > 0xffffff) 0L
      else (fmt << 48) | (w << 24) | h
    val n = bytes.length
    var i = 2
    while (i + 3 < n) {
      if (u(i) != 0xff) return 0L // lost sync: corrupt stream
      var m = u(i + 1)
      // fill bytes: consecutive FFs before a marker
      while (m == 0xff && i + 2 < n) { i += 1; m = u(i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xd9 || m == 0xda) return 0L // EOI / scan start: no SOF seen
      else {
        if (i + 3 >= n) return 0L
        val segLen = be16(i + 2)
        if (segLen < 2) return 0L
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= n) return 0L
          // SOF payload: precision(1), height BE16, width BE16
          return pack(2L, be16(i + 7), be16(i + 5))
        }
        i += 2 + segLen
      }
    }
    0L
  }

  /** EXIF orientation (1-8) from a JPEG's APP1 segment — the
    * rotation flag a resize/thumbnail pass MUST honor (a 6/8 image is
    * stored sideways; ignoring it ships rotated thumbnails for most
    * phone photos). Pure header walk, no decode: JPEG marker scan to
    * APP1 "Exif\0\0", TIFF header (II/MM byte order), IFD0 entry scan
    * for tag 0x0112. Returns 0 (→ NULL upstream) when absent,
    * non-JPEG, out of the 1-8 range, or malformed in any way —
    * hostile payloads never throw. All cursor arithmetic bounds-checks
    * before reading (the audioMetaPacked chunk-walk lesson). */
  def exifOrientation(bytes: Array[Byte]): Int = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    val n = bytes.length
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return 0
    var i = 2
    while (i + 3 < n) {
      if (u(i) != 0xff) return 0
      var m = u(i + 1)
      while (m == 0xff && i + 2 < n) { i += 1; m = u(i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xd9 || m == 0xda) return 0 // scan data: no EXIF
      else {
        if (i + 3 >= n) return 0
        val segLen = be16(i + 2)
        if (segLen < 2) return 0
        if (m == 0xe1 && segLen >= 16 && i + 2 + segLen <= n &&
            u(i + 4) == 'E' && u(i + 5) == 'x' && u(i + 6) == 'i' &&
            u(i + 7) == 'f' && u(i + 8) == 0 && u(i + 9) == 0) {
          val t = i + 10 // TIFF header start
          val le =
            if (u(t) == 'I' && u(t + 1) == 'I') true
            else if (u(t) == 'M' && u(t + 1) == 'M') false
            else return 0
          def r16(p: Int): Int = if (le) le16(p) else be16(p)
          def r32(p: Int): Long =
            if (le) u(p).toLong | (u(p + 1).toLong << 8) |
              (u(p + 2).toLong << 16) | (u(p + 3).toLong << 24)
            else (u(p).toLong << 24) | (u(p + 1).toLong << 16) |
              (u(p + 2).toLong << 8) | u(p + 3).toLong
          val segEnd = i + 2 + segLen
          if (t + 8 > segEnd || r16(t + 2) != 42) return 0
          val ifd0 = r32(t + 4)
          // cursor math in Long: a hostile 32-bit offset must not wrap
          val d = t.toLong + ifd0
          if (d < 0 || d + 2 > segEnd) return 0
          val count = r16(d.toInt)
          var e = 0
          while (e < count) {
            val p = d + 2 + e.toLong * 12
            if (p + 12 > segEnd) return 0
            if (r16(p.toInt) == 0x0112) {
              // type must be SHORT (3), count 1; value in the first
              // 2 bytes of the value field, per byte order
              if (r16(p.toInt + 2) != 3) return 0
              val v = r16(p.toInt + 8)
              return if (v >= 1 && v <= 8) v else 0
            }
            e += 1
          }
          return 0
        }
        i += 2 + segLen
      }
    }
    0
  }

  /** Does the JPEG's EXIF carry a GPS IFD (tag 0x8825 in IFD0)? — the
    * privacy probe a crawl pipeline runs before training on images:
    * phone photos embed the capture location. Same APP1/TIFF walk as
    * [[exifOrientation]]; hostile payloads → false, never a throw. */
  def exifHasGps(bytes: Array[Byte]): Boolean = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    val n = bytes.length
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return false
    var i = 2
    while (i + 3 < n) {
      if (u(i) != 0xff) return false
      var m = u(i + 1)
      while (m == 0xff && i + 2 < n) { i += 1; m = u(i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else if (m == 0xd9 || m == 0xda) return false
      else {
        if (i + 3 >= n) return false
        val segLen = be16(i + 2)
        if (segLen < 2) return false
        if (m == 0xe1 && segLen >= 16 && i + 2 + segLen <= n &&
            u(i + 4) == 'E' && u(i + 5) == 'x' && u(i + 6) == 'i' &&
            u(i + 7) == 'f' && u(i + 8) == 0 && u(i + 9) == 0) {
          val t = i + 10
          val le =
            if (u(t) == 'I' && u(t + 1) == 'I') true
            else if (u(t) == 'M' && u(t + 1) == 'M') false
            else return false
          def r16(p: Int): Int = if (le) le16(p) else be16(p)
          def r32(p: Int): Long =
            if (le) u(p).toLong | (u(p + 1).toLong << 8) |
              (u(p + 2).toLong << 16) | (u(p + 3).toLong << 24)
            else (u(p).toLong << 24) | (u(p + 1).toLong << 16) |
              (u(p + 2).toLong << 8) | u(p + 3).toLong
          val segEnd = i + 2 + segLen
          if (t + 8 > segEnd || r16(t + 2) != 42) return false
          val d = t.toLong + r32(t + 4)
          if (d < 0 || d + 2 > segEnd) return false
          val count = r16(d.toInt)
          var e = 0
          while (e < count) {
            val p = d + 2 + e.toLong * 12
            if (p + 12 > segEnd) return false
            if (r16(p.toInt) == 0x8825) return true // GPS Info IFD pointer
            e += 1
          }
          return false
        }
        i += 2 + segLen
      }
    }
    false
  }

  /** Strip every APP1 (EXIF/XMP) segment from a JPEG — the privacy
    * SCRUB paired with [[exifHasGps]]: a lossless byte splice (the
    * compressed image stream is untouched; decoders ignore the
    * missing metadata), the standard pre-training treatment for crawl
    * images. Non-JPEG or unparseable input returns the ORIGINAL bytes
    * unchanged (scrub-what-you-can; route the rest by the probe).
    * Stops copying segment-by-segment at SOS — from the scan marker
    * on, the remainder is entropy-coded data copied verbatim. */
  def stripExifSegments(bytes: Array[Byte]): Array[Byte] = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    val n = bytes.length
    if (n < 4 || u(0) != 0xff || u(1) != 0xd8) return bytes
    val out = new java.io.ByteArrayOutputStream(n)
    out.write(0xff); out.write(0xd8)
    var i = 2
    var stripped = false
    while (i + 3 < n) {
      if (u(i) != 0xff) return bytes // lost sync: pass through
      var m = u(i + 1)
      while (m == 0xff && i + 2 < n) { i += 1; m = u(i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        out.write(0xff); out.write(m); i += 2
      } else if (m == 0xda) {
        // start of scan: copy the rest verbatim (entropy-coded data)
        out.write(bytes, i, n - i)
        return if (stripped) out.toByteArray else bytes
      } else if (m == 0xd9) {
        out.write(0xff); out.write(0xd9)
        return if (stripped) out.toByteArray else bytes
      } else {
        if (i + 3 >= n) return bytes
        val segLen = be16(i + 2)
        if (segLen < 2 || i + 2 + segLen > n) return bytes
        if (m == 0xe1) stripped = true // APP1: drop (EXIF and XMP live here)
        else out.write(bytes, i, 2 + segLen)
        i += 2 + segLen
      }
    }
    bytes // no SOS reached: structure incomplete, pass through
  }

  /** Audio stream parameters from container HEADERS — the audio
    * sibling of [[imageDimsPacked]]: sample rate / channel count /
    * frame count (duration = frames/rate) without constructing a
    * javax.sound stream, for scan-speed duration/rate gates over a
    * multimodal corpus. Recognizes WAV (RIFF chunk walk to fmt+data),
    * AIFF (FORM/COMM, 80-bit extended-float rate), AU (fixed header),
    * and — r13, headers only, PCM stays undecoded — FLAC (STREAMINFO:
    * exact rate/channels/total samples), MP3 (first Layer III frame
    * header after an optional ID3v2 tag; duration from the Xing/Info
    * frame count when present, else a CBR estimate from the first
    * frame's bitrate — an ESTIMATE for headerless VBR, documented),
    * and OGG (Vorbis identification header or OpusHead; total samples
    * = the last page's granule position, scanned in the final 64 KB;
    * Opus granules are 48 kHz by spec). Packed return:
    * fmt(3 bits)<<61 | channels(5)<<56 | rate(20)<<36 | frames(36);
    * 0 = unrecognized / truncated / out-of-range. Format ids: 1 wav,
    * 2 aiff, 3 au, 4 flac, 5 mp3, 6 ogg. fmt ≥ 4 sets bit 63 —
    * extract with an UNSIGNED shift. */
  def audioMetaPacked(bytes: Array[Byte]): Long = {
    def u(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    def be32(i: Int): Long =
      (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      u(i).toLong | (u(i + 1).toLong << 8) | (u(i + 2).toLong << 16) | (u(i + 3).toLong << 24)
    def pack(fmt: Long, ch: Long, rate: Long, frames: Long): Long =
      if (ch <= 0 || ch > 31 || rate <= 0 || rate > 0xfffff ||
          frames < 0 || frames > 0xfffffffffL) 0L
      else (fmt << 61) | (ch << 56) | (rate << 36) | frames
    val n = bytes.length
    if (n < 12) return 0L
    // WAV: 'RIFF' size 'WAVE', then chunk walk (fmt then data)
    if (u(0) == 'R' && u(1) == 'I' && u(2) == 'F' && u(3) == 'F' &&
        u(8) == 'W' && u(9) == 'A' && u(10) == 'V' && u(11) == 'E') {
      var i = 12
      var ch = 0L; var rate = 0L; var blockAlign = 0L
      while (i + 8 <= n) {
        val size = le32(i + 4)
        val isFmt = u(i) == 'f' && u(i + 1) == 'm' && u(i + 2) == 't' && u(i + 3) == ' '
        val isData = u(i) == 'd' && u(i + 1) == 'a' && u(i + 2) == 't' && u(i + 3) == 'a'
        if (isFmt) {
          if (i + 8 + 16 > n) return 0L
          ch = le16(i + 10); rate = le32(i + 12); blockAlign = le16(i + 20)
        } else if (isData) {
          if (ch == 0 || blockAlign == 0) return 0L
          return pack(1L, ch, rate, size / blockAlign)
        }
        // advance in Long: an unsigned 32-bit size >= 2^31 would wrap
        // negative as an Int and wedge the walk on a hostile payload
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > n) return 0L
        i = next.toInt // chunks are word-aligned
      }
      return 0L
    }
    // AIFF: 'FORM' size 'AIFF', COMM chunk holds everything
    if (u(0) == 'F' && u(1) == 'O' && u(2) == 'R' && u(3) == 'M' &&
        u(8) == 'A' && u(9) == 'I' && u(10) == 'F' && u(11) == 'F') {
      var i = 12
      while (i + 8 <= n) {
        val size = be32(i + 4)
        if (u(i) == 'C' && u(i + 1) == 'O' && u(i + 2) == 'M' && u(i + 3) == 'M') {
          if (i + 8 + 18 > n) return 0L
          val ch = be16(i + 8)
          val frames = be32(i + 10)
          // sample rate: 80-bit IEEE 754 extended (SANE): 1+15 bit
          // sign/exponent, 64-bit mantissa with explicit integer bit
          val exp = be16(i + 16) & 0x7fff
          var mant = 0L
          var j = 0
          while (j < 8) { mant = (mant << 8) | u(i + 18 + j); j += 1 }
          if (exp == 0 && mant == 0L) return 0L
          val e = exp - 16383 - 63
          val rate =
            if (e >= 0) mant << e
            else if (e > -64) {
              // round-to-nearest on the shifted-out bit: 44100 etc.
              // are exact, but a rate like 8000.5 must not floor
              val shifted = mant >>> (-e)
              val roundBit = if (-e <= 64) (mant >>> (-e - 1)) & 1L else 0L
              shifted + roundBit
            } else 0L
          return pack(2L, ch, rate, frames)
        }
        // same Long-advance guard as the WAV walk above
        val next = i.toLong + 8L + size + (size & 1L)
        if (next > n) return 0L
        i = next.toInt
      }
      return 0L
    }
    // AU: '.snd' magic, fixed big-endian header
    if (u(0) == '.' && u(1) == 's' && u(2) == 'n' && u(3) == 'd') {
      if (n < 24) return 0L
      val dataSize = be32(8)
      val encoding = be32(12)
      val rate = be32(16)
      val ch = be32(20)
      val bytesPerSample = encoding match {
        case 1 | 2 => 1L // mu-law, 8-bit linear
        case 3 => 2L     // 16-bit linear
        case 4 => 3L
        case 5 | 6 => 4L // 32-bit linear, float
        case 7 => 8L     // double
        case _ => return 0L
      }
      if (ch <= 0) return 0L
      val frames =
        if (dataSize == 0xffffffffL) (n - be32(4)) / (bytesPerSample * ch)
        else dataSize / (bytesPerSample * ch)
      return pack(3L, ch, rate, frames)
    }
    // FLAC: 'fLaC' + STREAMINFO (mandatory FIRST metadata block):
    // 20-bit rate, 3-bit channels-1, 36-bit total samples — exact
    if (n >= 42 && u(0) == 'f' && u(1) == 'L' && u(2) == 'a' && u(3) == 'C' &&
        (u(4) & 0x7f) == 0) {
      val len = (u(5) << 16) | (u(6) << 8) | u(7)
      if (len < 34) return 0L
      val s = 8
      val rate = (u(s + 10).toLong << 12) | (u(s + 11) << 4) | (u(s + 12) >> 4)
      val ch = ((u(s + 12) >> 1) & 0x7) + 1L
      val total = ((u(s + 13) & 0xf).toLong << 32) | be32(s + 14)
      return pack(4L, ch, rate, total)
    }
    // MP3: optional ID3v2 (syncsafe size), then the first Layer III
    // frame header; frames→samples via the layer's samples-per-frame
    if (n >= 4 && ((u(0) == 0xff && (u(1) & 0xe0) == 0xe0) ||
        (u(0) == 'I' && u(1) == 'D' && u(2) == '3'))) {
      var off = 0
      if (u(0) == 'I') {
        if (n < 14) return 0L
        val sz = ((u(6) & 0x7f) << 21) | ((u(7) & 0x7f) << 14) |
          ((u(8) & 0x7f) << 7) | (u(9) & 0x7f)
        val next = 10L + sz
        if (next + 4 > n) return 0L
        off = next.toInt
      }
      if (off + 4 > n || u(off) != 0xff || (u(off + 1) & 0xe0) != 0xe0) return 0L
      val verBits = (u(off + 1) >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layerBits = (u(off + 1) >> 1) & 0x3 // 1=Layer III
      if (verBits == 1 || layerBits != 1) return 0L
      val brIdx = (u(off + 2) >> 4) & 0xf
      val srIdx = (u(off + 2) >> 2) & 0x3
      if (srIdx == 3 || brIdx == 15 || brIdx == 0) return 0L // free format: no
      val base = srIdx match { case 0 => 44100L; case 1 => 48000L; case _ => 32000L }
      val rate = verBits match { case 3 => base; case 2 => base / 2; case _ => base / 4 }
      val mono = ((u(off + 3) >> 6) & 0x3) == 3
      val ch = if (mono) 1L else 2L
      val spf = if (verBits == 3) 1152L else 576L
      // Xing/Info (VBR header) sits right after the side info
      val side = if (verBits == 3) { if (mono) 17 else 32 }
                 else { if (mono) 9 else 17 }
      val x = off + 4 + side
      var totalFrames = -1L
      if (x + 12 <= n &&
          ((u(x) == 'X' && u(x + 1) == 'i' && u(x + 2) == 'n' && u(x + 3) == 'g') ||
           (u(x) == 'I' && u(x + 1) == 'n' && u(x + 2) == 'f' && u(x + 3) == 'o'))) {
        val flags = be32(x + 4)
        if ((flags & 1L) != 0L) totalFrames = be32(x + 8)
      }
      if (totalFrames < 0) {
        val kbps =
          if (verBits == 3)
            Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)(brIdx)
          else
            Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)(brIdx)
        val coef = if (verBits == 3) 144L else 72L
        val frameBytes = coef * kbps * 1000L / rate
        if (frameBytes <= 0) return 0L
        totalFrames = (n - off).toLong / frameBytes
      }
      return pack(5L, ch, rate, totalFrames * spf)
    }
    // OGG: first page carries the Vorbis id header or OpusHead;
    // total samples = the LAST page's granule position (tail scan)
    if (n >= 58 && u(0) == 'O' && u(1) == 'g' && u(2) == 'g' && u(3) == 'S') {
      val nseg = u(26)
      val p = 27 + nseg
      var ch = 0L
      var rate = 0L
      if (p + 16 <= n && u(p) == 0x01 && u(p + 1) == 'v' && u(p + 2) == 'o' &&
          u(p + 3) == 'r' && u(p + 4) == 'b' && u(p + 5) == 'i' && u(p + 6) == 's') {
        ch = u(p + 11); rate = le32(p + 12)
      } else if (p + 19 <= n && u(p) == 'O' && u(p + 1) == 'p' && u(p + 2) == 'u' &&
          u(p + 3) == 's' && u(p + 4) == 'H' && u(p + 5) == 'e' &&
          u(p + 6) == 'a' && u(p + 7) == 'd') {
        ch = u(p + 9); rate = 48000L // Opus granules are 48 kHz by spec
      } else return 0L
      var last = -1L
      var i = math.max(0, n - 65536)
      while (i + 14 <= n) {
        if (u(i) == 'O' && u(i + 1) == 'g' && u(i + 2) == 'g' && u(i + 3) == 'S') {
          var g = 0L
          var j = 7
          while (j >= 0) { g = (g << 8) | u(i + 6 + j); j -= 1 } // LE64
          // -1 marks a headers-only page; keep the last non-negative
          if (g >= 0L) last = g
          i += 27
        } else i += 1
      }
      if (last < 0L) return 0L
      return pack(6L, ch, rate, last)
    }
    0L
  }

  /** Winnowing selection over an array of gram hashes — monotone-deque
    * sliding-window minimum, O(n) total: each index enters and leaves
    * the deque once. Popping on >= evicts equal values in favor of the
    * newer index, so the deque front is always the RIGHTMOST minimum
    * of the current window; consecutive windows selecting the same
    * index dedupe inline (selections are monotone non-decreasing).
    * Output rows: (pos = 1-based index, fp = hash). Fewer than w
    * elements -> empty (no complete window). */
  def winnowSelect(h: org.apache.spark.sql.catalyst.util.ArrayData,
                   w: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = h.numElements()
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Any](n / w + 2)
    var lastSel = -1
    var e = 0
    while (e < n) {
      val v = h.getLong(e)
      while (tail > head && h.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = e
      tail += 1
      if (e >= w - 1) {
        val j = e - w + 1
        while (deque(head) < j) head += 1
        val sel = deque(head)
        if (sel != lastSel) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any]((sel + 1).toLong, h.getLong(sel)))
          lastSel = sel
        }
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}
