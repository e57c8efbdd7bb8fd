package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

/** WARC (Web ARChive, ISO 28500) source — the container format the
  * public web arrives in: Common Crawl publishes its crawls as ~1 GB
  * gzipped WARC segments, and every crawl-corpus pipeline starts by
  * turning those segments into (url, fetch time, payload) rows that
  * the URL ops ([[graft.text.UrlOps]]) and HTML extraction
  * ([[graft.text.Html]]) then consume. The reference ingests its feeds
  * from format-sniffed file drops (DM_bankfile_validate_pipeline.py
  * run_invalid_extension_scenario area); this is that ingestion
  * surface grown to the crawl format the builder brief targets.
  *
  * Format (public spec, ISO 28500 / WARC 1.1): a WARC file is a
  * concatenation of records, each
  * {{{
  *   WARC/1.1\r\n
  *   <Header-Name>: <value>\r\n ...        (incl. Content-Length)
  *   \r\n
  *   <Content-Length payload bytes>
  *   \r\n\r\n
  * }}}
  * `.warc.gz` files hold one gzip MEMBER per record; Java's
  * GZIPInputStream decodes concatenated members transparently, so the
  * same streaming parser reads both encodings.
  *
  * Scale shape: gzip WARC is NOT splittable (each member must be read
  * from its start), so the unit of parallelism is the FILE — exactly
  * how the format is published (a crawl is tens of thousands of ~1 GB
  * segments, far more files than executors). Each task streams ONE
  * file through a bounded parser: records are decoded incrementally
  * off the open stream (never the whole file in memory) and payloads
  * are capped at `maxBytes` with an explicit `truncated` flag — the
  * standard crawl-processing defense against a multi-GB response
  * record. Malformed input degrades per-file, not per-job: a record
  * that cannot be framed yields one `_corrupt` marker row (PERMISSIVE
  * CSV's corrupt-column convention) and the rest of the FILE is
  * skipped (framing is lost), while other files are unaffected.
  */
object Warc {

  /** One parsed record. For `response`/`request` records the HTTP
    * envelope is split: `http_status`/`http_content_type` come from
    * the embedded HTTP message and `body` is the HTTP BODY; for all
    * other record types `body` is the raw WARC payload and the http
    * fields are null. `warc_type == "_corrupt"` marks a framing
    * failure (body holds the unparsed prefix, target_uri the error). */
  final case class WarcRow(
      file: String,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      warc_content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: String,
      truncated: Boolean,
      body: Array[Byte])

  /** Read every WARC record under `path` (a file, directory, or glob;
    * plain `.warc` and per-record-gzip `.warc.gz` both supported).
    * `keepTypes` filters record types at the parser (empty = all) so
    * skipped payloads are still STREAMED past, never materialized.
    * `maxBytes` bounds the bytes kept per record. One Spark task per
    * file — the format's own parallelism unit (see scale note above).
    */
  def read(spark: SparkSession, path: String,
           keepTypes: Seq[String] = Seq("response"),
           maxBytes: Int = 1 << 20): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val statuses =
      try {
        val st = fs.getFileStatus(p)
        if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
      } catch {
        case _: java.io.FileNotFoundException => // glob pattern
          Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      }
    val files = statuses.filter(_.isFile).map(_.getPath.toString)
      .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz")).sorted
    val keep = keepTypes.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val ds: Dataset[WarcRow] = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { paths =>
        paths.flatMap(f => parseFile(f, serConf.value, keep, maxBytes))
      }
    ds.toDF()
  }

  /** The crawl front door: `response` records as
    * (url, fetch_ts, http_status, content_type, truncated, body). */
  def responses(spark: SparkSession, path: String,
                maxBytes: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, path, Seq("response"), maxBytes)
      .select(col("target_uri").as("url"),
        to_timestamp(col("warc_date")).as("fetch_ts"),
        col("http_status"), col("http_content_type").as("content_type"),
        col("truncated"), col("body"))
  }

  // ---- streaming per-file parser ------------------------------------

  private def parseFile(file: String, conf: org.apache.hadoop.conf.Configuration,
      keep: Set[String], maxBytes: Int): Iterator[WarcRow] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val raw = hp.getFileSystem(conf).open(hp)
    val in: InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
      else new BufferedInputStream(raw, 1 << 16)
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
    new Iterator[WarcRow] {
      private var nextRow: WarcRow = null
      private var done = false
      private def advance(): Unit = {
        while (nextRow == null && !done) {
          try {
            readRecord(file, in, maxBytes) match {
              case null => done = true; closeOnce()
              case row =>
                if (keep.isEmpty || keep(row.warc_type) ||
                  row.warc_type == "_corrupt") nextRow = row
            }
          } catch {
            case e: Exception =>
              // framing lost: surface one marker row, drop the rest of
              // the file (other files' tasks are unaffected)
              nextRow = WarcRow(file, "_corrupt", null,
                s"${e.getClass.getSimpleName}: ${e.getMessage}", null, null,
                -1L, None, null, truncated = false, Array.emptyByteArray)
              done = true; closeOnce()
          }
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): WarcRow = {
        advance()
        if (nextRow == null) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** Read one record off the stream, or null at clean EOF. Throws on
    * malformed framing (caller converts to a `_corrupt` marker). */
  private def readRecord(file: String, in: InputStream, maxBytes: Int): WarcRow = {
    // tolerate inter-record blank lines (the two CRLFs that close the
    // previous record, plus any padding)
    var version: String = null
    while (version == null) {
      val line = readLine(in)
      if (line == null) return null
      val t = line.trim
      if (t.nonEmpty) {
        if (!t.startsWith("WARC/"))
          throw new java.io.IOException(s"expected WARC/ version line, got '${t.take(40)}'")
        version = t
      }
    }
    val headers = scala.collection.mutable.Map.empty[String, String]
    var line = readLine(in)
    while (line != null && line.trim.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0)
        headers(line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)) =
          line.substring(i + 1).trim
      line = readLine(in)
    }
    if (line == null) throw new EOFException("EOF inside record headers")
    val len = headers.get("content-length").map(_.toLong)
      .getOrElse(throw new java.io.IOException("record missing Content-Length"))
    if (len < 0) throw new java.io.IOException(s"negative Content-Length $len")
    val wtype = headers.getOrElse("warc-type", "unknown")
      .toLowerCase(java.util.Locale.ROOT)
    val keepN = math.min(len, maxBytes.toLong).toInt
    val payload = readPayload(in, len, keepN)
    val truncated = len > keepN
    val (status, httpCt, body) =
      if ((wtype == "response" || wtype == "request") &&
        headers.getOrElse("content-type", "").startsWith("application/http"))
        parseHttp(payload)
      else (None, null, payload)
    WarcRow(file, wtype,
      headers.getOrElse("warc-record-id", null),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("content-type", null),
      len, status, httpCt, truncated, body)
  }

  /** Keep the first `keepN` bytes of the `len`-byte payload, STREAM
    * the rest into a fixed skip buffer (a 100 MB record costs 100 MB
    * of I/O but never 100 MB of heap). */
  private def readPayload(in: InputStream, len: Long, keepN: Int): Array[Byte] = {
    val kept = new Array[Byte](keepN)
    var off = 0
    while (off < keepN) {
      val n = in.read(kept, off, keepN - off)
      if (n < 0) throw new EOFException(s"EOF at payload byte $off of $len")
      off += n
    }
    var remaining = len - keepN
    if (remaining > 0) {
      val skip = new Array[Byte](1 << 16)
      while (remaining > 0) {
        val n = in.read(skip, 0, math.min(remaining, skip.length.toLong).toInt)
        if (n < 0) throw new EOFException("EOF inside skipped payload tail")
        remaining -= n
      }
    }
    kept
  }

  /** Split an HTTP/1.x message into (status, content-type, body). A
    * payload with no CRLFCRLF envelope boundary (e.g. truncated under
    * maxBytes) returns the whole payload as body with null metadata —
    * degrade, don't throw. */
  private[sources] def parseHttp(payload: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    val boundary = indexOfCrlfCrlf(payload)
    if (boundary < 0) return (None, null, payload)
    val head = new String(payload, 0, boundary, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption
      .flatMap { l =>
        val parts = l.split(" ")
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          parts(1).toIntOption
        else None
      }
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    (status, ct, java.util.Arrays.copyOfRange(payload, boundary + 4, payload.length))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Read one ISO-8859-1 line (up to LF, CR stripped), or null at EOF
    * before any byte. Header lines are bounded at 64 KiB — a longer
    * "line" is not a header, it's corruption. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (buf.size >= (1 << 16))
        throw new java.io.IOException("header line exceeds 64 KiB")
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
