package graft.sources

import graft.SparkSpec

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

class WarcSpec extends SparkSpec {

  private def record(wtype: String, uri: String, date: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1\r\n")
    sb.append(s"WARC-Type: $wtype\r\n")
    sb.append(s"WARC-Record-ID: <urn:uuid:$wtype-${String.valueOf(uri).hashCode}>\r\n")
    if (uri != null) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes(ISO_8859_1))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private def httpResponse(status: Int, contentType: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.getBytes(ISO_8859_1).length}\r\n\r\n" + body)
      .getBytes(ISO_8859_1)

  private def fixtureRecords(): Seq[Array[Byte]] = Seq(
    record("warcinfo", null, "2026-01-02T03:04:05Z",
      "application/warc-fields", "software: graft-test\r\n".getBytes(ISO_8859_1)),
    record("request", "http://example.com/a", "2026-01-02T03:04:06Z",
      "application/http; msgtype=request",
      "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(ISO_8859_1)),
    record("response", "http://example.com/a", "2026-01-02T03:04:06Z",
      "application/http; msgtype=response",
      httpResponse(200, "text/html; charset=utf-8", "<html><body>hello a</body></html>")),
    record("response", "http://example.com/b", "2026-01-02T03:04:07Z",
      "application/http; msgtype=response",
      httpResponse(404, "text/plain", "not found")))

  private def writePlain(dir: String, name: String): String = {
    val p = Paths.get(dir, name)
    val out = new ByteArrayOutputStream()
    fixtureRecords().foreach(out.write)
    Files.write(p, out.toByteArray)
    p.toString
  }

  private def writeGz(dir: String, name: String): String = {
    val p = Paths.get(dir, name)
    val out = new ByteArrayOutputStream()
    fixtureRecords().foreach { r =>
      val gz = new GZIPOutputStream(out) // one member per record, per spec
      gz.write(r); gz.finish()
    }
    Files.write(p, out.toByteArray)
    p.toString
  }

  test("plain WARC: responses parsed with HTTP envelope split") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir, "seg.warc")
    val rows = Warc.read(spark, dir).orderBy("target_uri").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[String]("warc_type") == "response")
    assert(a.getAs[String]("target_uri") == "http://example.com/a")
    assert(a.getAs[Int]("http_status") == 200)
    assert(a.getAs[String]("http_content_type") == "text/html; charset=utf-8")
    assert(new String(a.getAs[Array[Byte]]("body"), ISO_8859_1) ==
      "<html><body>hello a</body></html>")
    assert(!a.getAs[Boolean]("truncated"))
    assert(rows(1).getAs[Int]("http_status") == 404)
  }

  test("gzip WARC (member per record) parses identically to plain") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir, "seg.warc")
    val dirGz = Files.createTempDirectory("warc").toString
    writeGz(dirGz, "seg.warc.gz")
    def canon(dir0: String): Seq[String] = {
      import org.apache.spark.sql.functions._
      Warc.read(spark, dir0, keepTypes = Seq.empty)
        .withColumn("body", decode(col("body"), "ISO-8859-1")).drop("file")
        .orderBy("record_id", "warc_type").collect().map(_.toString).toSeq
    }
    val plain = canon(dir)
    val gz = canon(dirGz)
    assert(gz == plain && plain.length == 4)
  }

  test("keepTypes filters at the parser; empty keeps all") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir, "seg.warc")
    val types = Warc.read(spark, dir, keepTypes = Seq.empty)
      .select("warc_type").collect().map(_.getString(0)).sorted.toSeq
    assert(types == Seq("request", "response", "response", "warcinfo"))
    val onlyReq = Warc.read(spark, dir, keepTypes = Seq("request")).collect()
    assert(onlyReq.length == 1 && onlyReq(0).getAs[String]("warc_type") == "request")
  }

  test("maxBytes caps payloads with an explicit truncated flag") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir, "seg.warc")
    // 10 bytes is inside the HTTP head, so the envelope boundary is
    // gone: http fields degrade to null, body is the kept prefix
    val rows = Warc.read(spark, dir, maxBytes = 10).orderBy("target_uri").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Boolean]("truncated")))
    assert(rows.forall(_.isNullAt(rows(0).fieldIndex("http_status"))))
    assert(rows.forall(_.getAs[Array[Byte]]("body").length == 10))
    // content_length still reports the full on-disk length
    assert(rows.forall(_.getAs[Long]("content_length") > 10))
  }

  test("garbage mid-file yields one _corrupt marker, earlier records survive") {
    val dir = Files.createTempDirectory("warc").toString
    val p = Paths.get(dir, "bad.warc")
    val out = new ByteArrayOutputStream()
    out.write(fixtureRecords().head)
    out.write("NOT A WARC HEADER\r\njunk\r\n".getBytes(ISO_8859_1))
    Files.write(p, out.toByteArray)
    val rows = Warc.read(spark, dir, keepTypes = Seq.empty)
      .orderBy("warc_type").collect()
    assert(rows.map(_.getAs[String]("warc_type")).toSeq == Seq("_corrupt", "warcinfo"))
    assert(rows(0).getAs[String]("target_uri").contains("expected WARC/"))
  }

  test("truncated payload (EOF inside record) is a _corrupt marker, other files unaffected") {
    val dir = Files.createTempDirectory("warc").toString
    writePlain(dir, "good.warc")
    val full = record("response", "http://example.com/c", "2026-01-02T03:04:08Z",
      "application/http; msgtype=response", httpResponse(200, "text/plain", "body"))
    Files.write(Paths.get(dir, "cut.warc"), full.dropRight(30))
    val rows = Warc.read(spark, dir, keepTypes = Seq.empty).collect()
    assert(rows.count(_.getAs[String]("warc_type") == "_corrupt") == 1)
    // the good file's 4 records all parse
    assert(rows.count(r => r.getAs[String]("file").endsWith("good.warc")) == 4)
  }

  test("responses(): the crawl front-door projection feeds UrlOps/Html directly") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("warc").toString
    writeGz(dir, "seg.warc.gz")
    val resp = Warc.responses(spark, dir)
    assert(resp.columns.toSeq ==
      Seq("url", "fetch_ts", "http_status", "content_type", "truncated", "body"))
    val html = resp.where(col("http_status") === 200)
      .select(col("url"),
        graft.text.Html.stripHtml(decode(col("body"), "UTF-8")).as("text"))
      .collect()
    assert(html.length == 1)
    assert(html(0).getString(1) == "hello a")
    val ts = resp.select(col("fetch_ts").cast("string")).orderBy("url")
      .collect().map(_.getString(0))
    assert(ts.head.startsWith("2026-01-02 03:04:06"))
  }
}
