package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.collection.mutable.ArrayBuffer

/** Minimal xlsx source/sink built on the JDK alone (java.util.zip +
  * javax.xml) — an .xlsx file is a zip of XML parts, so no POI-style
  * dependency is needed for the subset the reference exercises: one
  * sheet of string/number cells with a header row
  * (/root/reference/newaugsver_clean.py:521 `save_to_formats` writes
  * the generated feed as xlsx; DM_bankfile_validate_pipeline.py:3040
  * `run_invalid_extension_scenario` validates the extension path).
  *
  * Scale posture: xlsx is inherently a SMALL-file format (zip +
  * in-memory sheet DOM — there is no splittable scan), so the
  * single-file paths run on the driver and are meant for reference-
  * sized drops; [[readDir]] is the many-files shape — a distributed
  * `binaryFile` scan with per-file executor-side parsing, which is how
  * a 100k-workbook ingest actually parallelizes (per FILE, never
  * within one).
  */
object Xlsx {

  private def esc(s: String): String = {
    // XML 1.0 forbids most control chars even as numeric references —
    // a DocumentBuilder (including parseBytes' own) rejects them, so a
    // stray U+0001 in a cell would break the write→read round trip.
    // Filter by CODE POINT, not code unit: XML 1.0 allows
    // #x10000-#x10FFFF, so well-formed surrogate pairs (emoji,
    // supplementary CJK) must survive; only unpaired surrogates and
    // disallowed controls are dropped.
    val sb = new java.lang.StringBuilder(s.length)
    s.codePoints().forEach { cp =>
      val ok = cp == '\t' || cp == '\n' || cp == '\r' ||
        (cp >= 0x20 && cp <= 0xD7FF) || (cp >= 0xE000 && cp <= 0xFFFD) ||
        (cp >= 0x10000 && cp <= 0x10FFFF)
      if (ok) sb.appendCodePoint(cp)
    }
    sb.toString.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }

  /** Column index (0-based) from an A1-style cell reference. */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  private def colName(idx: Int): String = {
    var (i, s) = (idx + 1, "")
    while (i > 0) { val r = (i - 1) % 26; s = ('A' + r).toChar.toString + s; i = (i - 1) / 26 }
    s
  }

  /** Serialize `rows` (header first) into xlsx bytes: one sheet,
    * inline strings (no sharedStrings part needed for writing). */
  private[sources] def toBytes(header: Seq[String], rows: Iterator[Seq[String]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zip.write(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""".stripMargin
        .getBytes("UTF-8"))
    var rowNum = 1
    for (r <- Iterator(header) ++ rows) {
      val cells = r.zipWithIndex.map { case (v, i) =>
        if (v == null) ""
        else s"""<c r="${colName(i)}$rowNum" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString
      zip.write(s"""<row r="$rowNum">$cells</row>""".getBytes("UTF-8"))
      rowNum += 1
    }
    zip.write("</sheetData></worksheet>".getBytes("UTF-8"))
    zip.closeEntry()
    zip.close()
    bos.toByteArray
  }

  /** Parse xlsx bytes → (header, data rows), all values as strings.
    * Handles inline strings, sharedStrings (`t="s"`, including
    * rich-text runs) and raw number cells; absent cells → null. */
  private[sources] def parseBytes(bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    var sheet: Array[Byte] = null
    var shared: Array[Byte] = null
    var entry = zis.getNextEntry
    while (entry != null) {
      val name = entry.getName
      if (name == "xl/worksheets/sheet1.xml" || (sheet == null && name.startsWith("xl/worksheets/")))
        sheet = zis.readAllBytes()
      else if (name == "xl/sharedStrings.xml") shared = zis.readAllBytes()
      entry = zis.getNextEntry
    }
    zis.close()
    require(sheet != null, "xlsx: no worksheet part found")

    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    def parse(b: Array[Byte]) = dbf.newDocumentBuilder().parse(new ByteArrayInputStream(b))

    val sharedStrings: IndexedSeq[String] =
      if (shared == null) IndexedSeq.empty
      else {
        val sis = parse(shared).getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
          (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
        }
      }

    val rowNodes = parse(sheet).getElementsByTagName("row")
    val rows = ArrayBuffer.empty[Array[String]]
    var width = 0
    (0 until rowNodes.getLength).foreach { i =>
      val cells = rowNodes.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("c")
      val vals = ArrayBuffer.empty[(Int, String)]
      (0 until cells.getLength).foreach { j =>
        val c = cells.item(j).asInstanceOf[org.w3c.dom.Element]
        val idx = Option(c.getAttribute("r")).filter(_.nonEmpty)
          .map(colIndex).getOrElse(j)
        val t = c.getAttribute("t")
        val v = t match {
          case "inlineStr" =>
            val ts = c.getElementsByTagName("t")
            (0 until ts.getLength).map(k => ts.item(k).getTextContent).mkString
          case "s" =>
            val vn = c.getElementsByTagName("v")
            if (vn.getLength == 0) null else sharedStrings(vn.item(0).getTextContent.trim.toInt)
          case _ =>
            val vn = c.getElementsByTagName("v")
            if (vn.getLength == 0) null else vn.item(0).getTextContent
        }
        vals += idx -> v
        width = math.max(width, idx + 1)
      }
      val arr = Array.fill[String](width)(null)
      vals.foreach { case (idx, v) => if (idx < arr.length) arr(idx) = v }
      rows += arr
    }
    if (rows.isEmpty) (Seq.empty, Seq.empty)
    else {
      val w = rows.map(_.length).max
      val padded = rows.map(r => (r ++ Array.fill[String](w - r.length)(null)).toSeq)
      (padded.head, padded.tail.toSeq)
    }
  }

  /** The xlsx format's own per-sheet row limit (2^20, header
    * included) — also the default fail-fast cap of [[write]]. */
  val SheetRowLimit: Int = 1048576

  /** Write a (small) DataFrame as one xlsx file. All values are
    * rendered as strings; the header row is the column names. One
    * workbook is one driver-sized file by format design, so the
    * collect is deliberate — but BOUNDED: the frame is limited to
    * `maxRows + 1` before collection (a 100 GB frame pointed here
    * costs one small collect, not a driver OOM) and the write fails
    * fast when the cap is exceeded, directing large data to
    * [[writeSharded]] or parquet. */
  def write(df: DataFrame, path: String, maxRows: Int = SheetRowLimit - 1): Unit = {
    require(maxRows > 0 && maxRows < SheetRowLimit,
      s"maxRows must be in [1, ${SheetRowLimit - 1}]")
    val header = df.columns.toSeq
    val collected = df.limit(maxRows + 1).collect()
    require(collected.length <= maxRows,
      s"xlsx write refused: more than $maxRows rows (single-workbook cap; " +
        "use writeSharded for part-files or parquet for real data)")
    val rows = collected.iterator.map(r =>
      r.toSeq.map(v => if (v == null) null else v.toString))
    val bytes = toBytes(header, rows)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }

  /** Distributed sharded xlsx sink: `part-NNNNN.xlsx` files under
    * `dir`, each task writing its own workbook (the write-side twin
    * of [[readDir]]'s one-task-per-workbook read). Shard count is
    * sized from one count so each file stays under `rowsPerFile`.
    * `dir` must be storage every executor can reach — true for this
    * repo's local mode and any shared filesystem; at real cluster
    * scale xlsx is a hand-off format and the data path is parquet. */
  def writeSharded(df: DataFrame, dir: String, rowsPerFile: Long = 200000L): Unit = {
    require(rowsPerFile > 0 && rowsPerFile < SheetRowLimit,
      s"rowsPerFile must be in [1, ${SheetRowLimit - 1}]")
    val header = df.columns.toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val n = df.count()
    val parts = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val strs = df.select(df.columns.map(c => col(c).cast("string")): _*)
    strs.repartition(parts).rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val rows = it.map(r => (0 until r.length).map(i => r.getString(i)))
      val bytes = toBytes(header, rows)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"part-$pid%05d.xlsx"), bytes)
    }
  }

  /** Read one xlsx file into an all-string DataFrame (header row =
    * column names) — the reference's single-drop ingest shape. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (header, rows) = parseBytes(bytes)
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), math.max(1, rows.size / 10000)),
      schema)
  }

  /** Distributed many-file read: `binaryFile` scan + executor-side
    * parse, one task per workbook — the shape a large xlsx drop zone
    * needs (parallelism across files; a single workbook is never
    * splittable). All files must share `schema`'s column set; cells
    * are read as strings positionally under the header. */
  def readDir(spark: SparkSession, pathGlob: String, schema: StructType): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val n = schema.fields.length
    spark.read.format("binaryFile").load(pathGlob)
      .select("content")
      .flatMap { r =>
        val (header, rows) = parseBytes(r.getAs[Array[Byte]]("content"))
        val pos = schema.fieldNames.map(header.indexOf(_))
        rows.iterator.map { row =>
          Row.fromSeq((0 until n).map(i =>
            if (pos(i) < 0 || pos(i) >= row.length) null else row(pos(i))))
        }
      }(enc)
  }
}
