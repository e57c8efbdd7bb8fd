package graft.sources

import graft.schema.SchemaCheck
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced file sources — the reference ingests parquet/csv/
  * xlsx/json drops (newaugsver_clean.py save_to_formats :521) and
  * rejects unexpected extensions (run_invalid_extension_scenario,
  * DM_bankfile_validate_pipeline.py:3040).
  *
  * Reads enforce a caller-supplied schema so Catalyst prunes columns
  * at the scan and malformed rows are captured, not thrown: CSV/JSON
  * read PERMISSIVE with a `_corrupt_record` column. Extension checks
  * are metadata-only (no I/O).
  */
object Sources {

  val CorruptCol = "_corrupt_record"

  sealed trait ReadResult { def df: DataFrame }
  final case class Ok(df: DataFrame) extends ReadResult
  final case class BadExtension(df: DataFrame, extension: String) extends ReadResult
  final case class SchemaDrift(df: DataFrame, report: SchemaCheck.Report) extends ReadResult

  private val knownExtensions = Set("parquet", "orc", "csv", "json", "xlsx")

  def extensionOf(path: String): String = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot < 0) "" else base.substring(dot + 1).toLowerCase
  }

  /** Read `path` with `expected` schema enforced. Returns BadExtension
    * (empty frame) for unknown extensions, SchemaDrift when the file's
    * own schema disagrees (parquet only — CSV/JSON are cast into the
    * expected shape), else Ok. */
  def read(spark: SparkSession, path: String, expected: StructType): ReadResult = {
    extensionOf(path) match {
      case "parquet" =>
        val actual = spark.read.parquet(path)
        val report = SchemaCheck.check(expected, actual.schema)
        if (report.ok) Ok(actual) else SchemaDrift(actual, report)
      case "orc" =>
        val actual = spark.read.orc(path)
        val report = SchemaCheck.check(expected, actual.schema)
        if (report.ok) Ok(actual) else SchemaDrift(actual, report)
      case "csv" =>
        Ok(spark.read
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .schema(withCorrupt(expected))
          .csv(path))
      case "json" =>
        Ok(spark.read
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .schema(withCorrupt(expected))
          .json(path))
      case "xlsx" =>
        // xlsx carries no types — compare on column NAMES, with the
        // frame read all-string (the reference's generator writes
        // xlsx as an all-text feed, newaugsver_clean.py:521)
        val actual = Xlsx.read(spark, path)
        val expectedAsStrings = StructType(
          expected.fields.map(f => StructField(f.name, StringType, f.nullable)))
        val report = SchemaCheck.check(expectedAsStrings, actual.schema)
        if (report.ok) Ok(actual) else SchemaDrift(actual, report)
      case ext =>
        BadExtension(spark.emptyDataFrame, ext)
    }
  }

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** Rows the PERMISSIVE parser could not fit into the schema.
    * Spark refuses to query only the corrupt-record column of a raw
    * CSV/JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache first,
    * as the Spark docs prescribe; the cached parse is then shared with
    * the caller's valid-row slice instead of re-reading the file. */
  def corruptRows(df: DataFrame): DataFrame =
    if (df.columns.contains(CorruptCol)) df.cache().where(col(CorruptCol).isNotNull)
    else df.limit(0)

  /** JDBC table/query source — the reference's live-database side of
    * the error-count reconciliation (get_error_count_from_db,
    * DM_bankfile_validate_pipeline.py:786; run_sql_test.py): read the
    * DB's error table as a DataFrame and feed it straight into
    * [[graft.validate.ErrorCompare.diff]] against the CSV side.
    *
    * `table` may be a table name or a `(SELECT ...) alias` pushdown
    * subquery — the standard way to let the DATABASE do the filter
    * before rows cross the wire. Single-partition by default (a JDBC
    * read with no split column is one task); pass `partitionColumn` +
    * bounds to fan the read out across `numPartitions` executors — at
    * scale an unpartitioned JDBC read of a big table is a one-task
    * bottleneck, so callers reading more than reconciliation-sized
    * error tables should always split. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               properties: java.util.Properties = new java.util.Properties(),
               partitionColumn: Option[String] = None,
               lowerBound: Long = 0L, upperBound: Long = 0L,
               numPartitions: Int = 1): DataFrame =
    partitionColumn match {
      case Some(c) =>
        spark.read.jdbc(url, table, c, lowerBound, upperBound, numPartitions, properties)
      case None => spark.read.jdbc(url, table, properties)
    }

  /** Write one frame to several formats under `baseDir/<name>.<ext>`
    * — the reference generator's save_to_formats shape
    * (newaugsver_clean.py:521 writes the feed as parquet, csv, xlsx
    * and json side by side so every downstream consumer finds its
    * format). Supported: parquet, orc, csv (header), json, xlsx
    * (sharded part-file writer — no driver collect). Each sink is a
    * normal distributed write; every output re-reads through [[read]].
    */
  def writeFormats(df: DataFrame, baseDir: String, name: String,
                   formats: Seq[String]): Map[String, String] = {
    require(formats.nonEmpty, "no formats requested")
    formats.map {
      case "parquet" =>
        val p = s"$baseDir/$name.parquet"
        df.write.mode("overwrite").parquet(p); "parquet" -> p
      case "orc" =>
        val p = s"$baseDir/$name.orc"
        df.write.mode("overwrite").orc(p); "orc" -> p
      case "csv" =>
        val p = s"$baseDir/$name.csv"
        df.write.mode("overwrite").option("header", "true").csv(p); "csv" -> p
      case "json" =>
        val p = s"$baseDir/$name.json"
        df.write.mode("overwrite").json(p); "json" -> p
      case "xlsx" =>
        val p = s"$baseDir/$name.xlsx"
        Xlsx.writeSharded(df, p); "xlsx" -> p
      case other =>
        throw new IllegalArgumentException(s"unsupported format '$other'")
    }.toMap
  }

  /** Partitioned parquet writer with target file sizing — the scale-
    * friendly default sink (dataset partitioned by a low-cardinality
    * key, files sized by `spark.sql.files.maxRecordsPerFile`). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** One field of a fixed-width (copybook-style) record layout. */
  final case class FwField(name: String, width: Int) {
    require(width > 0, s"field $name: width must be positive")
  }

  /** Fixed-width text reader — the classic bank-feed layout the
    * reference's domain lives in (column positions, not delimiters).
    * `spark.read.text` + one narrow codegen'd substring projection:
    * scan-speed, splittable like any text source. Positions are CHAR
    * offsets (== byte offsets on the ASCII feeds these layouts
    * describe). Rows whose length differs from the layout total get
    * `_corrupt` = true with every field still extracted best-effort
    * (the PERMISSIVE convention: validation routes them, the read
    * never throws). `trimValues` strips the space padding;
    * `blankAsNull` turns all-padding fields into NULL. */
  def readFixedWidth(spark: SparkSession, path: String, fields: Seq[FwField],
                     trimValues: Boolean = true,
                     blankAsNull: Boolean = true): DataFrame = {
    require(fields.nonEmpty, "empty layout")
    require(fields.map(_.name).distinct.size == fields.size,
      "duplicate field names in layout")
    val total = fields.map(_.width).sum
    val starts = fields.scanLeft(1)((acc, f) => acc + f.width)
    val cols = fields.zip(starts).map { case (f, start) =>
      val raw = substring(col("value"), start, f.width)
      val t = if (trimValues) trim(raw) else raw
      val v = if (blankAsNull) when(trim(raw) === "", lit(null)).otherwise(t) else t
      v.as(f.name)
    }
    spark.read.text(path)
      .select(cols :+ (length(col("value")) =!= total).as("_corrupt"): _*)
  }

  /** Fixed-width writer: every column rendered at its layout width,
    * space-padded right (the bank convention), NULL as all-padding.
    * A value LONGER than its field is data loss — the write fails
    * fast per row (raise_error) unless `truncate` opts in. */
  def writeFixedWidth(df: DataFrame, path: String, fields: Seq[FwField],
                      truncate: Boolean = false): Unit = {
    val rendered = fields.map { f =>
      val s = coalesce(df(f.name).cast("string"), lit(""))
      val guarded =
        if (truncate) substring(s, 1, f.width)
        else when(length(s) > f.width,
          raise_error(concat(lit(s"field ${f.name} exceeds width ${f.width}: "), s)))
          .otherwise(s)
      rpad(guarded, f.width, " ")
    }
    df.select(concat(rendered: _*).as("value"))
      .write.mode("overwrite").text(path)
  }
}
