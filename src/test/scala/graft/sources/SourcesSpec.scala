package graft.sources

import graft.SparkSpec
import graft.bank.BankDataGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sources").toString

  test("parquet roundtrip with matching schema → Ok") {
    import spark.implicits._
    val dir = tmpDir() + "/ok.parquet"
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
      .write.parquet(dir)
    Sources.read(spark, dir, schema) match {
      case Sources.Ok(df) => assert(df.count() == 2)
      case other => fail(s"expected Ok, got $other")
    }
  }

  test("parquet with renamed column → SchemaDrift with rename identified") {
    import spark.implicits._
    val dir = tmpDir() + "/drift.parquet"
    Seq((1L, "a", 1.5)).toDF("id", "fullname", "score").write.parquet(dir)
    Sources.read(spark, dir, schema) match {
      case Sources.SchemaDrift(_, report) =>
        assert(report.renamed.exists(r => r.column == "name" && r.renamedTo == "fullname"))
      case other => fail(s"expected SchemaDrift, got $other")
    }
  }

  test("orc roundtrip with matching schema → Ok") {
    import spark.implicits._
    val dir = tmpDir() + "/ok.orc"
    Seq((1L, "a", 1.5)).toDF("id", "name", "score").write.orc(dir)
    Sources.read(spark, dir, schema) match {
      case Sources.Ok(df) => assert(df.count() == 1)
      case other => fail(s"expected Ok, got $other")
    }
  }

  test("xlsx round trip: write, read back, values and header survive") {
    import spark.implicits._
    val df = Seq(("A1", "hello & <world>", "1"), ("B2", null, "2"), ("C3", "quote\"d", "3"))
      .toDF("PayeeID", "OrganizationName", "Seq")
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString + "/feed.xlsx"
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("PayeeID", "OrganizationName", "Seq"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = back.orderBy("PayeeID").collect().map(_.toSeq)
    assert(rows(0) == Seq("A1", "hello & <world>", "1"))
    assert(rows(1) == Seq("B2", null, "2")) // nulls survive as absent cells
    assert(rows(2) == Seq("C3", "quote\"d", "3"))
  }

  test("xlsx cells with control chars and supplementary chars round-trip") {
    import spark.implicits._
    // U+0001 is forbidden by XML 1.0 even as a numeric reference — it
    // must be STRIPPED (not escaped) or the write→read round trip dies
    // in the reader's XML parse; supplementary-plane code points
    // (emoji = a surrogate PAIR in UTF-16) are legal XML and must
    // survive — a code-unit filter would drop them.
    val df = Seq(("A1", "badctl"), ("B2", "ok 😀 emoji"), ("C3", "tab\tkept"))
      .toDF("PayeeID", "OrganizationName")
    val path = java.nio.file.Files.createTempDirectory("xlsxc").toString + "/ctl.xlsx"
    Xlsx.write(df, path)
    val rows = Xlsx.read(spark, path).orderBy("PayeeID").collect()
      .map(_.getString(1)).toSeq
    assert(rows == Seq("badctl", "ok 😀 emoji", "tab\tkept"))
  }

  test("xlsx through Sources.read: extension accepted, name drift detected") {
    import spark.implicits._
    val df = Seq(("X", "1")).toDF("PayeeID", "Amount")
    val dir = java.nio.file.Files.createTempDirectory("xlsx2").toString
    Xlsx.write(df, s"$dir/drop.xlsx")
    val expected = StructType(Seq(
      StructField("PayeeID", StringType), StructField("Amount", StringType)))
    assert(Sources.read(spark, s"$dir/drop.xlsx", expected).isInstanceOf[Sources.Ok])
    val drifted = StructType(Seq(
      StructField("PayeeID", StringType), StructField("Total", StringType)))
    assert(Sources.read(spark, s"$dir/drop.xlsx", drifted).isInstanceOf[Sources.SchemaDrift])
  }

  test("xlsx distributed readDir parses many workbooks executor-side") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsx3").toString
    for (i <- 1 to 3)
      Xlsx.write(Seq((s"P$i", s"$i")).toDF("PayeeID", "Seq"), s"$dir/part$i.xlsx")
    val schema = StructType(Seq(
      StructField("PayeeID", StringType), StructField("Seq", StringType)))
    val all = Xlsx.readDir(spark, s"$dir/*.xlsx", schema)
    assert(all.count() == 3)
    assert(all.orderBy("PayeeID").collect().map(_.getString(0)).toSeq == Seq("P1", "P2", "P3"))
  }

  test("xlsx write fails fast above the row cap; bounded collect under it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xlsxcap").toString
    val big = spark.range(500).select(col("id").cast("string").as("v"))
    val e = intercept[IllegalArgumentException] {
      Xlsx.write(big, s"$dir/too-big.xlsx", maxRows = 100)
    }
    assert(e.getMessage.contains("xlsx write refused"))
    assert(!new java.io.File(s"$dir/too-big.xlsx").exists())
    // under the cap: normal round trip
    Xlsx.write(big.where(col("v").cast("long") < 50), s"$dir/ok.xlsx", maxRows = 100)
    assert(Xlsx.read(spark, s"$dir/ok.xlsx").count() == 50)
  }

  test("xlsx writeSharded emits sized part-files that readDir reassembles") {
    val dir = java.nio.file.Files.createTempDirectory("xlsxshard").toString
    val df = spark.range(1000).select(
      concat(lit("P"), col("id")).as("PayeeID"), col("id").cast("string").as("Seq"))
    Xlsx.writeSharded(df, s"$dir/out", rowsPerFile = 300)
    val parts = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.matches("part-\\d{5}\\.xlsx"))
    assert(parts.length == 4) // ceil(1000 / 300)
    val schema = StructType(Seq(
      StructField("PayeeID", StringType), StructField("Seq", StringType)))
    val back = Xlsx.readDir(spark, s"$dir/out/*.xlsx", schema)
    assert(back.count() == 1000)
    assert(back.select("Seq").collect().map(_.getString(0).toLong).toSet
      == (0L until 1000L).toSet)
  }

  test("unknown extension rejected without I/O (run_invalid_extension_scenario)") {
    Sources.read(spark, "/some/path/data.xyz", schema) match {
      case Sources.BadExtension(_, ext) => assert(ext == "xyz")
      case other => fail(s"expected BadExtension, got $other")
    }
  }

  test("csv malformed rows land in _corrupt_record, not exceptions") {
    val dir = tmpDir()
    val f = java.nio.file.Paths.get(dir, "data.csv")
    Files.writeString(f, "id,name,score\n1,a,1.5\nnot-a-long,b,oops\n2,c,2.5\n")
    Sources.read(spark, f.toString, schema) match {
      case Sources.Ok(df) =>
        assert(df.count() == 3)
        assert(Sources.corruptRows(df).count() == 1) // must not need caller-side cache
        df.unpersist()
      case other => fail(s"expected Ok, got $other")
    }
  }

  test("writePartitioned produces partition directories") {
    val dir = tmpDir() + "/out"
    val df = BankDataGen.generate(spark, 100)
    Sources.writePartitioned(df, dir, Seq("OrganizationCode"))
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("OrganizationCode="))
    assert(parts.nonEmpty)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
  }

  test("partition filter prunes at the scan (PartitionFilters, not post-filter)") {
    val dir = tmpDir() + "/pruned"
    Sources.writePartitioned(BankDataGen.generate(spark, 200), dir, Seq("OrganizationCode"))
    val q = spark.read.parquet(dir).where(col("OrganizationCode") === "M")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("OrganizationCode"), s"no partition pruning in:\n$plan")
    // pruned scan must read only the M partition's files
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("isnotnull(OrganizationCode") || scanned.contains("OrganizationCode"))
    assert(q.count() > 0)
  }

  test("writeFormats lands every requested format; each re-reads through read()") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "score")
    val paths = Sources.writeFormats(df, dir, "feed",
      Seq("parquet", "orc", "csv", "json", "xlsx"))
    assert(paths.keySet == Set("parquet", "orc", "csv", "json", "xlsx"))
    // typed formats round-trip values exactly
    for (f <- Seq("parquet", "orc")) {
      val got = Sources.read(spark, paths(f), schema)
      assert(got.isInstanceOf[Sources.Ok], s"$f: $got")
      assert(got.df.orderBy("id").collect().map(_.toSeq).toSeq ==
        df.orderBy("id").collect().map(_.toSeq).toSeq, f)
    }
    // text formats re-read through the PERMISSIVE parser: same rows,
    // values compared as typed after the schema-applied parse
    for (f <- Seq("csv", "json")) {
      val got = Sources.read(spark, paths(f), schema).df
      assert(Sources.corruptRows(got).isEmpty, f)
      assert(got.select("id", "name", "score").orderBy("id").collect().map(_.toSeq).toSeq ==
        df.orderBy("id").collect().map(_.toSeq).toSeq, f)
    }
    // xlsx is all-string by contract; sharded output reassembles
    val x = Xlsx.readDir(spark, paths("xlsx") + "/part-*.xlsx", StructType(
      schema.fields.map(fd => StructField(fd.name, StringType, fd.nullable))))
    assert(x.count() == 3 &&
      x.select("name").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    val err = intercept[IllegalArgumentException] {
      Sources.writeFormats(df, dir, "feed", Seq("avro"))
    }
    assert(err.getMessage.contains("avro"))
  }

  test("fixed-width round trip: layout positions, padding, nulls") {
    import spark.implicits._
    import Sources.FwField
    val dir = java.nio.file.Files.createTempDirectory("fw").toString
    val layout = Seq(FwField("acct", 6), FwField("name", 10), FwField("amt", 8))
    val df = Seq(
      ("A00001", Some("ALICE"), Some("12.50")),
      ("B00002", None, Some("999.99")),
      ("C00003", Some("CAROL"), None)
    ).toDF("acct", "name", "amt")
    Sources.writeFixedWidth(df, s"$dir/feed.txt", layout)
    // the raw lines really are fixed-width records
    val raw = spark.read.text(s"$dir/feed.txt").as[String].collect()
    assert(raw.forall(_.length == 24))
    assert(raw.exists(_ == "A00001ALICE     12.50   "))
    val back = Sources.readFixedWidth(spark, s"$dir/feed.txt", layout)
    assert(back.where(col("_corrupt")).count() == 0)
    val rows = back.orderBy("acct")
      .select("acct", "name", "amt").collect()
    assert(rows(0).getString(1) == "ALICE" && rows(0).getString(2) == "12.50")
    assert(rows(1).isNullAt(1)) // all-padding field reads back as NULL
    assert(rows(2).isNullAt(2))
  }

  test("fixed-width: wrong-length records flag _corrupt, fields best-effort") {
    import spark.implicits._
    import Sources.FwField
    val dir = java.nio.file.Files.createTempDirectory("fw2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.txt"),
      "A00001ALICE     12.50   \nB00002BOB\n")
    val layout = Seq(FwField("acct", 6), FwField("name", 10), FwField("amt", 8))
    val back = Sources.readFixedWidth(spark, s"$dir/bad.txt", layout)
      .orderBy("acct").collect()
    assert(!back(0).getAs[Boolean]("_corrupt"))
    assert(back(1).getAs[Boolean]("_corrupt"))
    assert(back(1).getAs[String]("name") == "BOB") // still extracted
    assert(back(1).isNullAt(2))
  }

  test("fixed-width write fails fast on overlong values unless truncate opts in") {
    import spark.implicits._
    import Sources.FwField
    val dir = java.nio.file.Files.createTempDirectory("fw3").toString
    val layout = Seq(FwField("name", 4))
    val df = Seq(Tuple1("TOOLONG")).toDF("name")
    val e = intercept[Exception] {
      Sources.writeFixedWidth(df, s"$dir/x.txt", layout)
    }
    assert(e.getMessage.contains("exceeds width") ||
      String.valueOf(e.getCause).contains("exceeds width"))
    Sources.writeFixedWidth(df, s"$dir/y.txt", layout, truncate = true)
    val back = Sources.readFixedWidth(spark, s"$dir/y.txt", layout)
    assert(back.select("name").as[String].head() == "TOOL")
  }
}
