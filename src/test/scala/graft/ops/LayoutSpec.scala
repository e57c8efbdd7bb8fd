package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits round-robins bits (known small values)") {
    // x=0b11 at even positions, y=0b00 at odd → z = 0b0101 = 5
    val z = Seq((3L, 0L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(z === 5L)
    // x=0, y=0b11 → 0b1010 = 10
    val z2 = Seq((0L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(z2 === 10L)
  }

  test("z-order layout keeps BOTH columns' per-file spans narrow") {
    // 64x64 grid: sorting by x gives perfect x-spans but every file
    // covers y's full range; z-order keeps both narrow.
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val zCol = Layout.zorderValue(grid, Seq("x", "y"), bits = 6)
    val rowsPerFile = 256 // → 16 simulated files

    val ySpanXSort = Layout.avgFileSpan(grid, col("x"), "y", rowsPerFile)
    val ySpanZSort = Layout.avgFileSpan(grid.withColumn("z", zCol), col("z"), "y", rowsPerFile)
    val xSpanZSort = Layout.avgFileSpan(grid.withColumn("z", zCol), col("z"), "x", rowsPerFile)

    assert(ySpanXSort === 63.0) // x-sorted files see all of y
    // 256 rows of a 64x64 z-curve = one 16x16 tile → span 15 on both axes
    assert(ySpanZSort === 15.0)
    assert(xSpanZSort === 15.0)
  }

  test("real parquet footers: z-order narrows y min/max stats vs x-sort") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val z = grid.withColumn("z", Layout.zorderValue(grid, Seq("x", "y"), bits = 6))

    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.parquet(s"$dir/by_x")
    z.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .drop("z").write.parquet(s"$dir/by_z")

    // per-row-group y spans straight from the parquet footers — the
    // stats a reader's row-group skipping actually consults
    def ySpans(path: String): Seq[Long] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val s = b.getColumns.asScala
              .find(_.getPath.toDotString == "y").get.getStatistics
            s.genericGetMax.asInstanceOf[java.lang.Long] -
              s.genericGetMin.asInstanceOf[java.lang.Long]
          } finally r.close()
        }

    val xSpans = ySpans(s"$dir/by_x")
    val zSpans = ySpans(s"$dir/by_z")
    assert(xSpans.nonEmpty && zSpans.nonEmpty)
    val xAvg = xSpans.sum.toDouble / xSpans.size
    val zAvg = zSpans.sum.toDouble / zSpans.size
    // x-sorted files each cover ~the full y range; z-tiles cover ~1/4
    assert(zAvg < xAvg / 2, s"zAvg=$zAvg xAvg=$xAvg")
  }

  test("zorderValue handles constant columns (degenerate bounds)") {
    val df = spark.range(10).select(col("id").as("x"), lit(7L).as("y"))
    val z = df.select(Layout.zorderValue(df, Seq("x", "y"), bits = 4).as("z"))
      .agg(countDistinct("z")).head().getLong(0)
    assert(z === 10L) // constant col contributes 0 bits, x still orders
  }

  test("writeWithBloom: footers carry bloom filters that answer point probes") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val df = spark.range(50000)
      .select(col("id"), md5(col("id").cast("string")).as("fp"))
    Layout.writeWithBloom(df, s"$dir/with", Map("fp" -> 50000L))
    df.write.parquet(s"$dir/without")

    def bloomOf(path: String): Seq[Option[org.apache.parquet.column.values.bloomfilter.BloomFilter]] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            spark.sparkContext.hadoopConfiguration)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val c = b.getColumns.asScala.find(_.getPath.toDotString == "fp").get
            Option(r.getBloomFilterDataReader(b).readBloomFilter(c))
          } finally r.close()
        }

    val withB = bloomOf(s"$dir/with")
    assert(withB.nonEmpty && withB.forall(_.isDefined), "bloom filter missing")
    assert(bloomOf(s"$dir/without").forall(_.isEmpty), "unexpected bloom")

    // the filters answer membership: a present fp might-contains in
    // SOME row group (whichever holds it), and at ndv-sized capacity
    // most absent probes come back definitely-absent everywhere
    import org.apache.parquet.io.api.Binary
    val filters = withB.flatten
    def probe(s: String): Boolean =
      filters.exists(bf => bf.findHash(bf.hash(Binary.fromString(s))))
    val present = df.select("fp").as[String].head()
    assert(probe(present))
    val absentHits = (0 until 200).count(i => probe(s"absent-$i"))
    assert(absentHits < 40, s"$absentHits/200 false positives")
  }

  test("compact: many small files -> ceil(bytes/target) files, rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val df = (0 until 20000).map(i => (i.toLong, s"row-$i-payload-padding"))
      .toDF("id", "s")
    df.repartition(64).write.parquet(s"$base/in")
    val report = Layout.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 256 * 1024)
    assert(report.filesBefore == 64)
    assert(report.rows == 20000L)
    val expected = ((report.bytesBefore + 256 * 1024 - 1) / (256 * 1024)).toInt
    assert(report.filesAfter == expected,
      s"got ${report.filesAfter}, want $expected (bytes ${report.bytesBefore})")
    assert(report.filesAfter < 64)
    // content identical
    val back = spark.read.parquet(s"$base/out")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("compact refuses in-place rewrites and empty inputs") {
    val base = java.nio.file.Files.createTempDirectory("compact2").toString
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$base/x", s"$base/x", 1024)
    }
    new java.io.File(s"$base/empty").mkdirs()
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$base/empty", s"$base/out", 1024)
    }
  }
}
