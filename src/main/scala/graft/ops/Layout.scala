package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-column scan pruning.
  *
  * Parquet readers skip row groups whose min/max statistics exclude a
  * filter. Sorting by one column makes ITS stats razor-sharp and every
  * other column's useless; interleaving the bits of several columns
  * before sorting keeps every participating column's per-file range
  * narrow, so filters on ANY of them prune files. This is the layout
  * lever for 100 TB tables queried on more than one dimension — it
  * changes nothing about query code, only `sortWithinPartitions`/
  * `orderBy` keys at write time.
  *
  * All bit-spreading below is plain long arithmetic on codegen'd
  * built-ins (shiftleft / bitwiseOR / floor) — no UDF, stays inside
  * whole-stage codegen, and is deterministic across retries.
  */
object Layout {

  /** Interleave the low `bits` bits of each (already scaled,
    * non-negative) column round-robin: bit b of column i lands at
    * position b * n + i. Requires n * bits <= 63. */
  def interleaveBits(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"interleave of ${cols.size} cols x $bits bits exceeds 63 bits")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Min/max-scale a numeric column into [0, 2^bits) given the column's
    * global bounds (one tiny agg to fetch them — see [[zorderValue]]). */
  def scaleTo(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    val buckets = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(buckets),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets.toDouble)).cast("long"))
  }

  /** Z-value column for `cols` of `df`: computes each column's global
    * min/max (single tiny aggregate), scales, and interleaves. The
    * bounds aggregate is the only extra pass; the z-value itself is
    * narrow. Typical use:
    * {{{
    *   df.withColumn("z", Layout.zorderValue(df, Seq("x", "y")))
    *     .repartitionByRange(nFiles, col("z"))
    *     .sortWithinPartitions("z")
    *     .write.parquet(path)
    * }}} */
  def zorderValue(df: DataFrame, colNames: Seq[String], bits: Int = 16): Column = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"lo_$c"), max(col(c).cast("double")).as(s"hi_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = colNames.zipWithIndex.map { case (c, i) =>
      scaleTo(col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
    }
    interleaveBits(scaled, bits)
  }

  /** Parquet write with split-block Bloom filters on `bloomCols` —
    * the point-lookup complement to min/max pruning: range stats skip
    * row groups for RANGE predicates on sorted/z-ordered columns, but
    * an `id = X` / `fp = 'h...'` probe on a high-cardinality UNSORTED
    * column (content hashes, URL hashes, user ids) excludes almost no
    * row group by range. A Bloom filter per row group answers
    * "definitely absent" in one bitset probe, so a reader skips every
    * row group but the (usually one) possible hit — the index-free
    * needle-in-100 TB lookup. `expectedNdv` sizes the filter
    * (per-column override via the map form); readers use it
    * automatically when `parquet.filter.bloom.enabled` (default on).
    * This only sets WRITE options — layout code stays declarative. */
  def writeWithBloom(df: DataFrame, path: String,
                     expectedNdv: Map[String, Long]): Unit = {
    require(expectedNdv.nonEmpty, "no bloom columns given")
    val writer = expectedNdv.foldLeft(df.write.mode("overwrite")) {
      case (w, (c, ndv)) =>
        require(df.columns.contains(c), s"bloom column $c not in frame")
        require(ndv > 0, s"expectedNdv for $c must be positive")
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    writer.parquet(path)
  }

  /** One compaction pass's accounting. */
  final case class CompactReport(filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long, rows: Long)

  /** Small-file compaction: rewrite a parquet dataset into files of
    * roughly `targetBytes` — the maintenance operator every
    * incrementally-written table needs (streaming sinks and per-batch
    * jobs emit a file per task per trigger; a year later the table is
    * millions of KB-files and scan planning, not I/O, dominates).
    *
    * Output file count = ceil(input bytes / targetBytes), derived from
    * the FILE LISTING (no data pass); the rewrite is one
    * `repartition(n)` — a single round-robin shuffle that also heals
    * skewed input files. Input compressed bytes proxy output bytes
    * (same codec ⇒ same ratio; the report records both). Writes to
    * `outPath` — compact-then-swap, never in place (an in-place
    * rewrite that fails mid-way loses the table). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): CompactReport = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(inPath != outPath, "compact writes aside, never in place")
    def listParquet(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(hp).toSeq.filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
    }
    val before = listParquet(inPath)
    require(before.nonEmpty, s"no parquet files under $inPath")
    val bytesBefore = before.map(_.getLen).sum
    val n = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    val after = listParquet(outPath)
    CompactReport(before.size, bytesBefore, after.size,
      after.map(_.getLen).sum, spark.read.parquet(outPath).count())
  }

  /** Average per-file min/max span of `statCol` under a given ordering
    * — the direct proxy for row-group skipping effectiveness (smaller
    * span ⇒ a point/range filter on `statCol` excludes more files).
    * Simulates the file split the writer above would produce. */
  def avgFileSpan(df: DataFrame, orderCol: Column, statCol: String,
                  rowsPerFile: Int): Double = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCol, col(statCol)) // global: analysis only
    df.withColumn("_file", ((row_number().over(w) - 1) / rowsPerFile).cast("long"))
      .groupBy("_file")
      .agg((max(col(statCol).cast("double")) - min(col(statCol).cast("double"))).as("span"))
      .agg(avg("span")).head().getDouble(0)
  }
}
