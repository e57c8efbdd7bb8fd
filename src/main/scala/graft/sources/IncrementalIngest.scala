package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch ingest over a growing file directory — the
  * "process only what arrived since the last run" pattern every
  * scheduled pipeline needs (the reference's drop-folder scenarios
  * re-scan the whole folder each run): a LEDGER parquet table records
  * every file already processed; each run lists the input directory,
  * anti-joins the ledger, processes only the pending files, then
  * appends them to the ledger.
  *
  * Delivery contract: AT-LEAST-ONCE. The ledger append happens after
  * `process` returns — a crash between the two reprocesses those
  * files next run, so sinks must be idempotent (the repo convention:
  * batch_id-partitioned dynamic overwrite, as validateAndRoute's
  * sinks are). Exactly-once would need the sink and ledger in one
  * atomic commit — that is a table format's job (Delta/Iceberg), not
  * a file ledger's, and the limitation is documented rather than
  * papered over.
  *
  * Scale shape: the listing is one driver RPC per run (file metadata,
  * not data); the ledger is an append-only parquet that the pending
  * check anti-joins DISTRIBUTED (broadcast listing vs streamed
  * ledger — the ledger grows with run history and never lands on the
  * driver); the data read is exactly the pending files — partition
  * pruning by construction. File identity is (path, size): a file
  * overwritten IN PLACE with different size is treated as new
  * (reprocessed); same-size in-place rewrites are invisible, the
  * standard blind spot of listing-based ingest. */
object IncrementalIngest {

  /** Absolute paths under `inputDir` matching `glob`, minus files
    * already in the ledger, deterministically ordered.
    *
    * The subtraction is a DISTRIBUTED left-anti join of the listing
    * frame against the ledger frame — never a collect of the ledger:
    * the ledger grows with run HISTORY, unbounded, while the listing
    * is one directory's current state. Only the anti-join's survivors
    * (this run's new files) ever reach the driver, and that set is
    * inherently driver-sized — `spark.read.parquet(paths)` needs the
    * concrete path list anyway. The listing side is tiny, so Spark
    * broadcasts IT and streams the ledger past it. */
  def pendingFiles(spark: SparkSession, inputDir: String,
                   ledgerPath: String, glob: String = "*.parquet"): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inputDir, glob)
    val fs = in.getFileSystem(conf)
    val listed = Option(fs.globStatus(in)).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(st => (st.getPath.toUri.getPath, st.getLen))
      .toSeq.sorted
    if (listed.isEmpty) return Seq.empty
    val hasLedger = new org.apache.hadoop.fs.Path(ledgerPath)
      .getFileSystem(conf).exists(new org.apache.hadoop.fs.Path(ledgerPath))
    if (!hasLedger) return listed
    import spark.implicits._
    val listing = broadcast(listed.toDF("file_path", "file_size"))
    val done = spark.read.parquet(ledgerPath).select("file_path", "file_size")
    listing.join(done, Seq("file_path", "file_size"), "left_anti")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq.sorted
  }

  /** Compact the ledger: run history accretes one small parquet file
    * per batch (the `coalesce(1)` append), so a long-lived pipeline's
    * ledger becomes a small-file field that slows every pending scan.
    *
    * In-place swap, never a missing-ledger window: the earlier
    * rename(p, old); rename(aside, p) dance left `ledgerPath`
    * nonexistent between the renames, and a concurrent [[pendingFiles]]
    * run in that window saw "no ledger" and returned EVERY listed file
    * as pending — duplicate ingestion. Instead: (1) snapshot the
    * ledger's current data files, (2) compact aside, (3) MOVE the
    * compacted files INTO the live ledger path, (4) delete exactly the
    * snapshotted old files. The ledger path exists throughout; in the
    * (3)→(4) overlap both copies are present, which only duplicates
    * ledger ROWS — harmless, because pendingFiles subtracts by
    * anti-join on (file_path, file_size), where duplicates are a
    * no-op. A reader racing step (4) can at worst fail loudly on a
    * vanished file (Spark retries the task); it can never silently
    * re-ingest. */
  def compactLedger(spark: SparkSession, ledgerPath: String,
                    targetBytes: Long = 64L * 1024 * 1024): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return
    val olds = fs.listStatus(p).toSeq.filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    if (olds.isEmpty) return
    val aside = new org.apache.hadoop.fs.Path(ledgerPath + ".compact")
    if (fs.exists(aside)) fs.delete(aside, true)
    graft.ops.Layout.compact(spark, ledgerPath, aside.toString, targetBytes)
    val stamp = java.lang.System.nanoTime()
    fs.listStatus(aside).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .zipWithIndex.foreach { case (s, i) =>
        val dst = new org.apache.hadoop.fs.Path(p,
          s"compacted-$stamp-$i-${s.getPath.getName}")
        if (!fs.rename(s.getPath, dst))
          sys.error(s"ledger compaction: rename ${s.getPath} -> $dst failed")
      }
    olds.foreach(s => fs.delete(s.getPath, false))
    fs.delete(aside, true)
  }

  /** Run one incremental batch: read the pending files (if any), hand
    * the frame to `process`, then record the files in the ledger with
    * `batchId`. Returns the processed paths (empty = clean no-op, no
    * jobs run). */
  def ingest(spark: SparkSession, inputDir: String, ledgerPath: String,
             batchId: Long, glob: String = "*.parquet")
            (process: DataFrame => Unit): Seq[String] = {
    val pending = pendingFiles(spark, inputDir, ledgerPath, glob)
    if (pending.isEmpty) return Seq.empty
    val df = spark.read.parquet(pending.map(_._1): _*)
    process(df)
    import spark.implicits._
    pending.map { case (p, sz) => (p, sz, batchId) }
      .toDF("file_path", "file_size", "batch_id")
      .coalesce(1).write.mode(SaveMode.Append).parquet(ledgerPath)
    pending.map(_._1)
  }

  /** The ledger as a frame (file_path, file_size, batch_id) — audit
    * surface for "what did batch N ingest". */
  def ledger(spark: SparkSession, ledgerPath: String): DataFrame =
    spark.read.parquet(ledgerPath)
      .select(col("file_path"), col("file_size"), col("batch_id"))
}
