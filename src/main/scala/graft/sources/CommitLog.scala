package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal transactional table format: parquet partitions made
  * visible by an atomic commit log.
  *
  * The streaming sinks' (run_id, batch_id) dynamic-overwrite
  * discipline is idempotent under retry, but a reader that lists the
  * table mid-write can see a batch's files before the batch finishes —
  * torn reads. This upgrades the convention to ATOMIC VISIBILITY:
  *
  *   table/
  *     _commits/<runId>-<batchId>.commit   ← the log (one marker per
  *                                           committed batch, created
  *                                           by atomic rename)
  *     run_id=R/batch_id=B/part-*.parquet  ← data, written BEFORE its
  *                                           marker exists
  *
  * Writer protocol ([[writeBatch]]): (1) dynamic-overwrite the
  * (run_id, batch_id) partition — a retry of the same batch replaces
  * its own files and nobody else's; (2) create the commit marker by
  * write-temp-then-rename — rename is atomic on HDFS/posix (and the
  * single-object PUT it maps to on object stores), so the marker
  * either exists complete or not at all. A marker that already exists
  * makes the commit a no-op: replayed batches stay exactly-once.
  *
  * Reader protocol ([[readCommitted]]): list `_commits`, then read
  * EXACTLY the committed partition directories (passed as explicit
  * paths with `basePath` so partition columns survive). An
  * uncommitted batch — in-flight writer, or a crash after data files
  * but before the marker — is structurally invisible: its directory
  * is never listed, its files never opened. No filter, no OR-chain
  * over pairs, pruning is perfect at any commit count because the
  * committed SET is the file listing.
  *
  * Underscore-prefixed `_commits` is ignored by Spark/Hadoop input
  * listing, so a legacy whole-table `spark.read.parquet(table)` still
  * works (it just loses the visibility guarantee).
  *
  * Scale: the log is one tiny file per batch — listing it is a
  * metadata read of #batches entries, independent of data volume;
  * [[compactLog]] folds old markers into one snapshot file when
  * #batches itself grows large. Readers never list data directories
  * they will not read, which on object stores is the difference
  * between O(committed) and O(everything ever attempted).
  */
object CommitLog {

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def commitsDir(table: String) = s"$table/_commits"

  private def markerName(runId: String, batchId: Long) = {
    require(!runId.contains("-") && !runId.contains("/"),
      s"runId must not contain '-' or '/': $runId")
    f"$runId-$batchId%020d.commit"
  }

  /** Write one batch's rows into its (run_id, batch_id) partition and
    * atomically commit it. Safe to replay with the same ids. */
  def writeBatch(df: DataFrame, table: String, runId: String, batchId: Long): Unit = {
    df.withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id")
      .parquet(table)
    commit(df.sparkSession, table, runId, batchId)
  }

  /** Mark an already-written (run_id, batch_id) partition committed.
    * Atomic (temp + rename), idempotent (existing marker wins). */
  def commit(spark: SparkSession, table: String, runId: String, batchId: Long): Unit = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    hfs.mkdirs(dir)
    val marker = new org.apache.hadoop.fs.Path(dir, markerName(runId, batchId))
    if (hfs.exists(marker)) return
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".${markerName(runId, batchId)}.${java.util.UUID.randomUUID()}.tmp")
    val out = hfs.create(tmp, true)
    try out.write(s"run_id=$runId\nbatch_id=$batchId\n".getBytes("UTF-8"))
    finally out.close()
    // rename onto the final name; losing a race to another committer
    // of the same batch is success, not failure
    if (!hfs.rename(tmp, marker)) {
      hfs.delete(tmp, false)
      if (!hfs.exists(marker))
        sys.error(s"could not commit $marker")
    }
  }

  /** Parse the (run_id, batch_id) entries carried by a given set of
    * log file names — `.commit` markers encode one entry in the name,
    * `.snapshot` files fold many entries in their body. */
  private def entriesOf(hfs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, names: Seq[String]): Seq[(String, Long)] =
    names.flatMap {
      case n if n.endsWith(".commit") =>
        val stem = n.stripSuffix(".commit")
        val cut = stem.lastIndexOf('-')
        Seq((stem.substring(0, cut), stem.substring(cut + 1).toLong))
      case n if n.endsWith(".snapshot") =>
        val in = hfs.open(new org.apache.hadoop.fs.Path(dir, n))
        val text = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          bos.toString("UTF-8")
        } finally in.close()
        text.linesIterator.filter(_.nonEmpty).map { line =>
          val Array(r, b) = line.split(",", 2)
          (r, b.toLong)
        }.toSeq
      case _ => Seq.empty
    }

  /** The committed (run_id, batch_id) set, from the log. Snapshot
    * files (from [[compactLog]]) contribute their folded entries. */
  def committedBatches(spark: SparkSession, table: String): Seq[(String, Long)] = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return Seq.empty
    entriesOf(hfs, dir, hfs.listStatus(dir).toSeq.map(_.getPath.getName))
      .distinct.sorted
  }

  /** Read exactly the committed partitions. Returns None when the log
    * is empty (a table with no committed data has no schema to offer —
    * callers decide whether that is empty-ok or an error). */
  def readCommitted(spark: SparkSession, table: String): Option[DataFrame] = {
    val committed = committedBatches(spark, table)
    if (committed.isEmpty) None
    else {
      val paths = committed.map { case (r, b) => s"$table/run_id=$r/batch_id=$b" }
      Some(spark.read.option("basePath", table).parquet(paths: _*))
    }
  }

  /** Fold all individual commit markers into one `.snapshot` file —
    * bounds log-listing cost when #batches grows large. The snapshot
    * is written atomically FIRST, then the folded markers removed;
    * a crash between the two leaves duplicate entries, which
    * [[committedBatches]] dedupes. */
  def compactLog(spark: SparkSession, table: String): Unit = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return
    // ONE listing drives both the fold and the cleanup: the snapshot
    // folds exactly these files and only these files are deleted. A
    // marker committed by a concurrent writer AFTER this listing is
    // neither folded nor deleted — it stays visible as a live marker
    // until the next compaction (the earlier read-then-relist shape
    // could delete such a marker without folding it, permanently
    // hiding a committed batch).
    val olds = hfs.listStatus(dir).toSeq
      .filter(s => s.getPath.getName.endsWith(".commit") ||
        s.getPath.getName.endsWith(".snapshot"))
    val committed =
      entriesOf(hfs, dir, olds.map(_.getPath.getName)).distinct.sorted
    if (committed.isEmpty) return
    val body = committed.map { case (r, b) => s"$r,$b" }.mkString("\n")
    val name = f"snap-${committed.length}%010d-${java.lang.System.nanoTime()}%020d.snapshot"
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
    val out = hfs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val snap = new org.apache.hadoop.fs.Path(dir, name)
    if (!hfs.rename(tmp, snap)) { hfs.delete(tmp, false); sys.error(s"snapshot rename failed: $snap") }
    olds.foreach(s => hfs.delete(s.getPath, false))
  }

  /** Delete data partitions that were never committed (crashed
    * writers). Only removes (run_id, batch_id) directories absent
    * from the log — an in-flight writer's partition is also absent,
    * so vacuum only what is older than `graceMs`. */
  def vacuum(spark: SparkSession, table: String, graceMs: Long = 24L * 3600 * 1000): Unit = {
    val committed = committedBatches(spark, table).toSet
    val (hfs, root) = fs(spark, table)
    if (!hfs.exists(root)) return
    val now = java.lang.System.currentTimeMillis()
    for {
      runDir <- hfs.listStatus(root).toSeq
      if runDir.isDirectory && runDir.getPath.getName.startsWith("run_id=")
      runId = runDir.getPath.getName.stripPrefix("run_id=")
      batchDir <- hfs.listStatus(runDir.getPath).toSeq
      if batchDir.isDirectory && batchDir.getPath.getName.startsWith("batch_id=")
      batchId = batchDir.getPath.getName.stripPrefix("batch_id=").toLong
      if !committed.contains((runId, batchId))
      if now - batchDir.getModificationTime > graceMs
    } hfs.delete(batchDir.getPath, true)
  }
}
