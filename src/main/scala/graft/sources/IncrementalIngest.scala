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
  * not data); the ledger is a tiny append-only parquet the anti-join
  * broadcasts; the data read is exactly the pending files — partition
  * pruning by construction. File identity is (path, size): a file
  * overwritten IN PLACE with different size is treated as new
  * (reprocessed); same-size in-place rewrites are invisible, the
  * standard blind spot of listing-based ingest. */
object IncrementalIngest {

  /** Absolute paths under `inputDir` matching `glob`, minus files
    * already in the ledger, deterministically ordered. */
  def pendingFiles(spark: SparkSession, inputDir: String,
                   ledgerPath: String, glob: String = "*.parquet"): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new org.apache.hadoop.fs.Path(inputDir, glob)
    val fs = in.getFileSystem(conf)
    val listed = Option(fs.globStatus(in)).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(st => (st.getPath.toUri.getPath, st.getLen))
      .toSeq.sorted
    val done: Set[(String, Long)] =
      if (!new org.apache.hadoop.fs.Path(ledgerPath)
            .getFileSystem(conf).exists(new org.apache.hadoop.fs.Path(ledgerPath)))
        Set.empty
      else spark.read.parquet(ledgerPath)
        .select("file_path", "file_size").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    listed.filterNot(done)
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
