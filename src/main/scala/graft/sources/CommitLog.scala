package graft.sources

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

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

  /** Per-column batch statistics carried by a commit marker — the
    * Iceberg-manifest idea at batch granularity: a reader with a range
    * predicate prunes whole BATCH DIRECTORIES from its listing before
    * any parquet footer is opened. min/max are rendered as strings;
    * `typ` says how to compare ("num" → numeric, anything else →
    * lexicographic). An all-NULL column records no stats row. */
  final case class ColStats(col: String, typ: String, min: String, max: String)

  // stats wire format: col:typ:min:max;... with %-escaping of the
  // separators (and % itself) inside rendered values
  private def esc(s: String): String =
    s.flatMap {
      case '%' => "%25"
      case ':' => "%3a"
      case ';' => "%3b"
      case '\t' => "%09"
      case '\n' => "%0a"
      case '\r' => "%0d"
      case c => c.toString
    }
  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
  private def encodeStats(stats: Seq[ColStats]): String =
    stats.map(s => s"${esc(s.col)}:${esc(s.typ)}:${esc(s.min)}:${esc(s.max)}")
      .mkString(";")
  private def decodeStats(s: String): Seq[ColStats] =
    s.split(";").toSeq.filter(_.nonEmpty).flatMap { part =>
      part.split(":", 4) match {
        case Array(c, t, mn, mx) =>
          Seq(ColStats(unesc(c), unesc(t), unesc(mn), unesc(mx)))
        case _ => Seq.empty
      }
    }

  // ---- schema-in-marker (r15): evolution without footer reads ---- //

  /** The (name, type-DDL) fingerprint of a batch frame, recorded in
    * its commit marker so readers reconcile schemas from METADATA —
    * never by opening parquet footers. Partition columns
    * (run_id/batch_id) are added at write and excluded here. */
  private def schemaOf(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.sql)

  private def encodeSchema(s: Seq[(String, String)]): String =
    s.map { case (n, t) => s"${esc(n)}:${esc(t)}" }.mkString(";")
  private def decodeSchema(s: String): Seq[(String, String)] =
    s.split(";").toSeq.filter(_.nonEmpty).flatMap { part =>
      part.split(":", 2) match {
        case Array(n, t) => Seq((unesc(n), unesc(t)))
        case _ => Seq.empty
      }
    }

  private val intChain = Seq("TINYINT", "SMALLINT", "INT", "BIGINT")
  private val floatChain = Seq("FLOAT", "DOUBLE")

  /** Widest of two recorded types under the WIDENING-ONLY evolution
    * rules (integral chain tinyint→…→bigint, float→double; identical
    * types always compatible); None = incompatible drift. */
  private[sources] def widen(a: String, b: String): Option[String] =
    if (a == b) Some(a)
    else {
      val ia = intChain.indexOf(a); val ib = intChain.indexOf(b)
      if (ia >= 0 && ib >= 0) Some(intChain(math.max(ia, ib)))
      else {
        val fa = floatChain.indexOf(a); val fb = floatChain.indexOf(b)
        if (fa >= 0 && fb >= 0) Some(floatChain(math.max(fa, fb)))
        else None
      }
    }

  /** Write one batch's rows into its (run_id, batch_id) partition and
    * atomically commit it. Safe to replay with the same ids. */
  def writeBatch(df: DataFrame, table: String, runId: String,
      batchId: Long, ts: Long = -1L): Unit = {
    df.withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id")
      .parquet(table)
    commitWithMeta(df.sparkSession, table, runId, batchId, Seq.empty,
      schemaOf(df), ts)
  }

  /** [[writeBatch]] recording min/max stats for `statsCols` in the
    * commit marker — one extra small aggregate job over the batch buys
    * batch-directory pruning for every future range read. */
  def writeBatchWithStats(df: DataFrame, table: String, runId: String,
      batchId: Long, statsCols: Seq[String], ts: Long = -1L): Unit = {
    val pinned = df.localCheckpoint(eager = false)
    pinned.withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id")
      .parquet(table)
    val stats =
      if (statsCols.isEmpty) Seq.empty[ColStats]
      else {
        val aggs = statsCols.flatMap(c =>
          Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
        val row = pinned.agg(aggs.head, aggs.tail: _*).collect()(0)
        val types = pinned.schema.fields.map(f => f.name -> f.dataType).toMap
        statsCols.zipWithIndex.flatMap { case (c, i) =>
          val mn = row.get(2 * i)
          val mx = row.get(2 * i + 1)
          if (mn == null || mx == null) Seq.empty
          else {
            val numeric = types(c) match {
              case _: org.apache.spark.sql.types.NumericType => true
              case _ => false
            }
            Seq(ColStats(c, if (numeric) "num" else "str",
              mn.toString, mx.toString))
          }
        }
      }
    commitWithMeta(df.sparkSession, table, runId, batchId, stats,
      schemaOf(pinned), ts)
  }

  /** Mark an already-written (run_id, batch_id) partition committed.
    * Atomic (temp + rename), idempotent (existing marker wins). */
  def commit(spark: SparkSession, table: String, runId: String, batchId: Long): Unit =
    commitWithMeta(spark, table, runId, batchId, Seq.empty, Seq.empty)

  /** [[commit]] carrying per-column stats in the marker body. */
  def commitWithStats(spark: SparkSession, table: String, runId: String,
      batchId: Long, stats: Seq[ColStats]): Unit =
    commitWithMeta(spark, table, runId, batchId, stats, Seq.empty)

  /** [[commit]] carrying stats AND the batch's schema fingerprint —
    * what [[writeBatch]]/[[writeBatchWithStats]] record so reads can
    * reconcile evolved schemas from marker metadata alone. The marker
    * also records a COMMIT TIMESTAMP (wall millis; pass `ts` ≥ 0 to
    * pin it — tests and backfills) powering
    * [[readCommittedAsOfTimestamp]] time travel. */
  def commitWithMeta(spark: SparkSession, table: String, runId: String,
      batchId: Long, stats: Seq[ColStats],
      schema: Seq[(String, String)], ts: Long = -1L): Unit = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    hfs.mkdirs(dir)
    val marker = new org.apache.hadoop.fs.Path(dir, markerName(runId, batchId))
    if (hfs.exists(marker)) return
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".${markerName(runId, batchId)}.${java.util.UUID.randomUUID()}.tmp")
    val statsLine =
      if (stats.isEmpty) "" else s"stats=${encodeStats(stats)}\n"
    val schemaLine =
      if (schema.isEmpty) "" else s"schema=${encodeSchema(schema)}\n"
    val tsv = if (ts >= 0) ts else java.lang.System.currentTimeMillis()
    val tsLine = s"ts=$tsv\n"
    val out = hfs.create(tmp, true)
    try out.write(
      s"run_id=$runId\nbatch_id=$batchId\n$statsLine$schemaLine$tsLine"
        .getBytes("UTF-8"))
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
          // snapshot line: "r,b" or "r,b\t<stats>" — the tab-suffixed
          // form carries folded marker stats through compaction
          val core = line.split("\t", 2)(0)
          val Array(r, b) = core.split(",", 2)
          (r, b.toLong)
        }.toSeq
      case _ => Seq.empty
    }

  /** Per-batch stats from the log — marker bodies plus
    * snapshot-folded lines. Batches committed without stats are
    * simply absent (readers treat them as unprunable). */
  def batchStats(spark: SparkSession,
      table: String): Map[(String, Long), Seq[ColStats]] = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return Map.empty
    def readText(p: org.apache.hadoop.fs.Path): String = {
      val in = hfs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
    }
    hfs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.endsWith(".commit")) {
        val stem = n.stripSuffix(".commit")
        val cut = stem.lastIndexOf('-')
        val key = (stem.substring(0, cut), stem.substring(cut + 1).toLong)
        readText(st.getPath).linesIterator
          .find(_.startsWith("stats="))
          .map(l => key -> decodeStats(l.stripPrefix("stats=")))
          .toSeq
      } else if (n.endsWith(".snapshot")) {
        // snapshot line: "r,b" | "r,b\t<stats>" | "r,b\t<stats>\t<schema>"
        // (stats field may be empty in the 3-field form)
        readText(st.getPath).linesIterator.filter(_.contains("\t")).flatMap { line =>
          val parts = line.split("\t", -1)
          val Array(r, b) = parts(0).split(",", 2)
          if (parts.length > 1 && parts(1).nonEmpty)
            Seq((r, b.toLong) -> decodeStats(parts(1)))
          else Seq.empty
        }.toSeq
      } else Seq.empty
    }.toMap
  }

  /** Per-batch schema fingerprints from the log — marker bodies plus
    * snapshot-folded lines. Batches committed by pre-schema writers
    * are absent (readers fall back to inferring their schema). */
  def batchSchemas(spark: SparkSession,
      table: String): Map[(String, Long), Seq[(String, String)]] = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return Map.empty
    def readText(p: org.apache.hadoop.fs.Path): String = {
      val in = hfs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
    }
    hfs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.endsWith(".commit")) {
        val stem = n.stripSuffix(".commit")
        val cut = stem.lastIndexOf('-')
        val key = (stem.substring(0, cut), stem.substring(cut + 1).toLong)
        readText(st.getPath).linesIterator
          .find(_.startsWith("schema="))
          .map(l => key -> decodeSchema(l.stripPrefix("schema=")))
          .toSeq
      } else if (n.endsWith(".snapshot")) {
        readText(st.getPath).linesIterator.flatMap { line =>
          val parts = line.split("\t", -1)
          if (parts.length > 2 && parts(2).nonEmpty) {
            val Array(r, b) = parts(0).split(",", 2)
            Seq((r, b.toLong) -> decodeSchema(parts(2)))
          } else Seq.empty
        }.toSeq
      } else Seq.empty
    }.toMap
  }

  /** Per-batch commit timestamps (wall millis) from the log — marker
    * `ts=` lines plus snapshot-folded fourth fields. Batches
    * committed by pre-timestamp writers are absent. */
  def batchTimestamps(spark: SparkSession,
      table: String): Map[(String, Long), Long] = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return Map.empty
    def readText(p: org.apache.hadoop.fs.Path): String = {
      val in = hfs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
    }
    hfs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.endsWith(".commit")) {
        val stem = n.stripSuffix(".commit")
        val cut = stem.lastIndexOf('-')
        val key = (stem.substring(0, cut), stem.substring(cut + 1).toLong)
        readText(st.getPath).linesIterator
          .find(_.startsWith("ts="))
          .flatMap(l => l.stripPrefix("ts=").toLongOption)
          .map(key -> _).toSeq
      } else if (n.endsWith(".snapshot")) {
        readText(st.getPath).linesIterator.flatMap { line =>
          val parts = line.split("\t", -1)
          if (parts.length > 3 && parts(3).nonEmpty) {
            val Array(r, b) = parts(0).split(",", 2)
            parts(3).toLongOption.map(t => (r, b.toLong) -> t)
          } else None
        }.toSeq
      } else Seq.empty
    }.toMap
  }

  /** TIME-TRAVEL read: exactly the batches whose recorded commit
    * timestamp is ≤ `tsMillis` — "the table as a reader at time T saw
    * it" (modulo commit-vs-wall-clock skew, which is what the
    * timestamps record). Batches without a recorded timestamp
    * (pre-timestamp writers) are conservatively INCLUDED — they
    * predate the feature, hence any queryable T. Same immutability
    * contract as [[readCommittedAsOf]]: committed batches never
    * mutate and the marker set is append-only, so an as-of-time read
    * is reproducible forever. */
  def readCommittedAsOfTimestamp(spark: SparkSession, table: String,
      tsMillis: Long): Option[DataFrame] = {
    val ts = batchTimestamps(spark, table)
    val committed = committedBatches(spark, table)
      .filter(key => ts.get(key).forall(_ <= tsMillis))
    if (committed.isEmpty) None
    else Some(readBatchSet(spark, table, committed))
  }

  /** The committed (run_id, batch_id) set, from the log. Snapshot
    * files (from [[compactLog]]) contribute their folded entries. */
  def committedBatches(spark: SparkSession, table: String): Seq[(String, Long)] = {
    val (hfs, dir) = fs(spark, commitsDir(table))
    if (!hfs.exists(dir)) return Seq.empty
    entriesOf(hfs, dir, hfs.listStatus(dir).toSeq.map(_.getPath.getName))
      .distinct.sorted
  }

  /** Schema-aware committed read (r15 evolution support): batches
    * whose marker-recorded schemas differ are read per schema-group
    * and unioned BY NAME — a column added in later batches reads NULL
    * for the batches predating it, and widening-only type drift
    * (tinyint→…→bigint, float→double) casts up to the widest recorded
    * type. Incompatible drift (same column, types no widening chain
    * joins) fails LOUDLY naming the column — never a silent
    * mis-union. Batches without a recorded schema (pre-r15 writers)
    * form one inferred-schema group, validated against the target the
    * same way. All reconciliation happens on MARKER METADATA — the
    * single-schema fast path (and any pre-schema table) is exactly
    * one parquet read, no footer merging ever. */
  private def readBatchSet(spark: SparkSession, table: String,
      committed: Seq[(String, Long)]): DataFrame = {
    def pathsOf(bs: Seq[(String, Long)]) =
      bs.map { case (r, b) => s"$table/run_id=$r/batch_id=$b" }
    val schemas = batchSchemas(spark, table)
    val groups = committed.groupBy(schemas.get).toSeq.sortBy(_._2.head)
    if (groups.size <= 1)
      return spark.read.option("basePath", table).parquet(pathsOf(committed): _*)
    // target: per column name, the widest recorded type (declaration
    // order = first group that declared the column)
    val target = scala.collection.mutable.LinkedHashMap.empty[String, String]
    groups.foreach { case (sch, bs) =>
      sch.toSeq.flatten.foreach { case (n, t) =>
        target.get(n) match {
          case None => target(n) = t
          case Some(prev) => widen(prev, t) match {
            case Some(w) => target(n) = w
            case None => sys.error(
              s"commit-log schema drift on column '$n' of $table is not " +
                s"widening-only: '$prev' vs '$t' (batch ${bs.head}) — " +
                "rewrite or fork the table")
          }
        }
      }
    }
    groups.map { case (_, bs) =>
      var df = spark.read.option("basePath", table).parquet(pathsOf(bs): _*)
      target.foreach { case (n, t) =>
        if (df.columns.contains(n)) {
          val actual = df.schema(n).dataType.sql
          if (actual != t) {
            // the actual file type must itself widen INTO the target —
            // covers unrecorded-schema groups whose physical type
            // conflicts (a silent cast would null-coerce garbage)
            if (!widen(actual, t).contains(t)) sys.error(
              s"commit-log schema drift on column '$n' of $table is not " +
                s"widening-only: file type '$actual' vs recorded target " +
                s"'$t' (batches ${bs.take(3)}) — rewrite or fork the table")
            df = df.withColumn(n, col(n).cast(t))
          }
        }
      }
      df
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Read exactly the committed partitions. Returns None when the log
    * is empty (a table with no committed data has no schema to offer —
    * callers decide whether that is empty-ok or an error). */
  def readCommitted(spark: SparkSession, table: String): Option[DataFrame] = {
    val committed = committedBatches(spark, table)
    if (committed.isEmpty) None
    else Some(readBatchSet(spark, table, committed))
  }

  /** Snapshot-pinned read: exactly the batches with
    * `batch_id <= maxBatchId` (per run), regardless of what commits
    * later — the reproducibility contract a training run needs ("run
    * X read batches ≤ N" stays replayable forever, because committed
    * batches are immutable and the marker set is append-only). Returns
    * None when nothing qualifies. */
  def readCommittedAsOf(spark: SparkSession, table: String,
      maxBatchId: Long): Option[DataFrame] = {
    val committed = committedBatches(spark, table)
      .filter(_._2 <= maxBatchId)
    if (committed.isEmpty) None
    else Some(readBatchSet(spark, table, committed))
  }

  /** Range read with BATCH PRUNING: only batches whose recorded
    * [min, max] for `column` intersects [lo, hi] are listed or opened
    * — at 100 TB the difference between touching every batch
    * directory and touching the handful a time/id predicate selects.
    * Batches without stats for the column (older writers, stats
    * dropped by pre-stats snapshots) are conservatively read. The
    * residual `BETWEEN` filter still applies — pruning is an
    * optimization, never a semantics change. Numeric stats compare as
    * exact decimals (a double round of a long stat above 2^53 could
    * wrongly prune a boundary-touching batch — silent loss the
    * residual filter cannot recover); string stats compare in
    * UTF8String (UTF-8 byte / code-point) order, matching the order
    * the residual Spark filter itself uses — Java String order is
    * UTF-16 code-unit order, which disagrees for strings mixing
    * supplementary characters with U+E000..U+FFFF. */
  def readCommittedRange(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any): Option[DataFrame] = {
    val committed = committedBatches(spark, table)
    if (committed.isEmpty) return None
    val stats = batchStats(spark, table)
    def utf8(x: String) = UTF8String.fromString(x)
    def overlaps(s: ColStats): Boolean =
      if (s.typ == "num") {
        // Double/Float column stats legitimately serialize as 'NaN' /
        // 'Infinity' / '-Infinity' (mn.toString of a non-finite
        // value), which BigDecimal cannot parse — degrade to
        // unprunable (conservative read): pruning is an optimization,
        // never a semantics change, and the residual filter still
        // applies.
        try {
          val (mn, mx) = (new JBigDecimal(s.min), new JBigDecimal(s.max))
          val (l, h) =
            (new JBigDecimal(lo.toString), new JBigDecimal(hi.toString))
          mx.compareTo(l) >= 0 && mn.compareTo(h) <= 0
        } catch { case _: NumberFormatException => true }
      } else utf8(s.max).compareTo(utf8(lo.toString)) >= 0 &&
        utf8(s.min).compareTo(utf8(hi.toString)) <= 0
    val surviving = committed.filter { key =>
      stats.get(key).flatMap(_.find(_.col == column)) match {
        case Some(s) => overlaps(s)
        case None => true // no stats recorded → cannot prune
      }
    }
    if (surviving.isEmpty) {
      // schema still needed — and it must be the EVOLVED span schema
      // (a single partition could predate an added column), so build
      // from the full committed set; lit(false) means no data reads
      return Some(readBatchSet(spark, table, committed)
        .where(col(column).between(lit(lo), lit(hi)) && lit(false)))
    }
    Some(readBatchSet(spark, table, surviving)
      .where(col(column).between(lit(lo), lit(hi))))
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
    // stats, schemas AND timestamps survive compaction: folded as
    // tab-suffixed snapshot fields — "r,b[\t<stats>[\t<schema>
    // [\t<ts>]]]", earlier fields kept empty when a later one rides
    // (built from the same pre-listing state — the meta readers
    // re-list, but only files that still exist, a subset of `olds`)
    val stats = batchStats(spark, table)
    val schemas = batchSchemas(spark, table)
    val tss = batchTimestamps(spark, table)
    val body = committed.map { case (r, b) =>
      val fields = Seq(
        stats.get((r, b)).filter(_.nonEmpty).map(encodeStats),
        schemas.get((r, b)).filter(_.nonEmpty).map(encodeSchema),
        tss.get((r, b)).map(_.toString))
      val upto = fields.lastIndexWhere(_.isDefined)
      if (upto < 0) s"$r,$b"
      else s"$r,$b\t" +
        fields.take(upto + 1).map(_.getOrElse("")).mkString("\t")
    }.mkString("\n")
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
