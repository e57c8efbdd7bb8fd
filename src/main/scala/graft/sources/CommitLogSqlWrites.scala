package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.sources.{And, EqualTo, Filter, GreaterThanOrEqual, In, LessThanOrEqual}
import org.apache.spark.sql.types.{DateType, NumericType, StringType}

/** The SQL WRITE surface of the commit-log format (r16 verdict ask
  * #6): the user who can `SELECT`, stream, and read the change feed
  * can now also mutate the table from SQL, each statement mapping
  * onto the library's marker protocol — never a second write path:
  *
  *   - `INSERT INTO graft_commitlog.`/t`` → one
  *     [[CommitLog.writeBatchWithStats]] batch under ONE marker
  *     (torn-write invisibility exactly as the library write);
  *     `INSERT OVERWRITE` retires every currently-committed batch and
  *     adds the new one in ONE transaction marker — an atomic
  *     whole-table replace, with time travel into the pre-overwrite
  *     era until vacuum.
  *   - `DELETE FROM ... WHERE col IN (...) / = v / BETWEEN lo AND hi`
  *     → [[CommitLog.deleteWhere]] tombstones (the format's two
  *     tombstone kinds — other predicate shapes are rejected at
  *     analysis, not approximated); `DELETE FROM t` with no WHERE
  *     retires the whole committed set in one transaction marker.
  *   - `MERGE INTO ... ON t.k1 = s.k1 [AND t.k2 = s.k2] WHEN MATCHED
  *     [AND <cond on s>] THEN DELETE / WHEN MATCHED THEN UPDATE SET *
  *     / WHEN NOT MATCHED THEN INSERT *` → [[CommitLog.merge]] with
  *     composite keys and `deleteWhen` (the CDC op-feed shapes; the
  *     exotic forms — column-list assignments, target-side matched
  *     conditions, NOT MATCHED BY SOURCE — fail loudly naming what to
  *     use instead).
  *
  * run_id/batch_id are SYSTEM columns: an insert may pin them
  * explicitly (all rows one (run, batch) pair — replay/backfill), or
  * leave both NULL and have a `sql<hex>` run id minted. Mixed pairs
  * in one statement are rejected — one statement, one transaction. */
object CommitLogSqlWrites {

  /** Columns whose marker stats are worth recording by default on the
    * SQL write path: numeric/string/date leaves (timestamps render
    * engine-dependently; exotic types have no useful [min,max]).
    * Override with a `statsCols` table option ("none" to disable). */
  private[sources] def defaultStatsCols(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
      case f if f.dataType == StringType => f.name
      case f if f.dataType == DateType => f.name
    }.toSeq

  private[sources] def statsColsFor(df: DataFrame,
      opt: Option[String]): Seq[String] = opt match {
    case Some("none") => Seq.empty
    case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    case None => defaultStatsCols(df)
  }

  private def mintRunId(): String =
    "sql" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  /** The V1-fallback insert: Spark has already reconciled the query's
    * output to the table schema (including the system partition
    * columns). One statement = one transaction. */
  private[sources] def insert(spark: SparkSession, table: String,
      statsOpt: Option[String], data: DataFrame, overwrite: Boolean): Unit = {
    val hasParts = data.columns.contains("run_id")
    val pairs =
      if (!hasParts) Array.empty[(Option[String], Option[Long])]
      else data.select("run_id", "batch_id").distinct().limit(3).collect()
        .map(r => (Option(r.get(0)).map(_.toString),
          Option(r.get(1)).map(_.toString.toLong)))
    val (runId, batchId) = pairs.toSeq match {
      case Seq() | Seq((None, None)) => (mintRunId(), 0L)
      case Seq((Some(r), Some(b))) => (r, b)
      case other => sys.error(
        "graft_commitlog INSERT: run_id/batch_id are system columns — " +
          "leave both NULL (a batch id is minted) or set ONE constant " +
          s"(run, batch) pair for the whole statement; got $other")
    }
    val rows = data.drop("run_id", "batch_id")
    val st = CommitLog.logState(spark, table)
    if (st.entries.contains((runId, batchId))) sys.error(
      s"graft_commitlog INSERT: ($runId, $batchId) is already committed " +
        "— committed batches are immutable; pick a fresh batch id")
    val statsCols = statsColsFor(rows, statsOpt)
    if (rows.isEmpty) {
      // an empty source (SELECT ... WHERE false) must not commit a
      // marker: the dynamic-overwrite write of an empty frame creates
      // no partition directory, so the marker/TxnAdd would dangle and
      // make the whole table unreadable. Plain INSERT of nothing is a
      // no-op; INSERT OVERWRITE with an empty source is an atomic
      // truncate — retire the committed set, add nothing.
      if (overwrite && st.committed.nonEmpty)
        CommitLog.commitTxn(spark, table, Seq.empty, retires = st.committed)
      return
    }
    if (!overwrite)
      CommitLog.writeBatchWithStats(rows, table, runId, batchId, statsCols)
    else {
      // atomic whole-table replace: new batch visible and every old
      // batch retired in ONE transaction marker (a reader sees the
      // old table or the new one, never a mix); time travel reaches
      // the pre-overwrite era until vacuum reclaims it
      val pinned = rows.localCheckpoint(eager = false)
      CommitLog.writeDataOnly(pinned, table, runId, batchId)
      CommitLog.commitTxn(spark, table,
        Seq(CommitLog.TxnAdd(runId, batchId,
          CommitLog.statsOf(pinned, statsCols),
          pinned.schema.fields.toSeq.map(f => f.name -> f.dataType.sql))),
        retires = st.committed)
    }
  }

  /** The tombstone a DELETE predicate maps onto: `(col, kind, vals)`.
    * None = the shape has no exact tombstone form (rejected at
    * analysis via canDeleteWhere — a wrong approximation is worse
    * than a loud error). Empty filters = truncate (retire all). */
  /** Flattened conjuncts minus the AlwaysTrue a WHERE-less DELETE
    * arrives as — empty result = truncate (retire everything). */
  private def conjuncts(filters: Array[Filter]): Seq[Filter] = {
    def flat(f: Filter): Seq[Filter] = f match {
      case And(l, r) => flat(l) ++ flat(r)
      case o => Seq(o)
    }
    filters.toSeq.flatMap(flat)
      .filterNot(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
  }

  private[sources] def toTombstone(
      fs: Seq[Filter]): Option[(String, String, Seq[Any])] = {
    def dataCol(c: String) = c != "run_id" && c != "batch_id"
    fs match {
      case Seq(EqualTo(c, v)) if v != null && dataCol(c) =>
        Some((c, "in", Seq(v)))
      case Seq(In(c, vs)) if vs != null && vs.nonEmpty &&
          vs.forall(_ != null) && dataCol(c) =>
        Some((c, "in", vs.toSeq))
      case Seq(GreaterThanOrEqual(c1, lo), LessThanOrEqual(c2, hi))
          if c1 == c2 && lo != null && hi != null && dataCol(c1) =>
        Some((c1, "range", Seq(lo, hi)))
      case Seq(LessThanOrEqual(c2, hi), GreaterThanOrEqual(c1, lo))
          if c1 == c2 && lo != null && hi != null && dataCol(c1) =>
        Some((c1, "range", Seq(lo, hi)))
      case _ => None
    }
  }

  private[sources] def canDelete(filters: Array[Filter]): Boolean = {
    val fs = conjuncts(filters)
    fs.isEmpty || toTombstone(fs).nonEmpty
  }

  private[sources] def delete(spark: SparkSession, table: String,
      filters: Array[Filter]): Unit = {
    val fs = conjuncts(filters)
    if (fs.isEmpty) {
      // DELETE FROM t — retire the whole committed set atomically
      val st = CommitLog.logState(spark, table)
      if (st.committed.nonEmpty)
        CommitLog.commitTxn(spark, table, Seq.empty, retires = st.committed)
    } else toTombstone(fs) match {
      case Some((c, kind, vals)) =>
        CommitLog.deleteWhere(spark, table, c, kind, vals)
      case None => sys.error(
        "graft_commitlog DELETE supports col = v / col IN (...) / " +
          "col BETWEEN lo AND hi on one data column (the format's " +
          s"tombstone kinds); got: ${fs.mkString(", ")}")
    }
  }
}

/** WriteBuilder for the V1-fallback batch write: `build()` hands
  * Spark an [[org.apache.spark.sql.sources.InsertableRelation]] whose
  * insert IS the library's marker-protocol write. */
private[sources] final class CommitLogWriteBuilder(t: CommitLogTable,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation:
        org.apache.spark.sql.sources.InsertableRelation =
      new org.apache.spark.sql.sources.InsertableRelation {
        override def insert(data: DataFrame, ow: Boolean): Unit =
          CommitLogSqlWrites.insert(data.sparkSession, t.table,
            Option(t.tblOptions.get("statsCols")), data, overwrite || ow)
      }
  }
}

/** `UPDATE graft_commitlog.`/t` SET c = e, ... WHERE <pred on ONE
  * column>` rewritten at analysis into this eager command — the one
  * DML verb r17 left out (a point update had to be phrased as a MERGE
  * with a self-source; this command IS that phrasing, automated).
  *
  * Mapping: the matched target rows, with the SET list applied (all
  * assignments evaluate against the ORIGINAL row simultaneously, SQL
  * semantics), become a [[CommitLog.merge]] self-source keyed on the
  * WHERE column. The key-equivalence is exact because the predicate
  * references only that column: the matched set IS "rows whose key
  * value ∈ the matched value set", so the merge's anti-join removes
  * exactly the matched rows and the new batch re-inserts their
  * updated forms — one atomic marker, stats-pruned batch rewrites,
  * time travel into the pre-update era, exactly the library merge.
  *
  * Loudly rejected (a silent approximation would update the wrong
  * rows): WHERE missing or touching >1 column (no key to equate on —
  * use MERGE INTO with an explicit ON key), assigning the WHERE
  * column itself (the source's new values would mis-key the
  * anti-join), assigning run_id/batch_id (system columns). */
private[graft] final case class UpdateCommitLogCommand(table: String,
    whereCol: String, whereSql: String, sets: Seq[(String, String)])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val target = CommitLog.readCommitted(spark, table).getOrElse(sys.error(
      s"graft_commitlog UPDATE: no committed batches at $table"))
    val dataCols = target.columns
      .filterNot(CommitLogTable.partNames.contains).toSeq
    val unknownSet = sets.map(_._1).filterNot(dataCols.contains)
    if (unknownSet.nonEmpty) sys.error(
      s"graft_commitlog UPDATE: SET names unknown column(s) " +
        s"${unknownSet.mkString(", ")} (table has ${dataCols.mkString(", ")})")
    if (!dataCols.contains(whereCol)) sys.error(
      s"graft_commitlog UPDATE: WHERE references unknown column '$whereCol'")
    val setMap = sets.toMap
    // one select so every assignment sees the ORIGINAL row (SET a=b,
    // b=a swaps); store-assignment cast back to the column's type
    val updated = target.where(expr(whereSql)).select(dataCols.map { c =>
      setMap.get(c)
        .map(sqlTxt => expr(sqlTxt).cast(target.schema(c).dataType).as(c))
        .getOrElse(col(c))
    }: _*)
    CommitLog.merge(spark, table, updated, Seq(whereCol),
      runId = "sql" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10),
      batchId = 0L,
      statsCols = CommitLogSqlWrites.defaultStatsCols(updated))
    Seq.empty
  }
}

/** `MERGE INTO graft_commitlog.`/t`` rewritten at analysis into this
  * eager command: Spark's own MERGE planning requires
  * SupportsRowLevelOperations (the Iceberg-weight group-based rewrite
  * machinery); the commit-log's [[CommitLog.merge]] already IS the
  * copy-on-write row-level operation, so the SQL form maps straight
  * onto it. `keyCols` come from the ON conjunction, `deleteWhen` from
  * the matched-DELETE condition (source-side columns, qualifiers
  * stripped); source columns outside the target schema (op codes,
  * CDC sequence numbers) are dropped before the new batch lands. */
private[sources] final case class MergeIntoCommitLogCommand(
    table: String, source: LogicalPlan, keyCols: Seq[String],
    deleteWhenSql: Option[String], deleteOnly: Boolean)
    extends LeafRunnableCommand {
  // deleteWhen travels as SQL TEXT, not an Expression field: a
  // constructor Expression would join this command's `expressions`,
  // and its (deliberately unresolved, source-frame) attributes would
  // fail the outer plan's resolution — the source frame to resolve
  // against only exists at run()

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val fullSrc = GraftColumnBridge.dataFrame(spark, source)
    val deleteWhen = deleteWhenSql.map(org.apache.spark.sql.functions.expr)
    // a delete-only MERGE (no UPDATE SET *, no INSERT *) touches ONLY
    // the delete-op rows: anything else in the source must neither
    // update nor insert
    val src =
      if (deleteOnly) fullSrc.where(deleteWhen.get)
      else fullSrc
    val target = CommitLog.readCommitted(spark, table).getOrElse(sys.error(
      s"graft_commitlog MERGE: no committed batches at $table — " +
        "MERGE needs an existing table schema; INSERT INTO first"))
    val targetCols =
      target.columns.filterNot(CommitLogTable.partNames.contains).toSet
    val missing = targetCols -- src.columns.toSet
    if (missing.nonEmpty) sys.error(
      s"graft_commitlog MERGE ... SET * / INSERT *: source must carry " +
        s"every target column; missing ${missing.mkString(", ")}")
    val dropCols = src.columns.filterNot(targetCols.contains).toSeq
    val landing = src.drop(dropCols: _*)
    CommitLog.merge(spark, table, src, keyCols,
      runId = "sql" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10),
      batchId = 0L,
      statsCols = CommitLogSqlWrites.defaultStatsCols(landing),
      deleteWhen =
        if (deleteOnly) Some(org.apache.spark.sql.functions.lit(true))
        else deleteWhen,
      dropCols = dropCols)
    Seq.empty
  }
}
