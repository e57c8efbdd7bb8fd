package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
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

  /** Per-column [[CommitLog.ColBound]]s extracted from a WHERE's SQL
    * text (parsed, unresolved): top-level AND conjuncts of the shapes
    * `col = v`, `col IN (...)`, `col >/>=/</<= v` (either operand
    * order; BETWEEN parses into the >= / <= pair). Everything else —
    * ORs, functions, non-literal operands — contributes no bound:
    * the residual WHERE always applies, so extraction is only ever an
    * optimization. Literal internals convert to stats-comparable
    * externals; types whose rendering cannot match the recorded stats
    * rendering (timestamps, binaries, …) are dropped. */
  private[sources] def whereBounds(spark: SparkSession,
      whereSql: String): Seq[CommitLog.ColBound] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(whereSql)
      catch { case scala.util.control.NonFatal(_) => return Seq.empty }
    def attrOf(e: ce.Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
    def litOf(e: ce.Expression): Option[Any] = e match {
      case ce.Literal(v, dt) if v != null => dt match {
        case org.apache.spark.sql.types.StringType =>
          Some(v.toString) // UTF8String renders exactly
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => Some(v)
        case _: org.apache.spark.sql.types.DecimalType => Some(v)
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => Some(v)
        case DateType => Some(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .daysToLocalDate(v.asInstanceOf[Int]).toString)
        case _ => None
      }
      case _ => None
    }
    val out = Seq.newBuilder[CommitLog.ColBound]
    // `col >= v` bounds below; `v >= col` bounds above (strict bounds
    // widen to inclusive — over-inclusion only, the residual filters)
    def cmp(a: ce.Expression, l: ce.Expression, loSide: Boolean): Unit = {
      for (c <- attrOf(a); v <- litOf(l))
        out += (if (loSide) CommitLog.ColBound(c, None, Some(v), None)
                else CommitLog.ColBound(c, None, None, Some(v)))
      for (c <- attrOf(l); v <- litOf(a))
        out += (if (loSide) CommitLog.ColBound(c, None, None, Some(v))
                else CommitLog.ColBound(c, None, Some(v), None))
    }
    def walk(e: ce.Expression): Unit = e match {
      case ce.And(l, r) => walk(l); walk(r)
      case ce.EqualTo(a, l) =>
        for (c <- attrOf(a); v <- litOf(l))
          out += CommitLog.ColBound(c, Some(Seq(v)), None, None)
        for (c <- attrOf(l); v <- litOf(a))
          out += CommitLog.ColBound(c, Some(Seq(v)), None, None)
      case ce.In(a, vs) if attrOf(a).nonEmpty && vs.nonEmpty =>
        val lits = vs.map(litOf)
        if (lits.forall(_.nonEmpty))
          out += CommitLog.ColBound(attrOf(a).get,
            Some(lits.map(_.get)), None, None)
      case ce.GreaterThan(a, l) => cmp(a, l, loSide = true)
      case ce.GreaterThanOrEqual(a, l) => cmp(a, l, loSide = true)
      case ce.LessThan(a, l) => cmp(a, l, loSide = false)
      case ce.LessThanOrEqual(a, l) => cmp(a, l, loSide = false)
      // BETWEEN parses to 'between(attr, lo, hi) (unresolved function)
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("between") && f.arguments.size == 3 =>
        cmp(f.arguments(0), f.arguments(1), loSide = true)
        cmp(f.arguments(0), f.arguments(2), loSide = false)
      case _ => ()
    }
    walk(parsed)
    out.result()
  }

  /** The data columns UPDATE/DELETE validate SET/WHERE names against.
    * Marker-recorded schemas are metadata-only and preferred; on a
    * MIXED-ERA table (some batches predate schema markers) a column
    * present only in the marker-less batches must not be loudly
    * rejected as unknown — union in the inferred columns of exactly
    * the marker-less group (footer reads bounded to those batches).
    * A fully pre-schema table falls back to the full read's columns. */
  private[sources] def dataColsOf(spark: SparkSession, table: String,
      st: CommitLog.LogState): Seq[String] = {
    val recorded = {
      val names = scala.collection.mutable.LinkedHashSet.empty[String]
      st.committed.foreach(k => st.meta.get(k).toSeq
        .flatMap(_.schema).foreach(f => names += f._1))
      names.toSeq
    }
    val markerless = st.committed.filter(k =>
      st.meta.get(k).forall(_.schema.isEmpty))
    val inferred =
      if (markerless.isEmpty) Seq.empty[String]
      else CommitLog.readBatchSet(spark, table, markerless, st).columns
        .filterNot(CommitLogTable.partNames.contains).toSeq
    (recorded ++ inferred).distinct
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

/** `UPDATE graft_commitlog.`/t` SET c = e, ... WHERE <pred over data
  * columns>` rewritten at analysis into this eager command — the one
  * DML verb r17 left out (a point update had to be phrased as a MERGE
  * with a self-source; this command IS that phrasing, automated).
  *
  * Mapping: the matched target rows, with the SET list applied (all
  * assignments evaluate against the ORIGINAL row simultaneously, SQL
  * semantics), become a [[CommitLog.merge]] self-source keyed on EVERY
  * column the WHERE references (r19 — the r18 form required exactly
  * one). The key-equivalence is exact because a deterministic
  * predicate is a function of the columns it references: every row
  * sharing a matched row's key TUPLE is itself matched, so the merge's
  * anti-join removes exactly the matched rows and the new batch
  * re-inserts their updated forms — one atomic marker, stats-pruned
  * batch rewrites, time travel into the pre-update era, exactly the
  * library merge.
  *
  * The SOURCE scan is stats-pruned (r19): conjunct bounds extracted
  * from the WHERE ([[CommitLogSqlWrites.whereBounds]]) skip whole
  * batch directories by recorded min/max before any file is listed —
  * a point UPDATE on a 100k-batch table plans candidate batches, not
  * the table.
  *
  * Loudly rejected (a silent approximation would update the wrong
  * rows): WHERE missing, assigning a WHERE-referenced column (the
  * source's new values would mis-key the anti-join), assigning
  * run_id/batch_id (system columns), a NONDETERMINISTIC predicate
  * (rand() is not a function of the key tuple), and — at run time —
  * a predicate matching rows with NULL in a key column (merge's
  * equi-join can never remove them, so the update would DUPLICATE
  * those rows; MERGE semantics share the restriction). */
private[graft] final case class UpdateCommitLogCommand(table: String,
    whereCols: Seq[String], whereSql: String, sets: Seq[(String, String)])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val st = CommitLog.logState(spark, table)
    if (st.committed.isEmpty) sys.error(
      s"graft_commitlog UPDATE: no committed batches at $table")
    // column validation against recorded schemas (metadata-only when
    // every batch has a marker), unioned with the inferred columns of
    // any marker-less batches — see CommitLogSqlWrites.dataColsOf
    lazy val fullRead = CommitLog.readBatchSet(spark, table, st.committed, st)
    val dataCols = CommitLogSqlWrites.dataColsOf(spark, table, st)
    val unknownSet = sets.map(_._1).filterNot(dataCols.contains)
    if (unknownSet.nonEmpty) sys.error(
      s"graft_commitlog UPDATE: SET names unknown column(s) " +
        s"${unknownSet.mkString(", ")} (table has ${dataCols.mkString(", ")})")
    val unknownWhere = whereCols.filterNot(dataCols.contains)
    if (unknownWhere.nonEmpty) sys.error(
      s"graft_commitlog UPDATE: WHERE references unknown column(s) " +
        s"${unknownWhere.mkString(", ")}")
    // stats-pruned self-source: only batches the WHERE bounds cannot
    // rule out are listed/read (the residual filter still applies)
    val bounds = CommitLogSqlWrites.whereBounds(spark, whereSql)
      .filter(b => whereCols.contains(b.col))
    val surviving = CommitLog.prunedCommitted(st, bounds)
    if (surviving.isEmpty) return Seq.empty // stats prove no match
    val pruned = CommitLog.readBatchSet(spark, table, surviving, st)
    // a referenced column missing from every surviving batch (added
    // by batches the pruning skipped) degrades to the full read —
    // correctness over pruning
    val needed = (sets.map(_._1) ++ whereCols).distinct
    val target =
      if (needed.forall(pruned.columns.contains)) pruned else fullRead
    val matched = target.where(expr(whereSql))
    matched.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if !f.condition.deterministic => f.condition
    }.foreach(c => sys.error(
      "graft_commitlog UPDATE: nondeterministic WHERE " +
        s"(${c.sql}) — the matched set must be a function of the key " +
        "columns or the merge anti-join removes the wrong rows"))
    // NULL in a key column never equi-joins: matched NULL-keyed rows
    // would be re-inserted updated WITHOUT removing the originals —
    // silent duplication. Fail loudly naming the remedy.
    if (!matched.where(whereCols.map(col(_).isNull)
        .reduce(_ || _)).isEmpty) sys.error(
      "graft_commitlog UPDATE: the WHERE predicate matches row(s) with " +
        s"NULL in key column(s) ${whereCols.mkString(", ")} — NULL never " +
        "matches the underlying merge's key equi-join, so the update " +
        "would duplicate those rows; filter them out (AND col IS NOT " +
        "NULL) or rewrite them via INSERT OVERWRITE of a transformed " +
        "SELECT")
    val setMap = sets.toMap
    // one select so every assignment sees the ORIGINAL row (SET a=b,
    // b=a swaps); store-assignment cast back to the column's type
    val outCols = target.columns
      .filterNot(CommitLogTable.partNames.contains).toSeq
    val updated = matched.select(outCols.map { c =>
      setMap.get(c)
        .map(sqlTxt => expr(sqlTxt).cast(target.schema(c).dataType).as(c))
        .getOrElse(col(c))
    }: _*)
    CommitLog.merge(spark, table, updated, whereCols,
      runId = "sql" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10),
      batchId = 0L,
      statsCols = CommitLogSqlWrites.defaultStatsCols(updated))
    Seq.empty
  }
}

/** `DELETE FROM graft_commitlog.`/t` WHERE <pred over data columns>`
  * for predicates with NO exact tombstone form (r19 — the r18 surface
  * loud-rejected anything beyond one-column `=`/`IN`/`BETWEEN`, so a
  * user's second DELETE hit a wall): rewritten at analysis into this
  * eager command — a DELETE-ONLY [[CommitLog.merge]] whose self-source
  * is the matched rows, keyed on every WHERE-referenced column
  * (tuple-membership removal is exact for deterministic predicates,
  * the 28t argument). Copy-on-write, not logical: affected batches
  * rewrite minus the matched rows in ONE stats-pruned transaction —
  * pre-delete time travel and change-feed delete events ride the
  * merge machinery (write-time change data included). Tombstone-shaped
  * predicates keep the cheap logical-delete path ([[CommitLogTable]]'s
  * SupportsDelete) — this command only catches what that path would
  * reject. Shares UPDATE's loud rejections: nondeterministic
  * predicates, subqueries, system columns, and NULL-matching key
  * tuples (the equi-join could never remove them — a silent SKIP of
  * rows the user asked to delete). */
private[graft] final case class DeleteCommitLogCommand(table: String,
    whereCols: Seq[String], whereSql: String)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr}
    val st = CommitLog.logState(spark, table)
    if (st.committed.isEmpty) sys.error(
      s"graft_commitlog DELETE: no committed batches at $table")
    lazy val fullRead = CommitLog.readBatchSet(spark, table, st.committed, st)
    val dataCols = CommitLogSqlWrites.dataColsOf(spark, table, st)
    val unknownWhere = whereCols.filterNot(dataCols.contains)
    if (unknownWhere.nonEmpty) sys.error(
      s"graft_commitlog DELETE: WHERE references unknown column(s) " +
        s"${unknownWhere.mkString(", ")}")
    val bounds = CommitLogSqlWrites.whereBounds(spark, whereSql)
      .filter(b => whereCols.contains(b.col))
    val surviving = CommitLog.prunedCommitted(st, bounds)
    if (surviving.isEmpty) return Seq.empty // stats prove no match
    val pruned = CommitLog.readBatchSet(spark, table, surviving, st)
    val target =
      if (whereCols.forall(pruned.columns.contains)) pruned else fullRead
    val matched = target.where(expr(whereSql))
    matched.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if !f.condition.deterministic => f.condition
    }.foreach(c => sys.error(
      "graft_commitlog DELETE: nondeterministic WHERE " +
        s"(${c.sql}) — the matched set must be a function of the key " +
        "columns or the merge anti-join removes the wrong rows"))
    if (!matched.where(whereCols.map(col(_).isNull)
        .reduce(_ || _)).isEmpty) sys.error(
      "graft_commitlog DELETE: the WHERE predicate matches row(s) with " +
        s"NULL in key column(s) ${whereCols.mkString(", ")} — NULL never " +
        "matches the underlying merge's key equi-join, so those rows " +
        "would silently SURVIVE the delete; add `AND col IS NOT NULL` " +
        "and handle NULL-keyed rows via INSERT OVERWRITE of a filtered " +
        "SELECT")
    val outCols = target.columns
      .filterNot(CommitLogTable.partNames.contains).toSeq
    CommitLog.merge(spark, table, matched.select(outCols.map(col): _*),
      whereCols,
      runId = "sql" + java.util.UUID.randomUUID().toString
        .replace("-", "").take(10),
      batchId = 0L,
      deleteWhen = Some(org.apache.spark.sql.functions.lit(true)))
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
