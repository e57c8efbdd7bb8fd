package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Delegating SQL parser (installed by [[graft.GraftExtensions]] via
  * `injectParser` — the Delta convention for statements outside
  * Spark's grammar): intercepts the commit-log MAINTENANCE statements
  * and hands everything else to the session parser untouched.
  *
  *   - `OPTIMIZE graft_commitlog.`/path`` [ZORDER BY (c1, c2)]
  *     [TARGET <n> MB]` → [[CommitLog.compactFiles]] (small-file
  *     bin-packing; default target 128 MB). ZORDER BY re-clusters
  *     every batch on the named data columns and records per-file
  *     min/max in the markers — scans with bounds on those columns
  *     then prune FILES inside surviving batch directories. Returns
  *     (batches_rewritten).
  *   - `VACUUM graft_commitlog.`/path`` [RETAIN <n> HOURS]` →
  *     [[CommitLog.vacuum]] (default 168 h — the Delta default; the
  *     same retention warning applies: a shorter window eats time
  *     travel and in-flight readers' era). Returns (path).
  *
  * Both accept only the path form (`graft_commitlog.`/path``): the
  * maintenance target is the FORMAT's directory, and resolving a
  * catalog name would need the analyzer these commands never enter.
  * DML (INSERT / DELETE / MERGE) stays in Spark's own grammar and
  * resolves through the DSv2 rules — this parser only adds verbs
  * Spark has none of. */
class CommitLogSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val optimizeRe =
    ("""(?is)\s*OPTIMIZE\s+graft_commitlog\s*\.\s*`([^`]+)`\s*""" +
      """(?:ZORDER\s+BY\s*\(\s*([\w`,\s]+?)\s*\)\s*)?""" +
      """(?:TARGET\s+(\d+)\s*MB\s*)?;?\s*""").r
  private val vacuumRe =
    """(?is)\s*VACUUM\s+graft_commitlog\s*\.\s*`([^`]+)`\s*(?:RETAIN\s+(\d+)\s*HOURS?\s*)?;?\s*""".r
  // RESTORE [TABLE] graft_commitlog.`/p` TO VERSION AS OF <seq>
  //                                    | TO TIMESTAMP AS OF <millis|'yyyy-MM-dd HH:mm:ss[.f]'>
  private val restoreRe =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?graft_commitlog\s*\.\s*`([^`]+)`\s*""" +
      """TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(?:(\d+)|'([^']+)')\s*;?\s*""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case restoreRe(path, kind, num, quoted) =>
      val byVersion = kind.equalsIgnoreCase("VERSION")
      val value =
        if (num != null) num.toLong
        else if (byVersion) sys.error(
          "RESTORE ... TO VERSION AS OF takes a numeric history seq")
        else
          try java.sql.Timestamp.valueOf(quoted).getTime
          catch {
            case _: IllegalArgumentException => sys.error(
              "RESTORE ... TO TIMESTAMP AS OF takes epoch millis or " +
                s"'yyyy-MM-dd HH:mm:ss[.f]', got '$quoted'")
          }
      RestoreCommitLogCommand(path, byVersion, value)
    case optimizeRe(path, zorder, target) =>
      OptimizeCommitLogCommand(path,
        Option(target).map(_.toLong * 1024 * 1024)
          .getOrElse(128L * 1024 * 1024),
        Option(zorder).toSeq.flatMap(_.split(",").toSeq)
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty))
    case vacuumRe(path, hours) =>
      VacuumCommitLogCommand(path,
        Option(hours).map(_.toLong * 3600 * 1000)
          .getOrElse(168L * 3600 * 1000))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

private[sources] final case class OptimizeCommitLogCommand(
    table: String, targetBytes: Long,
    zorderBy: Seq[String] = Seq.empty) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("batches_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val before = CommitLog.logState(spark, table).committed.toSet
    CommitLog.compactFiles(spark, table, targetBytes, zorderBy = zorderBy)
    val after = CommitLog.logState(spark, table).committed.toSet
    Seq(Row((before -- after).size.toLong))
  }
}

/** `RESTORE [TABLE] graft_commitlog.`/p`` TO VERSION AS OF <seq>` /
  * `TO TIMESTAMP AS OF <t>` → [[CommitLog.restoreTo]] — the escape
  * hatch after a bad merge/delete: post-target mutations roll back in
  * one atomic restore marker (re-adds metadata-only while their
  * directories survive vacuum, post-target tombstones cancelled).
  * VERSION is the monotonic `seq` of `graft_commitlog_history`.
  * Returns (readds, retires, cancels) counts. */
private[sources] final case class RestoreCommitLogCommand(
    table: String, byVersion: Boolean, value: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("batches_readded", LongType, nullable = false)(),
    AttributeReference("batches_retired", LongType, nullable = false)(),
    AttributeReference("deletes_cancelled", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val before = CommitLog.logState(spark, table).restores.size
    CommitLog.restoreTo(spark, table,
      version = if (byVersion) Some(value) else None,
      timestamp = if (byVersion) None else Some(value))
    val after = CommitLog.logState(spark, table).restores
    if (after.size == before) Seq(Row(0L, 0L, 0L)) // no-op restore
    else {
      val r = after.maxBy(_.seq)
      Seq(Row(r.readds.size.toLong, r.retires.size.toLong,
        r.cancels.size.toLong))
    }
  }
}

private[sources] final case class VacuumCommitLogCommand(
    table: String, graceMs: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    CommitLog.vacuum(spark, table, graceMs)
    Seq(Row(table))
  }
}
