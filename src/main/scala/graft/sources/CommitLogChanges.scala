package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The SQL face of [[CommitLog.readChangeFeed]] — a table function
  * resolving at analysis time into the feed's logical plan, so
  * `SELECT * FROM graft_commitlog_changes('/table', 1000)` composes
  * with any downstream SQL (joins, aggregations, MERGE sources). The
  * empty window returns an EMPTY relation in the feed's schema
  * (change_type, change_ts, current data columns) — a CDC poller's
  * no-news case is a result, not an error. */
private[graft] object CommitLogChangesFunction {

  private def evalString(e: Expression, what: String): String =
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"graft_commitlog_changes: $what must be a string literal, got $other")
    }
  private def evalLong(e: Expression, what: String): Long =
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"graft_commitlog_changes: $what must be an integer literal " +
          s"(epoch millis), got $other")
    }

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    val (path, since, until) = exprs match {
      case Seq(p, s) =>
        (evalString(p, "path"), evalLong(s, "since"), Long.MaxValue)
      case Seq(p, s, u) =>
        (evalString(p, "path"), evalLong(s, "since"), evalLong(u, "until"))
      case other => throw new IllegalArgumentException(
        "graft_commitlog_changes expects (path, sinceMillis[, untilMillis])" +
          s", got ${other.size} args")
    }
    val spark = SparkSession.active
    CommitLog.readChangeFeed(spark, path, since, until) match {
      case Some(df) => df.queryExecution.logical
      case None =>
        // schema even with zero events: the feed's meta columns plus
        // the table's CURRENT data columns (the same reconciliation a
        // read would use); an empty table errors loudly as everywhere
        val tbl = new CommitLogTable(path,
          new CaseInsensitiveStringMap(
            java.util.Collections.singletonMap("path", path)), None)
        val dataCols = tbl.reconciled.fields
          .filterNot(f => CommitLogTable.partNames.contains(f.name))
        val schema = StructType(
          dataCols :+ StructField("change_type", StringType) :+
            StructField("change_ts", LongType) :+
            StructField("_change_seq", LongType))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          .queryExecution.logical
    }
  }
}

/** SQL face of [[CommitLog.history]]:
  * `SELECT * FROM graft_commitlog_history('/table')` — the DESCRIBE
  * HISTORY rung, resolving into the history frame at analysis time. */
private[graft] object CommitLogHistoryFunction {
  def plan(exprs: Seq[Expression]): LogicalPlan = {
    val path = exprs match {
      case Seq(p) => p.eval(null) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"graft_commitlog_history: path must be a string literal, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"graft_commitlog_history expects (path), got ${other.size} args")
    }
    CommitLog.history(SparkSession.active, path).queryExecution.logical
  }
}
