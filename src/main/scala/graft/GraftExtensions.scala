package graft

import graft.expr.{CosineSimF, CountMin, HeavyHitters, KmvSketch, LshBucket64, MinHashSig, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: makes graft's native expressions
  * available to every session on a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (no per-session register() call needed — the idiomatic deployment
  * for a Spark-native library).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRule)
    // SQL front door for the commit-log table format:
    // SELECT ... FROM graft_commitlog.`/path`. Spark's own SQL-on-file
    // rule admits only V1 FileFormat providers and FAILS the analysis
    // for anything else registered under the name, and it runs before
    // injected resolution rules — so the format's path tables must
    // resolve in the earlier hint-resolution batch, where the
    // identifier shape (2 parts, our format name) is already decided.
    ext.injectHintResolutionRule(spark => graft.sources.ResolveCommitLogSql(spark))
    // maintenance verbs Spark's grammar lacks (the Delta convention):
    // OPTIMIZE graft_commitlog.`/p` [TARGET n MB] → compactFiles;
    // VACUUM graft_commitlog.`/p` [RETAIN n HOURS] → vacuum. Every
    // other statement passes through the session parser untouched.
    ext.injectParser((_, delegate) =>
      new graft.sources.CommitLogSqlParser(delegate))
    // the CHANGE FEED as a SQL table function — the CDC read for SQL
    // users: SELECT * FROM graft_commitlog_changes('/table', since
    // [, until]) with epoch-milli bounds ((since, until], the
    // readChangeFeed contract); an empty window returns an empty
    // relation in the feed's schema, not an error
    // table history (DESCRIBE HISTORY parity): one row per logged
    // event, newest first, derived from the markers alone
    ext.injectTableFunction((
      new FunctionIdentifier("graft_commitlog_history"),
      new ExpressionInfo(graft.sources.CommitLog.getClass.getName,
        "graft_commitlog_history"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sources.CommitLogHistoryFunction.plan(exprs)))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_commitlog_changes"),
      new ExpressionInfo(graft.sources.CommitLog.getClass.getName,
        "graft_commitlog_changes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sources.CommitLogChangesFunction.plan(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(text, k, n) =>
            MinHashSig(text, evalInt(k), evalInt(n))
          case Seq(text) => MinHashSig(text, 5, 32)
          case other => throw new IllegalArgumentException(
            s"minhash_sig expects (text[, k, numHashes]), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c, k) => KmvSketch(c, evalInt(k)).toAggregateExpression()
          case Seq(c) => KmvSketch(c, 256).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"kmv_distinct expects (col[, k]), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("image_dims_packed"),
      new ExpressionInfo(classOf[graft.expr.ImageDimsPacked].getName, "image_dims_packed"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.ImageDimsPacked(c)
          case other => throw new IllegalArgumentException(
            s"image_dims_packed expects (payload), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[graft.expr.FixMojibakeExpr].getName, "fix_mojibake"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.FixMojibakeExpr(c)
          case other => throw new IllegalArgumentException(
            s"fix_mojibake expects (text), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("audio_meta_packed"),
      new ExpressionInfo(classOf[graft.expr.AudioMetaPacked].getName, "audio_meta_packed"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.AudioMetaPacked(c)
          case other => throw new IllegalArgumentException(
            s"audio_meta_packed expects (payload), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("exif_has_gps"),
      new ExpressionInfo(classOf[graft.expr.ExifHasGpsExpr].getName, "exif_has_gps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.ExifHasGpsExpr(c)
          case other => throw new IllegalArgumentException(
            s"exif_has_gps expects (payload), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("strip_exif"),
      new ExpressionInfo(classOf[graft.expr.StripExifExpr].getName, "strip_exif"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.StripExifExpr(c)
          case other => throw new IllegalArgumentException(
            s"strip_exif expects (payload), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("lang_script_route"),
      new ExpressionInfo(classOf[graft.expr.LangScriptRouteExpr].getName, "lang_script_route"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c) => graft.expr.LangScriptRouteExpr(c)
          case other => throw new IllegalArgumentException(
            s"lang_script_route expects (text), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[graft.expr.HllSketch].getName, "hll_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c, p) => graft.expr.HllSketch(c, evalInt(p)).toAggregateExpression()
          case Seq(c) => graft.expr.HllSketch(c, 12).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"hll_distinct expects (col[, p]), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMin].getName, "cms_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c, d, w) => CountMin(c, evalInt(d), evalInt(w)).toAggregateExpression()
          case Seq(c) => CountMin(c, 4, 1024).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"cms_sketch expects (col[, depth, width]), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "mg_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(c, k) => HeavyHitters(c, evalInt(k)).toAggregateExpression()
          case Seq(c) => HeavyHitters(c, 64).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"mg_topk expects (col[, k]), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(a, b) => CosineSimF(a, b)
          case other => throw new IllegalArgumentException(
            s"cosine_sim expects (arrayA, arrayB), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(t) => SimHash64(t)
          case other => throw new IllegalArgumentException(
            s"simhash64 expects (text), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[graft.expr.DeflateRatio].getName, "deflate_ratio"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(t) => graft.expr.DeflateRatio(t)
          case other => throw new IllegalArgumentException(
            s"deflate_ratio expects (text), got ${other.size} args")
        }))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket64].getName, "lsh_bucket"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(v, p) => LshBucket64(v, evalInt(p))
          case Seq(v) => LshBucket64(v, 8)
          case other => throw new IllegalArgumentException(
            s"lsh_bucket expects (vec[, numPlanes]), got ${other.size} args")
        }))
  }

  private def evalInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }
}
