package graft

import graft.expr.{CosineSimF, CountMin, HeavyHitters, KllSketch, KmvSketch, MinHashSig}
import org.apache.spark.sql.{Column, SparkSession}

/** Public function surface of the engine, Column-API and SQL.
  *
  * `register(spark)` exposes the native expressions to `spark.sql`
  * users (`SELECT minhash_sig(text, 5, 32) FROM docs`), mirroring how
  * the built-in registry exposes `functions._`.
  */
object GraftFunctions {

  def minhash_sig(text: Column, k: Int = 5, numHashes: Int = 32): Column =
    graft.expr.Exprs.minhashSig(text, k, numHashes)

  def kmv_distinct(c: Column, k: Int = 256): Column =
    KmvSketch.kmvDistinct(c, k)

  def hll_distinct(c: Column, p: Int = 12): Column =
    graft.expr.HllSketch.hllDistinct(c, p)

  def image_dims(payload: Column): Column =
    graft.expr.ImageDims.imageDims(payload)

  def audio_meta(payload: Column): Column =
    graft.expr.AudioMeta.audioMeta(payload)

  def fix_mojibake(text: Column): Column =
    graft.expr.FixMojibake.fixMojibake(text)

  def mg_topk(c: Column, k: Int = 64): Column =
    HeavyHitters.mgTopK(c, k)

  def cms_sketch(c: Column, depth: Int = 4, width: Int = 1024): Column =
    CountMin.cmsSketch(c, depth, width)

  def cms_query(sketch: Column, item: Column, depth: Int = 4, width: Int = 1024): Column =
    CountMin.cmsQuery(sketch, item, depth, width)

  def kll_quantiles(c: Column, probabilities: Seq[Double], k: Int = 200): Column =
    KllSketch.kllQuantiles(c, probabilities, k)

  def quantize_int8(vec: Column): Column =
    graft.expr.QuantizeInt8.quantizeInt8(vec)

  def topk_by(score: Column, id: Column, k: Int): Column =
    graft.expr.TopKByScore.topKBy(score, id, k)

  def topk_rows_by(score: Column, tie: Column, payload: Column, k: Int): Column =
    graft.expr.TopKRowsByScore.topKRowsBy(score, tie, payload, k)

  def mojibake_score(text: Column): Column =
    graft.text.TextAnalysis.mojibakeScore(text)

  def deflate_ratio(text: Column): Column =
    graft.expr.DeflateRatio.deflateRatio(text)

  def char_grams(text: Column, k: Int, distinct: Boolean = true): Column =
    graft.expr.CharGrams.charGrams(text, k, distinct)

  def quality_score(text: Column): Column = graft.text.TextAnalysis.qualityScore(text)
  def lang_id(text: Column): Column = graft.text.TextAnalysis.langId(text)
  def fingerprint(text: Column): Column = graft.text.TextAnalysis.fingerprint(text)
  def ws_token_count(text: Column): Column = graft.text.TextAnalysis.wsTokenCount(text)
  def cosine_sim(a: Column, b: Column): Column = graft.ops.Ann.cosine(a, b)

  /** Register the native expressions for SQL use on `spark`. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftColumnBridge.{expression => ex}
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("minhash_sig", exprs => exprs match {
      case Seq(text, k, n) =>
        MinHashSig(text, intLit(k), intLit(n))
      case Seq(text) => MinHashSig(text, 5, 32)
      case other => throw new IllegalArgumentException(
        s"minhash_sig expects (text[, k, numHashes]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("kmv_distinct", exprs => exprs match {
      case Seq(c, k) => KmvSketch(c, intLit(k)).toAggregateExpression()
      case Seq(c) => KmvSketch(c, 256).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"kmv_distinct expects (col[, k]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("image_dims_packed", exprs => exprs match {
      case Seq(c) => graft.expr.ImageDimsPacked(c)
      case other => throw new IllegalArgumentException(
        s"image_dims_packed expects (payload), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("audio_meta_packed", exprs => exprs match {
      case Seq(c) => graft.expr.AudioMetaPacked(c)
      case other => throw new IllegalArgumentException(
        s"audio_meta_packed expects (payload), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("exif_has_gps", exprs => exprs match {
      case Seq(c) => graft.expr.ExifHasGpsExpr(c)
      case other => throw new IllegalArgumentException(
        s"exif_has_gps expects (payload), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("strip_exif", exprs => exprs match {
      case Seq(c) => graft.expr.StripExifExpr(c)
      case other => throw new IllegalArgumentException(
        s"strip_exif expects (payload), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("lang_script_route", exprs => exprs match {
      case Seq(c) => graft.expr.LangScriptRouteExpr(c)
      case other => throw new IllegalArgumentException(
        s"lang_script_route expects (text), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("fix_mojibake", exprs => exprs match {
      case Seq(c) => graft.expr.FixMojibakeExpr(c)
      case other => throw new IllegalArgumentException(
        s"fix_mojibake expects (text), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("hll_distinct", exprs => exprs match {
      case Seq(c, p) => graft.expr.HllSketch(c, intLit(p)).toAggregateExpression()
      case Seq(c) => graft.expr.HllSketch(c, 12).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"hll_distinct expects (col[, p]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("cms_sketch", exprs => exprs match {
      case Seq(c, d, w) => CountMin(c, intLit(d), intLit(w)).toAggregateExpression()
      case Seq(c) => CountMin(c, 4, 1024).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"cms_sketch expects (col[, depth, width]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("mg_topk", exprs => exprs match {
      case Seq(c, k) => HeavyHitters(c, intLit(k)).toAggregateExpression()
      case Seq(c) => HeavyHitters(c, 64).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"mg_topk expects (col[, k]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("kll_quantiles", exprs => exprs match {
      // kll_quantiles(col, array(p1, p2, ...)[, k])
      case Seq(c, ps, k) => KllSketch(c, intLit(k), doubleLits(ps)).toAggregateExpression()
      case Seq(c, ps) => KllSketch(c, 200, doubleLits(ps)).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"kll_quantiles expects (col, probabilities[, k]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("quantize_int8", exprs => exprs match {
      case Seq(v) => graft.expr.QuantizeInt8(v)
      case other => throw new IllegalArgumentException(
        s"quantize_int8 expects (vec), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("topk_by", exprs => exprs match {
      case Seq(s, i, k) => graft.expr.TopKByScore(s, i, intLit(k)).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"topk_by expects (score, id, k), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("topk_rows_by", exprs => exprs match {
      case Seq(s, t, p, k) =>
        graft.expr.TopKRowsByScore(s, t, p, intLit(k)).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"topk_rows_by expects (score, tie, payload_struct, k), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("vector_sum", exprs => exprs match {
      case Seq(v) => graft.expr.VectorSum(v).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        s"vector_sum expects (vec), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("normalize_text", exprs => exprs match {
      case Seq(t, f) => graft.expr.NormalizeText(t, stringLit(f))
      case Seq(t) => graft.expr.NormalizeText(t, "NFC")
      case other => throw new IllegalArgumentException(
        s"normalize_text expects (text[, form]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("deflate_ratio", exprs => exprs match {
      case Seq(t) => graft.expr.DeflateRatio(t)
      case other => throw new IllegalArgumentException(
        s"deflate_ratio expects (text), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("char_grams", exprs => exprs match {
      case Seq(t, k) => graft.expr.CharGrams(t, intLit(k), distinct = true)
      case Seq(t, k, d) => graft.expr.CharGrams(t, intLit(k), boolLit(d))
      case other => throw new IllegalArgumentException(
        s"char_grams expects (text, k[, distinct]), got ${other.size} args")
    }, "built-in")
    registry.createOrReplaceTempFunction("cosine_sim", exprs => exprs match {
      case Seq(a, b) => CosineSimF(a, b)
      case other => throw new IllegalArgumentException(
        s"cosine_sim expects (arrayA, arrayB), got ${other.size} args")
    }, "built-in")
  }

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"expected an integer literal, got non-foldable expression $e")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }
  }

  private def boolLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"expected a boolean literal, got non-foldable expression $e")
    e.eval(null) match {
      case b: java.lang.Boolean => b
      case other => throw new IllegalArgumentException(s"expected boolean literal, got $other")
    }
  }

  private def stringLit(e: org.apache.spark.sql.catalyst.expressions.Expression): String = {
    if (!e.foldable || e.dataType != org.apache.spark.sql.types.StringType)
      throw new IllegalArgumentException(
        s"expected a string literal, got ${e.dataType.simpleString} $e")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(s"expected string literal, got $other")
    }
  }

  private def doubleLits(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Double] = {
    if (!e.foldable) throw new IllegalArgumentException(
      "probabilities must be a literal array<double>, got non-foldable expression")
    val elemOk = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        et == org.apache.spark.sql.types.DoubleType
      case _ => false
    }
    if (!elemOk) throw new IllegalArgumentException(
      s"probabilities must be a literal array<double>, got ${e.dataType.sql}")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(s"expected array<double> literal, got $other")
    }
  }
}
