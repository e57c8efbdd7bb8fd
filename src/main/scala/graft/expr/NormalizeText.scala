package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX#15: NFC/NFD/NFKC/NFKD) as a native
  * codegen expression — Spark has no built-in for it, yet it is the
  * FIRST step of any serious text-dedup pipeline: "é" arrives both
  * composed (U+00E9) and decomposed (e + U+0301) in web corpora, and
  * without canonicalization those are different bytes, different
  * fingerprints, different MinHash shingles. NFKC additionally folds
  * compatibility forms (ﬁ ligature → fi, fullwidth → ASCII), the
  * usual choice before tokenization.
  *
  * Scan-cost: `Normalizer.isNormalized` short-circuits (ASCII fast
  * path), so already-clean corpora pay a verification scan, not a
  * rewrite. The DuckDB oracle replays NFC via its `nfc_normalize`. */
final case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (!NormalizeText.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${NormalizeText.Forms.mkString(", ")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  @transient private lazy val nform = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(s: Any): Any =
    Kernels.normalizeText(s.asInstanceOf[UTF8String], nform)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("nform", nform, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Kernels.normalizeText($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(text: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(NormalizeText(
      GraftColumnBridge.expression(text), form))
}
