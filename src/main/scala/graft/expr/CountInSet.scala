package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-char-class counter: the codegen'd, allocation-free
  * replacement for `regexp_count(s, "[<ASCII class>]")` on hot scan
  * paths — java.util.regex re-probes the pattern per position (r20
  * measured a negated class 9x slower than its complement; even the
  * positive form pays a Matcher allocation plus per-char find() state
  * machine), where this is one branch-light byte loop against a
  * 128-bit mask. VALUE-IDENTICAL to the regex form for ASCII-only
  * single-char classes (see [[Kernels.countInSet]]; CountInSetSpec
  * pins equality against regexp_count property-style, unicode
  * included), so DuckDB oracles replaying the regex form still match
  * bit-for-bit. NULL input yields NULL, like regexp_count. */
final case class CountInSet(child: Expression, allowed: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (allowed.isEmpty || allowed.exists(_ >= 128))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName allowed set must be non-empty ASCII")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val (m0, m1) = StringCheck.masks(allowed)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else Kernels.countInSet(v.asInstanceOf[UTF8String], m0, m1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Kernels.countInSet($c, ${m0}L, ${m1}L);")

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  /** `\s` in java.util.regex default mode: ASCII whitespace only. */
  val RegexWhitespace = " \t\n\u000b\f\r"

  def countInSet(c: Column, allowed: String): Column =
    GraftColumnBridge.column(CountInSet(
      GraftColumnBridge.expression(c), allowed))
}
