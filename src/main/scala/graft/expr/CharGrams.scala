package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character k-gram extraction as a native one-pass expression —
  * O(len·k) where the `transform(sequence, i -> substring(s, i, k))`
  * formulation is O(len²) (UTF8String.substring walks from byte 0 to
  * locate char i for every element; measured 14× on a 4× longer
  * doc). Emits exactly the same gram multiset/set as the substring
  * form — first-occurrence order when `distinct` — so every
  * downstream consumer (MinHash md5 path, inverted-index joins,
  * containment verify) and every oracle replay is unchanged. */
final case class CharGrams(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"gram size $k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "char_grams"

  override protected def nullSafeEval(s: Any): Any =
    Kernels.charGrams(s.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expr.Kernels.charGrams($s, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  def charGrams(text: Column, k: Int, distinct: Boolean = true): Column =
    GraftColumnBridge.column(
      CharGrams(GraftColumnBridge.expression(text), k, distinct))
}
