package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-random-projection LSH bucket id for an `array<float>` vector
  * as a native expression — one fused loop ([[Kernels.lshBucket]])
  * replacing `numPlanes` interpreted zip_with/aggregate passes, with
  * identical output (the plane components replicate the seeded
  * xxhash64 chain of the composed form bit-for-bit). The corpus-side
  * bucketing pass of [[graft.ops.Ann.lshTopK]] is a full scan — this
  * keeps it inside whole-stage codegen at scan speed. */
final case class LshBucket64(child: Expression, numPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.lshBucket(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expr.Kernels.lshBucket($input, $numPlanes);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket64 =
    copy(child = newChild)
}

object LshBucket64 {
  def lshBucket(vec: Column, numPlanes: Int): Column =
    GraftColumnBridge.column(LshBucket64(GraftColumnBridge.expression(vec), numPlanes))
}
