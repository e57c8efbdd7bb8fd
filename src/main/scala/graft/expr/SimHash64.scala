package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar, STOC 2002) as a native expression: bit j
  * of the output is set iff the sum over whitespace tokens of ±1
  * (sign of bit j of the token's xxhash64) is positive.
  *
  * One pass over the input bytes ([[Kernels.simhash64]]): tokens are
  * delimited inline (no split allocation), each token hashed once, 64
  * bit-counters updated in a local array. Byte-identical to hashing
  * `split(trim(lower(s)), "\s+")` tokens for ASCII text. Token-free
  * input yields NULL (kernel sentinel). `doGenCode` keeps the stage's
  * whole-stage-codegen span intact.
  */
final case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val h = Kernels.simhash64(input.asInstanceOf[UTF8String])
    if (h == Kernels.NoTokens) null else java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val h = ctx.freshName("simhash")
      s"""
         |long $h = graft.expr.Kernels.simhash64($input);
         |if ($h == graft.expr.Kernels.NoTokens()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $h;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))
}
