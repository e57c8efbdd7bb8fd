package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_script_route(text)` — the script-routing front door of
  * [[graft.text.TextAnalysis.langId]] as ONE codegen'd UTF-8 byte
  * pass ([[Kernels.langScriptRoute]]); the composed form pays
  * eighteen per-script regexp scans per row. Value: dominant-script
  * index (0-17, sorted langScriptRanges order) | 0x100 when kana
  * present (flag bit above the index space);
  * NULL when the text holds no script characters (or is NULL) — the
  * caller's 'und'. */
final case class LangScriptRouteExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "lang_script_route"

  override protected def nullSafeEval(input: Any): Any = {
    val v = Kernels.langScriptRoute(input.asInstanceOf[UTF8String])
    if (v < 0) null else java.lang.Integer.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val v = ctx.freshName("route")
      s"""
         |int $v = graft.expr.Kernels.langScriptRoute($input);
         |if ($v < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangScriptRouteExpr =
    copy(child = newChild)
}

object LangScriptRoute {
  def langScriptRoute(text: Column): Column =
    GraftColumnBridge.column(
      LangScriptRouteExpr(GraftColumnBridge.expression(text)))
}
