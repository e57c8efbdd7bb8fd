package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native validation predicates over string columns — the codegen'd,
  * allocation-free backbone of the rule engine's hot checks
  * ([[graft.rules.Checks]]). Kinds:
  *
  *  - `blank`   — NULL or all-ASCII-space (Spark trim semantics);
  *                null-safe: NULL input yields TRUE, not NULL.
  *  - `allin`   — every byte inside the ASCII `allowed` set (the
  *                translate/regex-char-class replacement).
  *  - `namefmt` — leading ASCII letter + remainder inside `allowed`
  *                (the `^[A-Za-z][...]*$` name-field shape).
  *  - `phone`   — `^\+?[0-9().\-\s]+(x[0-9]+)?$` as a DFA.
  *  - `email`   — `^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$`.
  *  - `ymd`     — strict yyyy-MM-dd format AND calendar validity.
  *
  * Except for `blank`, NULL input yields NULL (like the regex forms).
  * Equivalence to the Column/regex specs is pinned property-style by
  * StringCheckSpec; at a ~68-rule bank stack these kernels are what
  * keeps validation scan-bound (no per-row trim/translate/Matcher
  * allocations).
  */
final case class StringCheck(child: Expression, kind: String, allowed: String = "")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.simpleString}")
    else if (!StringCheck.Kinds.contains(kind))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName kind must be one of ${StringCheck.Kinds.mkString(", ")}, got '$kind'")
    else if (allowed.exists(_ >= 128))
      TypeCheckResult.TypeCheckFailure(s"$prettyName allowed set must be ASCII")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = if (kind == "blank") false else child.nullable
  override def prettyName: String = "string_check"

  @transient private lazy val (m0, m1) = StringCheck.masks(allowed)
  @transient private lazy val (a0, a1) =
    StringCheck.masks(('A' to 'Z').mkString + ('a' to 'z').mkString)

  private def test(s: UTF8String): Boolean = kind match {
    case "blank" => Kernels.isBlankStr(s)
    case "allin" => Kernels.allInSet(s, m0, m1)
    case "namefmt" =>
      s.numBytes > 0 && Kernels.allInSet(s.substring(0, 1), a0, a1) &&
        Kernels.allInSet(s, m0, m1)
    case "phone" => Kernels.isPhone(s)
    case "email" => Kernels.isEmail(s)
    case "ymd" => Kernels.isYmdDate(s)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) { if (kind == "blank") true else null }
    else test(v.asInstanceOf[UTF8String])
  }

  private def callFor(c: String): String = kind match {
    case "blank" => s"graft.expr.Kernels.isBlankStr($c)"
    case "allin" => s"graft.expr.Kernels.allInSet($c, ${m0}L, ${m1}L)"
    case "namefmt" =>
      s"($c.numBytes() > 0 && graft.expr.Kernels.allInSet($c.substring(0, 1), ${a0}L, ${a1}L)" +
        s" && graft.expr.Kernels.allInSet($c, ${m0}L, ${m1}L))"
    case "phone" => s"graft.expr.Kernels.isPhone($c)"
    case "email" => s"graft.expr.Kernels.isEmail($c)"
    case "ymd" => s"graft.expr.Kernels.isYmdDate($c)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (kind == "blank") {
      // null-safe true: NULL is blank, so the result is never null
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val c = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${c.code}
          boolean ${ev.value} = ${c.isNull} ? true : ${callFor(c.value.toString)};
        """,
        isNull = FalseLiteral)
    } else {
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${callFor(c)};")
    }

  override protected def withNewChildInternal(newChild: Expression): StringCheck =
    copy(child = newChild)
}

object StringCheck {
  val Kinds: Set[String] = Set("blank", "allin", "namefmt", "phone", "email", "ymd")

  private[expr] def masks(allowed: String): (Long, Long) = {
    var m0 = 0L; var m1 = 0L
    allowed.foreach { ch =>
      val b = ch.toInt
      if (b < 64) m0 |= 1L << b else m1 |= 1L << (b - 64)
    }
    (m0, m1)
  }

  def check(c: Column, kind: String, allowed: String = ""): Column =
    GraftColumnBridge.column(StringCheck(
      GraftColumnBridge.expression(c), kind, allowed))
}
