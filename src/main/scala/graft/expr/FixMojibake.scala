package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets

/** Mojibake REPAIR (the ftfy move) as a native codegen'd expression —
  * the fix half of [[graft.text.TextAnalysis.mojibakeScore]]'s
  * detection: the dominant encoding accident in web corpora is UTF-8
  * bytes decoded once (or twice) as Latin-1/Windows-1252, turning 'ä'
  * into 'Ã¤'. The repair re-encodes the string's code points as
  * Latin-1-family bytes and decodes them as UTF-8, repeatedly (up to
  * 3 rounds — double-encoded text is common, triple happens), and
  * ACCEPTS a round only if it (a) is byte-reversible (every code
  * point maps into the Latin-1/1252 byte table) and (b) strictly
  * decreases without introducing U+FFFD — so clean text, and text
  * that merely LOOKS accented, pass through untouched.
  *
  * Windows-1252 is handled where it differs from Latin-1 (the 0x80–
  * 0x9F printable block: €, ™, curly quotes… appear in real mojibake
  * as 'â€™'), which pure ISO-8859-1 arithmetic would miss. */
object FixMojibake {

  /** The 0x80–0x9F byte for Windows-1252 printables; -1 when the char
    * is not in the 1252 table (then fall back to Latin-1 range). */
  private def cp1252ByteOf(c: Char): Int = c match {
    case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
    case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
    case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
    case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
    case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
    case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
    case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
    case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
    case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
    case _ => -1
  }

  /** One reversal round: code points → Latin-1/1252 bytes → UTF-8.
    * null when any code point has no byte (not mojibake) or the UTF-8
    * decode produces U+FFFD (was not valid UTF-8). */
  private def reverseOnce(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x100) out(i) = c.toByte
      else {
        val b = cp1252ByteOf(c)
        if (b < 0) return null
        out(i) = b.toByte
      }
      i += 1
    }
    val decoded = new String(out, StandardCharsets.UTF_8)
    if (decoded.indexOf('\uFFFD') >= 0 || decoded.length >= s.length) null
    else decoded
  }

  /** Repair up to 3 rounds; the input comes back unchanged when no
    * round applies. */
  def fix(s: String): String = {
    var cur = s
    var round = 0
    while (round < 3) {
      val next = reverseOnce(cur)
      if (next == null) return cur
      cur = next
      round += 1
    }
    cur
  }

  def fixUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    val fixed = fix(str)
    if (fixed eq str) s else UTF8String.fromString(fixed)
  }

  def fixMojibake(text: Column): Column =
    GraftColumnBridge.column(
      FixMojibakeExpr(GraftColumnBridge.expression(text)))
}

final case class FixMojibakeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override protected def nullSafeEval(input: Any): Any =
    FixMojibake.fixUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input =>
      s"graft.expr.FixMojibake.fixUtf8($input)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibakeExpr =
    copy(child = newChild)
}
