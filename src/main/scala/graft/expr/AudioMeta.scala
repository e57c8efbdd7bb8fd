package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Header-only audio stream parameters as a native codegen'd
  * expression — the duration/rate/channel gate of a multimodal
  * curation pass, reading container headers instead of constructing a
  * javax.sound stream per row (the [[ImageDimsPacked]] pattern for
  * audio). Kernel: [[Kernels.audioMetaPacked]] — WAV chunk walk,
  * AIFF COMM with the 80-bit extended-float rate, AU fixed header;
  * r13 compressed-container headers: FLAC STREAMINFO, MP3 frame +
  * Xing/Info, OGG Vorbis/Opus id header + last-page granule;
  * unrecognized/truncated payloads are NULL, never an exception. */
final case class AudioMetaPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta_packed"

  override protected def nullSafeEval(input: Any): Any = {
    val p = Kernels.audioMetaPacked(input.asInstanceOf[Array[Byte]])
    if (p == 0L) null else java.lang.Long.valueOf(p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val p = ctx.freshName("ameta")
      s"""
         |long $p = graft.expr.Kernels.audioMetaPacked($input);
         |if ($p == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $p;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioMetaPacked =
    copy(child = newChild)
}

object AudioMeta {

  def audioMetaPacked(payload: Column): Column =
    GraftColumnBridge.column(
      AudioMetaPacked(GraftColumnBridge.expression(payload)))

  /** (format, channels, sample_rate, frames, duration_s) struct; NULL
    * when the payload is not recognizable audio. duration_s is
    * frames/rate rounded to milliseconds. */
  def audioMeta(payload: Column): Column = {
    val p = audioMetaPacked(payload)
    // UNSIGNED shift: fmt ids >= 4 set bit 63, and an arithmetic
    // shift would sign-extend them negative
    val f = shiftrightunsigned(p, 61)
    val fmt = when(f === 1, "wav")
      .when(f === 2, "aiff")
      .when(f === 3, "au")
      .when(f === 4, "flac")
      .when(f === 5, "mp3")
      .when(f === 6, "ogg")
    val rate = shiftright(p, 36).bitwiseAND(lit(0xfffffL))
    val frames = p.bitwiseAND(lit(0xfffffffffL))
    when(p.isNotNull, struct(
      fmt.as("format"),
      shiftright(p, 56).bitwiseAND(lit(0x1fL)).cast("int").as("channels"),
      rate.cast("int").as("sample_rate"),
      frames.as("frames"),
      round(frames.cast("double") / rate, 3).as("duration_s")))
  }
}
