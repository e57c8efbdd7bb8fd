package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Header-only image dimensions as a native codegen'd expression —
  * the resolution/format gate a multimodal curation pass runs at scan
  * speed BEFORE paying for pixel decode (ImageIO allocates a
  * BufferedImage per row; this reads a few header bytes). The kernel
  * ([[Kernels.imageDimsPacked]]) recognizes PNG/GIF/BMP fixed headers
  * and walks JPEG markers to the first SOF; anything unrecognized or
  * truncated is NULL, never an exception — crawl payloads are hostile.
  *
  * Returns the packed long (format<<48 | width<<24 | height); use
  * [[ImageDims.imageDims]] for the unpacked (format, width, height)
  * struct — the unpack is plain bit arithmetic, so the whole probe
  * stays inside one whole-stage-codegen span. */
final case class ImageDimsPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims_packed"

  override protected def nullSafeEval(input: Any): Any = {
    val p = Kernels.imageDimsPacked(input.asInstanceOf[Array[Byte]])
    if (p == 0L) null else java.lang.Long.valueOf(p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val p = ctx.freshName("dims")
      s"""
         |long $p = graft.expr.Kernels.imageDimsPacked($input);
         |if ($p == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $p;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageDimsPacked =
    copy(child = newChild)
}

/** EXIF orientation (1-8) from a JPEG APP1 header walk — the rotation
  * flag a thumbnail pass must honor. NULL when absent/non-JPEG/
  * malformed; kernel semantics in [[Kernels.exifOrientation]]. */
final case class ExifOrientationExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "exif_orientation"

  override protected def nullSafeEval(input: Any): Any = {
    val v = Kernels.exifOrientation(input.asInstanceOf[Array[Byte]])
    if (v == 0) null else java.lang.Integer.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val v = ctx.freshName("ori")
      s"""
         |int $v = graft.expr.Kernels.exifOrientation($input);
         |if ($v == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ExifOrientationExpr =
    copy(child = newChild)
}

/** `exif_has_gps(payload)` — does the JPEG carry a GPS IFD pointer
  * (tag 0x8825)? The privacy probe before training on crawl images;
  * kernel semantics in [[Kernels.exifHasGps]]. */
final case class ExifHasGpsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "exif_has_gps"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      Kernels.exifHasGps(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expr.Kernels.exifHasGps($input);")

  override protected def withNewChildInternal(newChild: Expression): ExifHasGpsExpr =
    copy(child = newChild)
}

/** `strip_exif(payload)` — the JPEG with every APP1 (EXIF/XMP)
  * segment spliced out, image stream untouched; non-JPEG/unparseable
  * input passes through unchanged. Kernel:
  * [[Kernels.stripExifSegments]]. */
final case class StripExifExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "strip_exif"

  override protected def nullSafeEval(input: Any): Any =
    Kernels.stripExifSegments(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expr.Kernels.stripExifSegments($input);")

  override protected def withNewChildInternal(newChild: Expression): StripExifExpr =
    copy(child = newChild)
}

object ImageDims {

  /** GPS-presence privacy probe (false for non-JPEG/malformed). */
  def exifHasGps(payload: Column): Column =
    GraftColumnBridge.column(
      ExifHasGpsExpr(GraftColumnBridge.expression(payload)))

  /** EXIF/XMP scrub: APP1 segments spliced out, image untouched. */
  def stripExif(payload: Column): Column =
    GraftColumnBridge.column(
      StripExifExpr(GraftColumnBridge.expression(payload)))

  def imageDimsPacked(payload: Column): Column =
    GraftColumnBridge.column(
      ImageDimsPacked(GraftColumnBridge.expression(payload)))

  /** EXIF orientation 1-8; NULL when absent or malformed. */
  def exifOrientation(payload: Column): Column =
    GraftColumnBridge.column(
      ExifOrientationExpr(GraftColumnBridge.expression(payload)))

  /** (format, width, height) struct; NULL when the payload is not a
    * recognizable image. */
  def imageDims(payload: Column): Column = {
    val p = imageDimsPacked(payload)
    val fmt = when(shiftright(p, 48) === 1, "png")
      .when(shiftright(p, 48) === 2, "jpeg")
      .when(shiftright(p, 48) === 3, "gif")
      .when(shiftright(p, 48) === 4, "bmp")
      .when(shiftright(p, 48) === 5, "webp")
      .when(shiftright(p, 48) === 6, "tiff")
    when(p.isNotNull, struct(
      fmt.as("format"),
      shiftright(p, 24).bitwiseAND(lit(0xffffffL)).cast("int").as("width"),
      p.bitwiseAND(lit(0xffffffL)).cast("int").as("height")))
  }
}
