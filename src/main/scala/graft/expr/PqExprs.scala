package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `argmin_l2_cell(subvec, cents)` — the product-quantization encode
  * kernel ([[Kernels.argminL2Cell]]): nearest codeword by squared L2,
  * one fused loop, no per-centroid lambda dispatch. Same centroid
  * shape as [[ArgmaxCell]]; same null-on-empty semantics. */
final case class ArgminCellL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == LongType && (f1.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<struct<cent_id: bigint, " +
      s"cent_vec: array<float>>>), got (${left.dataType.simpleString}, " +
      s"${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "argmin_l2_cell"

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    Kernels.argminL2Cell(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Long $r = graft.expr.Kernels.argminL2Cell($vec, $cents);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArgminCellL2 =
    copy(left = newLeft, right = newRight)
}

object ArgminCellL2 {
  def argminL2Cell(vec: Column, cents: Column): Column =
    GraftColumnBridge.column(ArgminCellL2(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cents)))
}

/** `adc_score(codes, table)` — the PQ probe kernel
  * ([[Kernels.adcScore]]): m table lookups summed in one loop. The
  * composed `aggregate(sequence(...), ...)` form pays m interpreted
  * lambda dispatches per (query × corpus-row) pair — the probe's
  * entire inner loop. */
final case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    val tableOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && tableOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(codes: Any, table: Any): Any =
    Kernels.adcScore(codes.asInstanceOf[ArrayData],
      table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, table) => {
      val r = ctx.freshName("score")
      s"""
         |java.lang.Double $r = graft.expr.Kernels.adcScore($codes, $table);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  def adcScore(codes: Column, table: Column): Column =
    GraftColumnBridge.column(AdcScore(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(table)))
}

/** `adc_table(vec, books)` — the ADC table-build kernel
  * ([[Kernels.adcTable]]): all m·ksub subdistances in one fused loop.
  * The composed transform/zip_with/aggregate form pays m·ksub nested
  * interpreted lambda dispatches per probe row, which dominates the
  * residual IVFADC probe (query·nprobe tables instead of one per
  * query). `books` is the literal m×ksub×dsub codebook array. */
final case class AdcTable(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val booksOk = right.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case _ => false
    }
    if (vecOk && booksOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<array<array<float>>>), " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "adc_table"

  override protected def nullSafeEval(vec: Any, books: Any): Any =
    Kernels.adcTable(vec.asInstanceOf[ArrayData],
      books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, books) => {
      val r = ctx.freshName("tbl")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expr.Kernels.adcTable($vec, $books);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcTable =
    copy(left = newLeft, right = newRight)
}

object AdcTable {
  def adcTable(vec: Column, books: Column): Column =
    GraftColumnBridge.column(AdcTable(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(books)))
}
