package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._

/** Bounded-interval (range) join — pair each left row with the right
  * rows of the same key whose time falls in `[leftTime + lower,
  * leftTime + upper]`.
  *
  * Naively this is a non-equi join: Spark plans it as a broadcast
  * nested loop (or a per-key cross join + filter), which explodes at
  * scale. The scale path here adds a derived equi-key: both sides are
  * bucketed by `floor(time / W)` with bucket width `W = upper - lower`
  * (the interval span), so every left interval overlaps at most TWO
  * consecutive buckets. The left side explodes to those ≤2 bucket ids,
  * the right side lands in exactly one, and the join becomes a plain
  * shuffled equi-join on (key, bucket) followed by the exact range
  * filter — ≤2× left + 1× right shuffle volume, no quadratic blowup,
  * AQE/skew-handling applies as to any equi-join. Each (left, right)
  * pair meets in exactly one bucket (the right row's), so no
  * post-join dedup is needed.
  *
  * Bucket ids use exact integer arithmetic (`IntegralDivide` after
  * subtracting a non-negative `pmod` remainder): at nanosecond-epoch
  * magnitudes (~1.7e18) a double division would lose precision and
  * could mis-bucket boundary rows.
  *
  * Output: all left columns plus the right side's columns prefixed
  * `r_` (the key keeps its name).
  */
object RangeJoin {

  /** Exact floor(a / b) for long columns (b > 0 constant). */
  private def floorDiv(a: Column, b: Long): Column = {
    val exact = a - pmod(a, lit(b)) // exact multiple of b, double-free
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(exact), Literal(b)))
  }

  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                leftTimeCol: String, rightTimeCol: String,
                lower: Long, upper: Long): DataFrame = {
    require(upper >= lower, s"upper ($upper) must be >= lower ($lower)")
    val w = math.max(upper - lower, 1L)

    val lBucketed = left.withColumn("__bkt", explode(array_distinct(array(
      floorDiv(col(leftTimeCol) + lower, w),
      floorDiv(col(leftTimeCol) + upper, w)))))

    val rRenamed = right.select(right.columns.map(c =>
      if (c == keyCol) col(c) else col(c).as(s"r_$c")): _*)
    val rBucketed = rRenamed.withColumn("__bkt",
      floorDiv(col(s"r_$rightTimeCol"), w))

    lBucketed.join(rBucketed, Seq(keyCol, "__bkt"))
      .where(col(s"r_$rightTimeCol") >= col(leftTimeCol) + lower &&
             col(s"r_$rightTimeCol") <= col(leftTimeCol) + upper)
      .drop("__bkt")
  }
}
