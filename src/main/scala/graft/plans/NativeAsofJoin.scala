package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join — the (c)-tier extension ladder demonstrated end
  * to end: logical node → planner strategy → physical operator, wired
  * through SparkSessionExtensions.
  *
  * Semantics match [[graft.ops.AsofJoin.asofJoin]] (each left row
  * pairs with the newest right row whose time ≤ left time, equal key;
  * no match → nulls). The physical operator declares clustered
  * distribution + (key, time) ordering requirements, so Catalyst
  * plans exactly one co-partitioned exchange+sort per side and the
  * join itself is a streaming per-partition merge with O(1) state —
  * the carried right row — versus the composed version's union +
  * window (which materializes the window buffer per key). At 100 TB
  * the merge form halves the shuffled volume (no unioned frame) and
  * never buffers more than one row.
  */
final case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                              keyName: String, timeName: String,
                              valueNames: Seq[String],
                              // minted ONCE by the caller: exprIds must
                              // survive optimizer copies of this node,
                              // so they are constructor state, not a
                              // lazily recomputed val
                              asofAttrs: Seq[Attribute],
                              // max staleness (time units); < 0 disables
                              tolerance: Long = -1L) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs

  /** The attrs this node generates (not present in any child). */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttrs)

  /** Child attrs the merge consumes — without this the node exposes
    * zero references and ColumnPruning strips key/time/value columns
    * out of the children. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (left.output ++ right.output).filter(a =>
        a.name == keyName || a.name == timeName || valueNames.contains(a.name)))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n @ AsofJoinNode(l, r, key, time, values, _, tol) =>
      AsofJoinExec(planLater(l), planLater(r), key, time, values,
        n.output, tol) :: Nil
    case _ => Nil
  }
}

final case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                              keyName: String, timeName: String,
                              valueNames: Seq[String],
                              override val output: Seq[Attribute],
                              tolerance: Long = -1L)
  extends BinaryExecNode {

  private def lKey = left.output.find(_.name == keyName).get
  private def lTime = left.output.find(_.name == timeName).get
  private def rKey = right.output.find(_.name == keyName).get
  private def rTime = right.output.find(_.name == timeName).get

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(lKey)), ClusteredDistribution(Seq(rKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending)),
        Seq(SortOrder(rKey, Ascending), SortOrder(rTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(lKey, Ascending), SortOrder(lTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = left.output.indexOf(lKey); val timeOrdL = left.output.indexOf(lTime)
    val rKeyIdx = right.output.indexOf(rKey); val rTimeIdx = right.output.indexOf(rTime)
    val rValIdx = valueNames.map(v => right.output.indexWhere(_.name == v))
    val rValTypes = rValIdx.map(right.output(_).dataType)
    val keyType = lKey.dataType; val timeType = lTime.dataType
    val leftOut = left.output; val rightOutLen = valueNames.length
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // bind by the SAME attribute objects: output = left attrs ++ the
      // asof attrs — the joined row is (left row, carried values row)
      // in exactly that order
      val proj = UnsafeProjection.create(allOut, leftOut ++ allOut.takeRight(rightOutLen))
      val nullRight = new GenericInternalRow(rightOutLen)
      val joined = new JoinedRow
      val ordering = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.create(org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("k", keyType),
              org.apache.spark.sql.types.StructField("t", timeType))))

      // buffered right iterator with one-row lookahead
      val rBuf = rit.buffered
      var carriedKey: Any = null
      var carriedVals: GenericInternalRow = null
      var carriedTime: Long = 0L

      def keyOf(row: InternalRow, idx: Int, isRight: Boolean): InternalRow = {
        val g = new GenericInternalRow(2)
        g.update(0, row.get(if (isRight) rKeyIdx else keyOrd, keyType))
        g.update(1, row.get(if (isRight) rTimeIdx else timeOrdL, timeType))
        g
      }

      lit.map { lrow =>
        val lkt = keyOf(lrow, keyOrd, isRight = false)
        // advance right while (rkey, rtime) <= (lkey, ltime) in the
        // same (key, time) ordering; track latest row per current key
        var advanced = true
        while (advanced && rBuf.hasNext) {
          val rkt = keyOf(rBuf.head, rKeyIdx, isRight = true)
          if (ordering.compare(rkt, lkt) <= 0) {
            val r = rBuf.next()
            val keyVal = r.get(rKeyIdx, keyType)
            val vals = new GenericInternalRow(rightOutLen)
            var i = 0
            while (i < rightOutLen) { vals.update(i, r.get(rValIdx(i), rValTypes(i))); i += 1 }
            carriedKey = keyVal
            carriedVals = vals
            // only materialized when the tolerance bound is active:
            // timestamps/longs/ints are integral in InternalRow, but
            // the cast must not run for other orderable time types
            // (or NULL times) when no tolerance is set
            if (tolerance >= 0L) {
              carriedTime =
                if (r.isNullAt(rTimeIdx)) Long.MinValue
                else r.get(rTimeIdx, timeType).asInstanceOf[Number].longValue
            }
          } else advanced = false
        }
        val lKeyVal = lrow.get(keyOrd, keyType)
        val withinTol = tolerance < 0L ||
          (!lrow.isNullAt(timeOrdL) && carriedTime != Long.MinValue &&
            lrow.get(timeOrdL, timeType).asInstanceOf[Number].longValue - carriedTime <= tolerance)
        val matches = carriedKey != null && carriedKey == lKeyVal && withinTol
        proj(joined(lrow, if (matches) carriedVals else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object NativeAsofJoin {
  /** Dataset-API entry: as-of join via the native operator. Requires
    * [[AsofJoinStrategy]] registered (GraftExtensions does this, or
    * call [[register]]). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val rightPlan = GraftColumnBridge.logicalPlan(right)
    val asofAttrs = valueCols.map { v =>
      val a = rightPlan.output.find(_.name == v).getOrElse(
        throw new IllegalArgumentException(s"column $v not in right side"))
      AttributeReference(s"asof_$v", a.dataType, nullable = true)()
    }
    GraftColumnBridge.dataFrame(spark,
      AsofJoinNode(GraftColumnBridge.logicalPlan(left), rightPlan,
        keyCol, timeCol, valueCols, asofAttrs, tolerance.getOrElse(-1L)))
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
}
