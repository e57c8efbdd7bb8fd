package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series operator
  * Spark lacks natively.
  *
  * Composed from built-ins (preference (a) of the extension ladder):
  * tag and union both sides, sort within each key by (time, side),
  * carry the latest right-side ROW forward as a single
  * `last(struct(valueCols), ignoreNulls)` over an unbounded-preceding
  * window, then keep left rows. One shuffle on the key (the union
  * sorts within partitions) — same cost shape as a sort-merge join, no
  * range explosion, AQE-compatible. Equivalent to DuckDB/QuestDB ASOF
  * JOIN semantics: each left row pairs with the newest right row whose
  * time ≤ the left time, and ALL attached columns come from that one
  * row — a NULL in a value column of the matched row stays NULL rather
  * than being backfilled from an older row. Right rows with a NULL key
  * never match (aligned with [[graft.plans.NativeAsofJoin]], whose
  * carried-key comparison rejects nulls), so left rows with NULL keys
  * get all-null asof columns.
  *
  * @param left      probe side (keeps all rows)
  * @param right     reference side (values carried forward)
  * @param keyCol    equi-key column name (same on both sides)
  * @param timeCol   orderable time column name (same on both sides)
  * @param valueCols right-side columns to attach (prefixed `asof_`)
  * @param tolerance optional max staleness: a matched right row older
  *                  than `leftTime - tolerance` is treated as no
  *                  match (all asof columns null) — the standard ASOF
  *                  tolerance bound for time-series joins
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, valueCols: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    // one struct per right row: the carried unit is the whole matched
    // row (time included, for the tolerance test), so multi-column
    // attachment can't stitch values from different right rows and
    // row-level nulls survive.
    val rightStructFields =
      org.apache.spark.sql.types.StructField("__t", right.schema(timeCol).dataType) +:
      valueCols.map(v =>
        org.apache.spark.sql.types.StructField(v, right.schema(v).dataType))
    val rightStructType = org.apache.spark.sql.types.StructType(rightStructFields)

    val leftTagged = left.withColumn("__side", lit(1))
      .withColumn("__rvals", lit(null).cast(rightStructType))
    tolerance.foreach { _ =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = right.schema(timeCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(integral,
        s"tolerance requires an integral time column (got " +
        s"${right.schema(timeCol).dataType.simpleString}); convert timestamps " +
        "to epoch units first, or use NativeAsofJoin")
    }
    val rightTagged = right
      // null keys AND null times never match (a null time would sort
      // first and be carried into every row of its key — DuckDB ASOF's
      // r.t <= l.t predicate rejects null times, as does the native
      // exec's tolerance path)
      .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol), col(timeCol), lit(0).as("__side"),
        struct((col(timeCol).as("__t") +: valueCols.map(col)): _*).as("__rvals"))

    // align columns for union
    val leftCols = leftTagged.columns
    val rightAligned = leftCols.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(leftCols.map(col): _*)

    val unioned = leftTagged.union(rightAligned)
    // right rows sort before left rows at equal timestamps (side 0 < 1)
    // so a right row AT the left row's time is visible to it.
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__carried",
      last(col("__rvals"), ignoreNulls = true).over(w))
    val fresh = tolerance match {
      case Some(tol) => col(s"__carried.__t") >= col(timeCol) - lit(tol)
      case None => lit(true)
    }
    carried.where(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(v =>
          when(fresh, col(s"__carried.$v")).as(s"asof_$v")): _*)
  }
}
