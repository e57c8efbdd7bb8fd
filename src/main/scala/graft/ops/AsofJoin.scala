package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series operator
  * Spark lacks natively.
  *
  * Composed from built-ins (preference (a) of the extension ladder):
  * tag and union both sides, sort within each key by (time, side),
  * carry the latest right-side values forward with `last(_, ignoreNulls)`
  * over an unbounded-preceding window, then keep left rows. One shuffle
  * on the key (the union sorts within partitions) — same cost shape as
  * a sort-merge join, no range explosion, AQE-compatible. Equivalent to
  * DuckDB/QuestDB ASOF JOIN semantics: each left row pairs with the
  * newest right row whose time ≤ the left time.
  *
  * @param left      probe side (keeps all rows)
  * @param right     reference side (values carried forward)
  * @param keyCol    equi-key column name (same on both sides)
  * @param timeCol   orderable time column name (same on both sides)
  * @param valueCols right-side columns to attach (prefixed `asof_`)
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
      .withColumns(valueCols.map(v => s"__r_$v" -> lit(null).cast(right.schema(v).dataType)).toMap)
    val rightTagged = right.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as("__side")) ++
        valueCols.map(v => col(v).as(s"__r_$v"))): _*)
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
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(s"asof_$v", last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1)
      .drop((Seq("__side") ++ valueCols.map(v => s"__r_$v")): _*)
  }
}
