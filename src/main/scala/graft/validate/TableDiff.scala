package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — "what
  * changed between yesterday's feed and today's": added / removed /
  * changed / unchanged per business key.
  *
  * Reference analogue: the pipeline's row-count compare
  * (DM_bankfile_validate_pipeline.py:786 region) says only HOW MANY
  * rows differ; this says WHICH keys and WHICH side. Combined with
  * [[Drift]] (distribution level) and [[Validator]] (row level) it
  * completes the three-altitude validation story.
  *
  * Scale shape: ONE full-outer shuffle join on the key; the attribute
  * compare is a null-safe struct equality (no per-column join). The
  * summary re-aggregates the tiny status domain.
  */
object TableDiff {

  /** Per-key statuses. Attribute comparison covers `compareCols`
    * (default: all non-key columns present in BOTH sides). */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else before.columns.filterNot(keyCols.contains)
        .intersect(after.columns.filterNot(keyCols.contains)).toSeq
    val b = before.select((keyCols ++ cols).map(col): _*)
      .withColumn("_b", lit(true))
    val a = cols.foldLeft(after.select((keyCols ++ cols).map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, "a_" + c)
      }
      .withColumn("_a", lit(true))
    val same =
      if (cols.isEmpty) lit(true)
      else cols.map(c => col(c) <=> col("a_" + c)).reduce(_ && _)
    b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_b").isNull, "added")
          .when(col("_a").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed").as("diff_status"): _*)
  }

  /** Status counts — the one-line regression check. */
  def summary(before: DataFrame, after: DataFrame, keyCols: Seq[String],
              compareCols: Seq[String] = Nil): DataFrame =
    diff(before, after, keyCols, compareCols)
      .groupBy("diff_status").agg(count(lit(1)).as("n"))
      .orderBy("diff_status")
}
