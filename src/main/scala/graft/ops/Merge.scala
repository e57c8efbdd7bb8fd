package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type-2) merge — the MERGE INTO
  * upsert shape a warehouse dimension feed needs, expressed Spark-first:
  * Spark has no mutable MERGE target, so the operator returns the NEW
  * dimension snapshot (history + closed + reopened + inserted rows) and
  * the caller writes it atomically.
  *
  * Reference analogue: the bank feed's RecordOperation A/D rows are an
  * SCD batch against the payee dimension
  * (/root/reference/newaugsver_clean.py:289 — A adds/updates a payee,
  * D end-dates one via EffectiveEndDate).
  *
  * Scale shape: ONE equi-join of the open slice against the update
  * batch on the business key (broadcast when the batch is small — the
  * common case; shuffled hash join otherwise), plus narrow unions.
  * The four output branches filter the same joined frame, and their
  * identical scan/exchange subtrees are deduplicated by reused-exchange
  * at runtime; for very wide dims, persist `j` instead.
  */
object Merge {

  val FarFuture = "9999-12-31"

  /** Apply a batch of updates to an SCD2 dimension.
    *
    * `current` must carry exactly `keyCols ++ attrCols` plus
    * (`valid_from`, `valid_to`, `is_current`); `updates` carries
    * `keyCols ++ attrCols`. Semantics:
    *   - history rows (is_current = false) pass through untouched;
    *   - open rows whose attributes differ (null-safely) from their
    *     update are closed (valid_to = effectiveDate, is_current=false)
    *     and a new open row with the update's attributes is emitted;
    *   - open rows with no update, or an attribute-identical update,
    *     pass through;
    *   - keys present only in `updates` insert as new open rows.
    * Keys must be non-null (dimension business keys), and `updates`
    * must carry AT MOST ONE row per key — a feed with several changes
    * for one key in one batch must be compacted to the latest first
    * (the q_latest_per_key shape); otherwise the key joins against
    * each update row and the snapshot double-counts. Enforced with one
    * window pass over the (small) update batch: a duplicate update key
    * fails the job rather than corrupting the dimension.
    */
  def scd2(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
           attrCols: Seq[String], effectiveDate: String,
           farFuture: String = FarFuture): DataFrame = {
    val outCols = (keyCols ++ attrCols ++ Seq("valid_from", "valid_to", "is_current")).map(col)

    val hist = current.where(!col("is_current")).select(outCols: _*)
    val cur = current.where(col("is_current"))

    val wk = org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)
    val u = attrCols
      .foldLeft(updates.select((keyCols ++ attrCols).map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, "u_" + c)
      }
      // duplicate-key guard: assert_true survives column pruning only
      // inside a predicate, so it rides the filter
      .withColumn("_dup", count(lit(1)).over(wk))
      .where(assert_true(col("_dup") === 1, lit(
        "Merge.scd2: duplicate key in updates batch — compact to latest-per-key first")).isNull)
      .drop("_dup")
      .withColumn("_in_upd", lit(true))

    val j = cur.withColumn("_in_cur", lit(true))
      .join(u, keyCols, "full_outer")

    // null-safe attribute drift: a NULL'd-out attribute is a change
    val drift = attrCols.map(c => !(col(c) <=> col("u_" + c))).reduce(_ || _)
    val changed = col("_in_cur").isNotNull && col("_in_upd").isNotNull && drift

    val passthrough = j
      .where(col("_in_cur").isNotNull && (col("_in_upd").isNull || !drift))
      .select(outCols: _*)
    val closed = j.where(changed)
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("valid_from"), lit(effectiveDate).as("valid_to"),
        lit(false).as("is_current")): _*)
    val opened = j.where(changed)
      .select(keyCols.map(col) ++ attrCols.map(c => col("u_" + c).as(c)) ++ Seq(
        lit(effectiveDate).as("valid_from"), lit(farFuture).as("valid_to"),
        lit(true).as("is_current")): _*)
    val inserted = j.where(col("_in_cur").isNull)
      .select(keyCols.map(col) ++ attrCols.map(c => col("u_" + c).as(c)) ++ Seq(
        lit(effectiveDate).as("valid_from"), lit(farFuture).as("valid_to"),
        lit(true).as("is_current")): _*)

    hist.union(passthrough).union(closed).union(opened).union(inserted)
  }

  /** Bootstrap a plain table into SCD2 shape (all rows open). */
  def asScd2(df: DataFrame, validFrom: String,
             farFuture: String = FarFuture): DataFrame =
    df.withColumn("valid_from", lit(validFrom))
      .withColumn("valid_to", lit(farFuture))
      .withColumn("is_current", lit(true))
}
