package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single mean-shift changepoint localization per series — the
  * monitoring question behind every metric dashboard: WHERE did the
  * level change? For each key's ordered series the operator maximizes
  * the normalized CUSUM statistic
  * `(A_i·(n−i) − (S−A_i)·i)² / (i·(n−i))` over split positions i
  * (the ML mean-shift statistic; A_i = prefix sum, S = total) — the
  * argmax is the most likely single break.
  *
  * Engine-reproducible: values are caller-quantized BIGINTs, prefix
  * sums and the squared numerator are exact integers (DECIMAL(38,0) /
  * HUGEINT), and the only floating step casts those EXACT integers to
  * double and divides — IEEE-identical on every engine, so even the
  * argmax tie-break (score desc, i asc) agrees bit-for-bit.
  *
  * Scale shape: one window pass per key (series-bounded, never
  * corpus-wide) building prefix sums, then a max_by-struct aggregate
  * per key — no self-join over split candidates, no driver loop.
  * Numerator magnitude is (Σ|v|·n)² — keep |v|·n under ~1e18 so the
  * square stays within 38 digits.
  */
object Changepoint {

  /** Best single split per key. Input columns: `keyCol`, `orderCol`
    * (unique per key), `valueCol` (integral). Output per key:
    * `(key, cp_at, cp_index, n_points, score_floor, mean_left,
    * mean_right)` — cp_index = left-segment size, cp_at = orderCol of
    * the LAST left point, means floored to integers. Series with
    * fewer than 2 points are absent. */
  def meanShift(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val wCum = Window.partitionBy("key").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("key")
    val dec = "decimal(38,0)"
    val cum = df.select(col(keyCol).as("key"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("v"))
      .withColumn("a", sum("v").over(wCum).cast(dec))
      .withColumn("i", row_number().over(
        Window.partitionBy("key").orderBy("t")))
      .withColumn("s", sum("v").over(wAll).cast(dec))
      .withColumn("n", count(lit(1)).over(wAll))
    val scored = cum.where(col("i") < col("n"))
      .withColumn("diff",
        (col("a") * (col("n") - col("i")) -
          (col("s") - col("a")) * col("i")).cast(dec))
      .withColumn("score",
        (col("diff") * col("diff")).cast("double") /
          (col("i") * (col("n") - col("i"))).cast("double"))
    scored.groupBy("key")
      .agg(max(struct(col("score"), (-col("i")).as("ni"), col("t"),
        col("i"), col("n"), col("a"), col("s"))).as("b"))
      .select(col("key"), col("b.t").as("cp_at"),
        col("b.i").cast("long").as("cp_index"),
        col("b.n").as("n_points"),
        // report the n²-normalized statistic (≈ squared mean shift
        // scaled by the split balance): the raw CUSUM² can exceed
        // int64 on long high-magnitude series; the argmax above still
        // uses the raw score
        floor(col("b.score") /
          (col("b.n") * col("b.n")).cast("double")).as("score_floor"),
        floor(col("b.a").cast("double") / col("b.i").cast("double"))
          .cast("long").as("mean_left"),
        floor((col("b.s") - col("b.a")).cast("double") /
          (col("b.n") - col("b.i")).cast("double"))
          .cast("long").as("mean_right"))
  }
}
