package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group OLS trend fitting — "which segments are growing and how
  * fast", the grouped companion of [[graft.text.Zipf]]'s single-series
  * fit and [[Changepoint]]'s break localization: for every key, the
  * least-squares line of the (position, value) series, plus the
  * residual variance that says how well a line explains it.
  *
  * Engine-reproducible: x is the 1-based position in (orderCol) order,
  * y the caller's integral value; all five OLS sums are exact
  * DECIMAL(38,0) integers (order-independent, = DuckDB HUGEINT), and
  * slope/intercept/R² close with pinned double chains over
  * exact-integer inputs (IEEE-identical anywhere). Slope is reported
  * in value-units per step, floored to 10⁻⁶.
  *
  * Scale shape: one rank window per key (series-bounded) and one
  * groupBy aggregate. Keep n·|y| under ~1e18 so n·Σxy stays inside 38
  * digits.
  */
object Trend {

  /** Output per key: `(key, n_points, slope, intercept, r2)` — slope
    * and intercept floored to 10⁻⁶; r2 NULL for degenerate series
    * (constant y or fewer than 2 points excluded: n >= 2 required). */
  def fitGrouped(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ranked = df.select(col(keyCol).as("key"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("y"))
      .withColumn("x", row_number().over(
        Window.partitionBy("key").orderBy("t")).cast("long"))
    val sums = ranked.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"))
    val dx = (sums("n") * col("sxx") - col("sx") * col("sx"))
    val dy = (sums("n") * col("syy") - col("sy") * col("sy"))
    val num = (sums("n") * col("sxy") - col("sx") * col("sy"))
    sums.where(col("n") >= 2)
      .select(col("key"), col("n").as("n_points"),
        (floor(num.cast("double") / dx.cast("double") * 1000000)
          / 1000000).as("slope"),
        (floor((col("sy").cast("double") -
          num.cast("double") / dx.cast("double") * col("sx").cast("double"))
          / col("n").cast("double") * 1000000) / 1000000).as("intercept"),
        when(dy > lit(0),
          floor(num.cast("double") * num.cast("double") /
            (dx.cast("double") * dy.cast("double")) * 1000000) / 1000000)
          .as("r2"))
  }

  /** Theil-Sen robust slope per key — the median of all pairwise
    * slopes: one wild outlier day moves [[fitGrouped]]'s OLS line,
    * but cannot move a median (29% breakdown point). EXACT by
    * construction: positions and values are integers, each pairwise
    * slope is one IEEE division of exact ints (identical on any
    * engine), and the median is the deterministic lower-middle order
    * statistic with (slope, i, j) tie-breaks.
    *
    * Cost contract: O(n²) pairs PER KEY — exact Theil-Sen's inherent
    * price. Right for series-bounded keys (daily metrics: ~10⁶ pairs
    * for 3 years); cap or sample longer series upstream. */
  def theilSen(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val ranked = df.select(col(keyCol).as("key"), col(orderCol).as("t"),
        col(valueCol).cast("long").as("y"))
      .withColumn("x", row_number().over(
        Window.partitionBy("key").orderBy("t")).cast("long"))
      .select("key", "x", "y")
    val a = ranked.select(col("key"), col("x").as("xi"), col("y").as("yi"))
    val b = ranked.select(col("key").as("kb"), col("x").as("xj"),
      col("y").as("yj"))
    val pairs = a.join(b, col("key") === col("kb") && col("xi") < col("xj"))
      .select(col("key"), col("xi"), col("xj"),
        ((col("yj") - col("yi")).cast("double") /
          (col("xj") - col("xi")).cast("double")).as("slope"))
    val w = Window.partitionBy("key").orderBy(col("slope"), col("xi"),
      col("xj"))
    val np = Window.partitionBy("key")
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(np))
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("key"), col("n_pairs"),
        (floor(col("slope") * 1000000) / 1000000).as("slope"))
  }
}
