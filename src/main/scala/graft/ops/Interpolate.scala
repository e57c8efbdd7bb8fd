package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling by LINEAR INTERPOLATION onto a regular
  * grid — the pandas `resample().interpolate()` shape, the step past
  * the forward-fill resampler (`q_resample_ffill`): each grid instant
  * takes `v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev)`
  * between its neighboring observations.
  *
  * Plan shape: grid points union observations, ONE shuffle on the
  * key, and a single window pass computes both neighbors — the
  * backward (`last` ignoreNulls, unbounded-preceding) and forward
  * (`first` ignoreNulls, unbounded-following) carries share one
  * partitioning and sort (two frame-split WindowExecs, ONE exchange
  * and ONE sort between them); same
  * cost as the as-of union trick, no range-join explosion. The grid
  * spans [min, max] per key, so every grid point has both neighbors.
  *
  * Determinism: the sort is total — (time, side, value) — so tied
  * observation timestamps resolve identically everywhere; the
  * interpolated value is floor-quantized to 4 decimals. Null-valued
  * observations are dropped (they carry no information to
  * interpolate). */
object Interpolate {

  /** Resample each key's series onto a step-aligned grid with linear
    * interpolation. `timeCol` must be integral (epoch units); output
    * (key, ts, value). Keys whose span contains no aligned grid point
    * yield no rows. */
  def resampleLinear(obs: DataFrame, keyCol: String, timeCol: String,
                     valueCol: String, step: Long): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val o = obs.select(col(keyCol).as("k"), col(timeCol).as("t"),
        col(valueCol).cast("double").as("v"))
      .where(col("k").isNotNull && col("t").isNotNull && col("v").isNotNull)
    val start = (expr("t0 div " + step) + 1) * step
    val grid = o.groupBy("k").agg(min("t").as("t0"), max("t").as("t1"))
      .select(col("k"),
        explode(when(start <= col("t1"),
          sequence(start, col("t1"), lit(step)))).as("t"))
      .withColumn("side", lit(1)).withColumn("v", lit(null).cast("double"))
    val union = o.withColumn("side", lit(0))
      .select("k", "t", "side", "v")
      .unionByName(grid.select("k", "t", "side", "v"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"), col("v"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    union
      .withColumn("pt", last(when(col("side") === 0, col("t")), ignoreNulls = true).over(back))
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("nt", first(when(col("side") === 0, col("t")), ignoreNulls = true).over(fwd))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .where(col("side") === 1)
      .select(col("k").as(keyCol), col("t").as(timeCol),
        // nt null = no observation strictly after this grid point (an
        // equal-time observation sorts BEFORE the grid row): the tail
        // degenerates to forward fill, exactly pandas' behavior
        (floor(when(col("nt").isNull || col("nt") === col("pt"), col("pv"))
          .otherwise(
            col("pv") + (col("nv") - col("pv")) * (col("t") - col("pt"))
              / (col("nt") - col("pt"))) * 1e4) / 1e4).as(valueCol))
  }
}
