package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial join on integer planar coordinates — the
  * classic cell-partitioned nearest-neighbor pattern (every spatial
  * engine's radius join: bucket by a grid whose cell edge equals the
  * search radius, probe the 3x3 ring, refine exactly). Coordinates
  * are caller-supplied integers (micro-degrees, millimeters — any
  * fixed-point unit), distances are exact integer SQUARED L2, so
  * results are bit-identical on any engine and a SQL oracle can
  * replay the semantics with a brute-force radius scan — the grid is
  * a pure pruning structure, invisible in the answer.
  *
  * Exactness by construction: any right point within `radius` of a
  * left point differs by at most one cell index per axis, so the 3x3
  * ring contains every admissible candidate; each right point lives
  * in exactly ONE cell, so no candidate appears twice and no dedup
  * is needed.
  *
  * Scale shape: the left side explodes 9x (a constant), both sides
  * shuffle ONCE on the cell key (an equi-join Catalyst can plan as
  * broadcast when one side is small), and the refine + argmin are
  * map-side-combinable. Cell occupancy is the skew dial: the cell
  * edge IS the radius, so a hot cell means the caller's radius is
  * large relative to point density — shrink the radius or pre-thin
  * the dense side.
  */
object Spatial {

  /** Coordinates must stay within ±OFFSET (the shift that turns
    * truncating integer division into floor division on negatives). */
  val Offset: Long = 1L << 40

  private def cellOf(c: Column, radius: Long): Column = {
    // floor division on possibly-negative coords: shift non-negative,
    // subtract the remainder, divide exactly (the `/` result is an
    // integer-valued double below 2^53 — exact by IEEE-754).
    // The shift is only valid within ±Offset — enforce it: an
    // out-of-range coordinate would silently land in the wrong cell
    // and DROP true neighbors, so fail loudly instead (one codegen'd
    // comparison per row, never taken on valid data).
    val v = when(abs(c) > lit(Offset), raise_error(concat(
        lit(s"Spatial: coordinate out of ±2^40 range: "), c.cast("string"))))
      .otherwise(c)
    val a = v + lit(Offset)
    ((a - pmod(a, lit(radius))) / lit(radius)).cast("long")
  }

  /** For each left point, the nearest right point within `radius`
    * (squared-L2, ties broken by smaller right id). Inputs both carry
    * `(id, x, y)`; output `(id, nearest_id, d2)` — left points with
    * no neighbor in range are absent. */
  def nearestWithin(left: DataFrame, right: DataFrame,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius $radius must be >= 1")
    val r2 = radius * radius
    val r = right.select(col("id").as("rid"), col("x").as("rx"),
        col("y").as("ry"))
      .withColumn("cx", cellOf(col("rx"), radius))
      .withColumn("cy", cellOf(col("ry"), radius))
    val ring = (-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct((col("cx0") + i).as("cx"), (col("cy0") + j).as("cy"))))
    val probes = left.select(col("id"), col("x"), col("y"))
      .withColumn("cx0", cellOf(col("x"), radius))
      .withColumn("cy0", cellOf(col("y"), radius))
      .select(col("id"), col("x"), col("y"),
        explode(array(ring: _*)).as("c"))
      .select(col("id"), col("x"), col("y"), col("c.cx"), col("c.cy"))
    probes.join(r, Seq("cx", "cy"))
      .withColumn("d2",
        (col("x") - col("rx")) * (col("x") - col("rx")) +
          (col("y") - col("ry")) * (col("y") - col("ry")))
      .where(col("d2") <= lit(r2))
      .groupBy("id")
      .agg(min(struct(col("d2"), col("rid"))).as("m"))
      .select(col("id"), col("m.rid").as("nearest_id"), col("m.d2").as("d2"))
  }

  /** All pairs within `radius` (squared-L2) — the radius join itself,
    * same grid, no argmin. Output `(id, rid, d2)`. */
  def withinRadius(left: DataFrame, right: DataFrame,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius $radius must be >= 1")
    val r2 = radius * radius
    val r = right.select(col("id").as("rid"), col("x").as("rx"),
        col("y").as("ry"))
      .withColumn("cx", cellOf(col("rx"), radius))
      .withColumn("cy", cellOf(col("ry"), radius))
    val ring = (-1 to 1).flatMap(i => (-1 to 1).map(j =>
      struct((col("cx0") + i).as("cx"), (col("cy0") + j).as("cy"))))
    val probes = left.select(col("id"), col("x"), col("y"))
      .withColumn("cx0", cellOf(col("x"), radius))
      .withColumn("cy0", cellOf(col("y"), radius))
      .select(col("id"), col("x"), col("y"),
        explode(array(ring: _*)).as("c"))
      .select(col("id"), col("x"), col("y"), col("c.cx"), col("c.cy"))
    probes.join(r, Seq("cx", "cy"))
      .withColumn("d2",
        (col("x") - col("rx")) * (col("x") - col("rx")) +
          (col("y") - col("ry")) * (col("y") - col("ry")))
      .where(col("d2") <= lit(r2))
      .select(col("id"), col("rid"), col("d2"))
  }
}
