package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al. 1996) over integer planar points — density
  * clustering with a NOISE verdict, composed entirely from operators
  * this engine already trusts: the ε-neighborhood pairs come from
  * [[Spatial.withinRadius]]'s grid-bucketed exact radius join (one
  * cell equi-join, never all-pairs), the core-core reachability
  * closure from [[ConnectedComponents]] (log-round pointer jumping).
  * Clusters of arbitrary shape, no k to guess — the standard read on
  * spatial/projected data where k-means' spherical assumption lies.
  *
  * Exactly the textbook semantics: a CORE point has >= minPts
  * neighbors within ε (itself included); cores within ε of each other
  * share a cluster; a BORDER point is a non-core within ε of a core
  * and joins the SMALLEST CLUSTER ID among its core-neighbors'
  * clusters — i.e. min over cluster labels, where each label is its
  * component's smallest core id (the deterministic stand-in for the
  * paper's arrival-order assignment — the one place textbook DBSCAN
  * is nondeterministic); everything else is NOISE. Note this is a
  * min over CLUSTER ids, not over core-neighbor ids: a border
  * touching clusters {5,9} via core-neighbors {9, 6} joins cluster 5
  * (cluster of core 6), not core 9's.
  *
  * Scale shape: one radius join (grid-bounded), one degree aggregate,
  * two semi-join filters, one CC closure over core-core edges, one
  * min-aggregate for borders. Density pathologies bound the radius
  * join: a cell holding m points emits m² pairs — pick ε at the scale
  * where neighborhoods are meant to be small (same dial as every
  * DBSCAN). */
object Dbscan {

  /** `points`: (id long-castable, x, y integer units). Output:
    * `(id, cluster, role)` — role core/border/noise, cluster = the
    * component's smallest core id (NULL for noise). */
  def cluster(points: DataFrame, eps: Long, minPts: Int): DataFrame = {
    require(eps >= 1, s"eps $eps must be >= 1")
    require(minPts >= 1, s"minPts $minPts must be >= 1")
    val pts = points.select(col("id").cast("long").as("id"),
        col("x").cast("long").as("x"), col("y").cast("long").as("y"))
      .localCheckpoint(eager = false)
    // ε-pairs, both directions, self included (d2 = 0)
    val pairs = Spatial.withinRadius(pts, pts, eps)
      .select(col("id"), col("rid"))
      .localCheckpoint(eager = false)
    val cores = pairs.groupBy("id").agg(count(lit(1)).as("n"))
      .where(col("n") >= minPts)
      .select("id")
      .localCheckpoint(eager = false)
    val coreEdges = pairs
      .join(cores, Seq("id"), "left_semi")
      .join(cores.withColumnRenamed("id", "rid"), Seq("rid"), "left_semi")
      .select(col("id").as("src"), col("rid").as("dst"))
    val comp = ConnectedComponents.components(coreEdges)
      .select(col("id"), col("component").as("cluster"))
      .localCheckpoint(eager = false)
    val coreRows = comp.select(col("id"), col("cluster"),
      lit("core").as("role"))
    val borderRows = pairs
      .join(cores, Seq("id"), "left_anti")
      .join(cores.withColumnRenamed("id", "rid"), Seq("rid"), "left_semi")
      .join(comp.withColumnRenamed("id", "rid"), "rid")
      .groupBy("id")
      .agg(min("cluster").as("cluster"))
      .select(col("id"), col("cluster"), lit("border").as("role"))
    val assigned = coreRows.unionAll(borderRows)
    val noiseRows = pts.select("id")
      .join(assigned.select("id"), Seq("id"), "left_anti")
      .select(col("id"), lit(null).cast("long").as("cluster"),
        lit("noise").as("role"))
    assigned.unionAll(noiseRows)
  }
}
