package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph summary statistics — the "what kind of graph is this"
  * read (Newman 2002) that should precede any walk/community/link
  * operator: assortativity says whether hubs attach to hubs
  * (assortative, r > 0 — social/co-purchase graphs) or to leaves
  * (disassortative, r < 0 — web/biology), which decides skew strategy
  * (hub caps, salting) before the expensive ops run.
  *
  * Engine-reproducible: degrees are exact counts; the Pearson
  * correlation over edge endpoint degrees closes from five
  * DECIMAL(38,0) sums (order-independent, = DuckDB HUGEINT) with one
  * pinned double chain at the end, floored to 10⁻⁶.
  *
  * Scale shape: two degree aggregates (narrow, map-side combined) and
  * two broadcast-or-shuffle hash joins back to the edge list; the
  * moment reduce is a single full-reduce row. No window, no
  * quadratic term, hub-safe (a hub's degree joins to its edges — no
  * fan-out beyond the edge count itself). */
object GraphStats {

  /** Degree assortativity of a directed edge frame `(src, dst)`:
    * Pearson r between src OUT-degree and dst IN-degree across edges
    * (for an undirected reading, pass each edge in both directions).
    * Output one row: `(n_edges, assortativity)` — NULL r for
    * degenerate graphs (all degrees equal on either side). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val e = edges.select(col("src"), col("dst")).distinct()
    val outDeg = e.groupBy(col("src").as("s")).agg(count(lit(1)).as("dx"))
    val inDeg = e.groupBy(col("dst").as("d")).agg(count(lit(1)).as("dy"))
    val sums = e
      .join(outDeg, col("src") === col("s"))
      .join(inDeg, col("dst") === col("d"))
      .agg(count(lit(1)).cast(dec).as("m"),
        sum(col("dx").cast(dec)).as("sx"),
        sum(col("dy").cast(dec)).as("sy"),
        sum((col("dx") * col("dx")).cast(dec)).as("sxx"),
        sum((col("dy") * col("dy")).cast(dec)).as("syy"),
        sum((col("dx") * col("dy")).cast(dec)).as("sxy"))
    val num = sums("m") * col("sxy") - col("sx") * col("sy")
    val dx = sums("m") * col("sxx") - col("sx") * col("sx")
    val dy = sums("m") * col("syy") - col("sy") * col("sy")
    sums.select(col("m").cast("long").as("n_edges"),
      when(dx > 0 && dy > 0,
        floor(num.cast("double") /
          sqrt(dx.cast("double") * dy.cast("double")) * 1000000)
          / 1000000).as("assortativity"))
  }
}
