package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (A-Priori, Agrawal & Srikant 1994) over a
  * `(basket, item)` frame — market-basket co-assortment at sizes the
  * pairwise graph ops (co-purchase edges, Adamic-Adar) stop at: which
  * PAIRS and TRIPLES of items recur across enough baskets. The
  * downward-closure prune is what makes the triple pass tractable:
  * a triple can only be frequent if all three of its pairs are, so
  * the 3-way self-join is gated on the (support-bounded, broadcast)
  * frequent-pair set before it fans out.
  *
  * Exact and engine-reproducible: supports are plain distinct counts;
  * the prune is lossless (it removes only provably-infrequent
  * candidates), so a prune-free SQL replay returns identical rows.
  *
  * Scale shape: per-basket fan-out is C(|basket|, 2) / C(|basket|, 3)
  * — bounded by the largest basket, the operator's true dial. Retail
  * baskets are small (tens); for heavy-tailed basket sizes pass
  * `maxBasket` to DROP oversized baskets (the standard cap: a
  * 10⁴-item basket contributes 10¹² triples and ~no signal). All
  * joins are equi-joins on the basket key; the L1/L2 prune sides are
  * frequency-bounded and broadcastable. */
object Itemsets {

  private def baskets(bi: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val b = bi.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val capped =
      if (maxBasket <= 0) b
      else {
        val sizes = b.groupBy("bk").agg(count(lit(1)).as("bsz"))
          .where(col("bsz") <= maxBasket)
        b.join(sizes.select("bk"), "bk")
      }
    // L1: items below minSupport can't appear in any frequent set
    val l1 = capped.groupBy("it").agg(count(lit(1)).as("c1"))
      .where(col("c1") >= minSupport)
    capped.join(broadcast(l1.select("it")), "it")
      .select("bk", "it")
  }

  private def pairsFromBaskets(b1: DataFrame, minSupport: Long): DataFrame =
    b1.as("a").join(b1.as("c"),
        col("a.bk") === col("c.bk") && col("a.it") < col("c.it"))
      .groupBy(col("a.it").as("i1"), col("c.it").as("i2"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)

  /** Frequent pairs: `(i1, i2, support)` with i1 < i2 (item order),
    * support = baskets containing both, >= minSupport. */
  def frequentPairs(bi: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 0): DataFrame =
    pairsFromBaskets(baskets(bi, basketCol, itemCol, minSupport, maxBasket),
      minSupport)

  /** [[frequentPairs]] and [[frequentTriples]] from ONE basket build
    * and ONE pair count: a caller consuming both (the standard
    * pairs-then-triples report) otherwise executes the basket
    * distinct+L1 three times and the pair join twice — the triple pass
    * re-derives both internally (r21 profile: the repeated exchanges
    * were a third of the entry). Same rows as the two public forms. */
  def frequentPairsAndTriples(bi: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long, maxBasket: Int = 0)
      : (DataFrame, DataFrame) = {
    val b1 = baskets(bi, basketCol, itemCol, minSupport, maxBasket)
      .localCheckpoint(eager = false)
    val pairs = pairsFromBaskets(b1, minSupport)
      .localCheckpoint(eager = false)
    (pairs, triplesFrom(b1, pairs.select("i1", "i2"), minSupport))
  }

  /** Frequent triples: `(i1, i2, i3, support)` with i1 < i2 < i3.
    * Downward-closure-pruned: each wedge extends only frequent pairs,
    * and the closing (i1, i3) edge is checked against the broadcast
    * pair set before counting. */
  def frequentTriples(bi: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasket: Int = 0): DataFrame = {
    val b1 = baskets(bi, basketCol, itemCol, minSupport, maxBasket)
      .localCheckpoint(eager = false)
    val fp = frequentPairs(bi, basketCol, itemCol, minSupport, maxBasket)
      .select("i1", "i2").localCheckpoint(eager = false)
    triplesFrom(b1, fp, minSupport)
  }

  private def triplesFrom(b1: DataFrame, fp: DataFrame,
      minSupport: Long): DataFrame = {
    val wedge = b1.as("a").join(b1.as("c"),
        col("a.bk") === col("c.bk") && col("a.it") < col("c.it"))
      .select(col("a.bk").as("bk"), col("a.it").as("i1"),
        col("c.it").as("i2"))
      .join(broadcast(fp), Seq("i1", "i2"), "left_semi")
    wedge.as("w").join(b1.as("e"), col("w.bk") === col("e.bk") &&
        col("w.i2") < col("e.it"))
      .select(col("w.i1").as("i1"), col("w.i2").as("i2"),
        col("e.it").as("i3"))
      .join(broadcast(fp.toDF("i2", "i3")), Seq("i2", "i3"), "left_semi")
      .join(broadcast(fp.toDF("i1", "i3")), Seq("i1", "i3"), "left_semi")
      .groupBy("i1", "i2", "i3")
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
