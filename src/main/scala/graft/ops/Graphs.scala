package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph construction from co-occurrence — the step EVERY derived
  * graph here starts with (co-purchase, co-citation, co-session), and
  * the step where 100 TB pipelines actually blow up: projecting a
  * bipartite `(basket, item)` frame onto item-item edges emits
  * C(|basket|, 2) pairs per basket, so one pathological basket (a
  * crawler session touching 10⁶ URLs, an order file glitch repeating
  * a key) contributes 10¹² rows all by itself. The projection
  * therefore carries the same `maxBasket` dial as [[Itemsets]]:
  * oversized baskets are DROPPED before the self-join (deterministic,
  * and the right semantics — a basket shared by everything says
  * nothing about affinity, exactly like a stopword).
  *
  * Scale shape: one distinct, one size aggregate + semi-join (only
  * when capped), one basket-key equi-self-join, one distinct. */
object Graphs {

  /** Item-item co-occurrence edges, BOTH directions, self-pairs
    * excluded, deduped: `(src, dst)`. `maxBasket <= 0` disables the
    * cap (exact projection — only for basket sizes known bounded). */
  def coOccurrence(bi: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 10000): DataFrame = {
    val b = bi.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val capped =
      if (maxBasket <= 0) b
      else {
        // the guard stays COUNT-based (a count buffer is O(1) per
        // basket; collecting an uncapped basket's item list first
        // would be the very blowup the cap exists to stop)
        val ok = b.groupBy("bk").agg(count(lit(1)).as("bsz"))
          .where(col("bsz") <= maxBasket)
        b.join(ok.select("bk"), "bk")
      }
    // r20: pair generation via one per-basket list + a streaming
    // double-explode instead of the basket-key SELF-JOIN — the join
    // evaluated the capped subtree twice and re-exchanged both copies;
    // this shape shares the cap join's bk layout (groupBy adds NO
    // exchange), emits the same Σ|basket|² pair stream lazily, and
    // keeps only a |basket|-bounded (≤ maxBasket) array per row.
    capped.groupBy("bk").agg(collect_list(col("it")).as("items"))
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .where(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
  }
}
