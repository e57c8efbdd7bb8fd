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
        val ok = b.groupBy("bk").agg(count(lit(1)).as("bsz"))
          .where(col("bsz") <= maxBasket)
        b.join(ok.select("bk"), "bk")
      }
    capped.as("a").join(capped.as("c"), col("a.bk") === col("c.bk") &&
        col("a.it") =!= col("c.it"))
      .select(col("a.it").as("src"), col("c.it").as("dst"))
      .distinct()
  }
}
