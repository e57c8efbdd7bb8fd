package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — the
  * standard score-free way to combine heterogeneous rankings
  * (BM25 + embedding cosine + quality prior) into one list: each list
  * contributes 1/(k+rank) per item, incomparable score scales never
  * meet. The workhorse of hybrid retrieval and multi-signal corpus
  * curation (relevance x quality x freshness).
  *
  * Engine-reproducible: contributions are the INTEGER
  * `scale div (k + rank)` (ranks are deterministic via
  * (score desc, id asc)), so fused scores are exact BIGINT sums in
  * any order — the float 1/(k+r) sum would be order-sensitive.
  *
  * Scale shape: each input list is first cut to its top-`topN` by a
  * distributed TakeOrdered (never a global sort), the rank window
  * then runs over that bounded frame only, and the fusion is one
  * union + groupBy-sum. Ranking a corpus-sized frame happens in the
  * TakeOrdered; the single-partition window only ever sees `topN`
  * rows.
  */
object RankFusion {

  /** Fuse ranked lists. Each input carries `idCol` + `scoreCol`
    * (higher = better; ties broken by id asc). Output:
    * `(id, rrf_score, n_lists)` — items appearing in more lists and
    * nearer their heads score higher. */
  def rrf(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      topN: Int = 1000, k: Int = 60,
      scale: Long = 1000000000L): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one list")
    require(topN >= 1 && k >= 0 && scale >= 1)
    val contribs = lists.map { df =>
      val top = df.select(col(idCol), col(scoreCol))
        .orderBy(col(scoreCol).desc, col(idCol).asc).limit(topN)
      top.select(col(idCol), row_number().over(
          Window.orderBy(col(scoreCol).desc, col(idCol).asc)).as("rank"))
        .select(col(idCol),
          expr(s"${scale}L div (${k}L + rank)").as("c"))
    }
    contribs.reduce(_ union _)
      .groupBy(idCol)
      .agg(sum("c").as("rrf_score"), count(lit(1)).as("n_lists"))
  }
}
