package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney trigram language model — the top rung of
  * the engine's n-gram ladder ([[UnigramLm]] → [[BigramLm]] → here)
  * and the smoothing the KenLM-style perplexity gates (CCNet's 5-gram
  * filter) actually use: absolute discounting with CONTINUATION-count
  * backoff, which fixes the failure plain backoff has on words that
  * are frequent but only in stock phrases ("Francisco" is common yet
  * follows almost nothing but "San" — its unigram probability should
  * be tiny as a novel continuation, and continuation counting makes
  * it so).
  *
  * Per trigram occurrence, with discount D at both orders:
  *   p(w3|w1w2) = max(c123−D,0)/c12 + (D·N1+(w1w2·)/c12) · p(w3|w2)
  *   p(w3|w2)   = max(N1+(·w2w3)−D,0)/N1+(·w2·)
  *                + (D·N1+(w2·)/N1+(·w2·)) · p_cont(w3)
  *   p_cont(w3) = N1+(·w3)/N1+(··)
  * where N1+ are DISTINCT-type counts (how many contexts the gram
  * continues), c are occurrence counts.
  *
  * 100 TB shape: the model is four bounded vocab-sized frames (trigram
  * types with their left-extension counts, bigram occurrence counts,
  * per-middle continuation totals, per-word continuation counts) built
  * by counting groupBys over one corpus pass — only (gram, count) rows
  * ever shuffle. Scoring pre-groups repeated (doc, trigram) pairs to a
  * multiplicity, joins the model tables on token keys (shuffled
  * equi-joins, no broadcast assumption — trigram vocabularies outgrow
  * memory), and per-doc aggregates with map-side partials.
  *
  * Cross-engine determinism (the [[BigramLm]] discipline): every count
  * is integral, the probability tree is evaluated with a FIXED
  * left-to-right association mirrored term-for-term by the DuckDB
  * oracle, and the per-trigram log-prob floor-quantizes to an INTEGER
  * 1e-4 before the multiplicity-weighted per-doc sum — bit-identical
  * in any partitioning or engine.
  *
  * Scope: trained and scored on the same tokenization as the rest of
  * the ladder (whitespace, lowercased); no BOS/EOS padding (documents
  * score their interior trigrams); self-scoring keeps every term
  * defined — scoring a DIFFERENT corpus routes unseen trigram
  * contexts through the lower orders and unseen unigrams through the
  * +1 backstop on p_cont. */
object KneserNey {

  private def toksCol(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "\\s+"), t => length(t) > 0)

  /** One row per adjacent token triple: (doc_id, w1, w2, w3).
    * zip_with over three shifted slices — the documented O(len)
    * construction (a transform(sequence) lambda re-evaluates the
    * tokenization per element). */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = toksCol(col(textCol))
    val len = greatest(size(toks) - 2, lit(0))
    val ab = zip_with(slice(toks, lit(1), len), slice(toks, lit(2), len),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    val abc = zip_with(ab, slice(toks, lit(3), len),
      (p, z) => struct(p.getField("w1").as("w1"), p.getField("w2").as("w2"),
        z.as("w3")))
    docs.select(col(idCol).as("doc_id"), explode(abc).as("t"))
      .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3"))
  }

  /** The model: five frames, all vocab-sized, each joined on ITS OWN
    * key at scoring time — context-level counts must not ride the
    * trigram-type table, or an unseen trigram in a SEEN context would
    * lose the discount weighting and take the whole backoff
    * distribution unweighted (probability mass ≈ 2 per context).
    *  tri:   (w1,w2,w3, c123) trigram occurrence counts
    *  n23:   (w2,w3, n1p_dot23 = N1+(·w2w3)) left-extension types
    *  bi:    (w1,w2, c12, n1p_12dot = N1+(w1w2·)) bigram occurrence
    *         counts with the context's continuation-type count
    *  mid:   (w2, n1p_dot2dot = N1+(·w2·), n1p_2dot = N1+(w2·))
    *  cont:  (w3, n1p_dot3 = N1+(·w3)); n1pp = N1+(··) scalar frame */
  case class Model(tri: DataFrame, n23: DataFrame, bi: DataFrame,
                   mid: DataFrame, cont: DataFrame, stats: DataFrame)

  def train(docs: DataFrame, idCol: String, textCol: String): Model = {
    val tris = trigrams(docs, idCol, textCol)
    val triCounts = tris.groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c123"))
    val n12dot = triCounts.groupBy("w1", "w2")
      .agg(count(lit(1)).as("n1p_12dot"))
    val n23 = triCounts.groupBy("w2", "w3")
      .agg(count(lit(1)).as("n1p_dot23"))
    // a (w1,w2) with no trigram continuation (only ever document-
    // final) keeps n1p_12dot = 0 → scoring backs off entirely
    val bi = BigramLm.pairs(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .join(n12dot, Seq("w1", "w2"), "left")
      .withColumn("n1p_12dot", coalesce(col("n1p_12dot"), lit(0L)))
    val mid = triCounts.groupBy("w2").agg(count(lit(1)).as("n1p_dot2dot"))
      .join(bi.groupBy(col("w1").as("w2")).agg(count(lit(1)).as("n1p_2dot")),
        Seq("w2"))
    val cont = bi.groupBy(col("w2").as("w3")).agg(count(lit(1)).as("n1p_dot3"))
    val stats = bi.agg(count(lit(1)).as("n1pp"))
    Model(triCounts, n23, bi, mid, cont, stats)
  }

  /** Mean per-trigram KN log-probability of each doc under the model.
    * Output (doc_id, n_tris, lp_avg); docs with < 3 tokens are
    * omitted. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model, d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount $d must be in (0,1)")
    val occ = trigrams(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("m"))
    val joined = occ
      .join(model.tri, Seq("w1", "w2", "w3"), "left")
      .join(model.n23, Seq("w2", "w3"), "left")
      .join(model.bi, Seq("w1", "w2"), "left")
      .join(model.mid, Seq("w2"), "left")
      .join(model.cont, Seq("w3"), "left")
      .crossJoin(broadcast(model.stats))
    val D = lit(d)
    // p_cont with a +1 backstop so unseen words keep positive mass
    // when scoring a corpus the model never saw (self-scoring is
    // unaffected modulo the +1/+V smoothing, replayed by the oracle)
    val pCont = (coalesce(col("n1p_dot3"), lit(0L)) + lit(1L)) /
      (col("n1pp") + lit(1L))
    val pBi = when(col("n1p_dot2dot").isNotNull,
        greatest(coalesce(col("n1p_dot23"), lit(0L)) - D, lit(0.0)) /
          col("n1p_dot2dot") +
        (D * col("n1p_2dot") / col("n1p_dot2dot")) * pCont)
      .otherwise(pCont)
    // a known context with NO observed trigram continuation (the
    // bigram only ever ends documents) has zero discount mass — back
    // off entirely, same as an unseen context
    val pTri = when(col("c12").isNotNull && col("n1p_12dot") > 0,
        greatest(coalesce(col("c123"), lit(0L)) - D, lit(0.0)) / col("c12") +
        (D * col("n1p_12dot") / col("c12")) * pBi)
      .otherwise(pBi)
    joined
      .select(col("doc_id"), col("m"),
        (col("m") * floor(log(pTri) * lit(10000.0)).cast("long")).as("lp_m"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_tris"),
        (sum("lp_m") / sum("m") / lit(10000)).as("lp_avg"))
  }

  /** Train on the corpus and score the same corpus — the
    * single-corpus outlier-scoring form and the oracle query shape. */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String,
                d: Double = 0.75): DataFrame =
    score(docs, idCol, textCol, train(docs, idCol, textCol), d)
}
