package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring with interpolated unigram backoff —
  * one rung up the n-gram ladder from [[UnigramLm]] toward the
  * KenLM-style perplexity gate CCNet runs (a 5-gram LM trained on a
  * trusted corpus, scoring the candidate corpus; docs far from the
  * reference distribution are cut). The bigram captures local word
  * order, which is what separates shuffled-word gibberish from prose
  * — the failure mode a unigram model cannot see.
  *
  * Per adjacent pair: p(w2|w1) = λ·p_ml(w2|w1) + (1−λ)·p_lap(w2)
  * where p_ml = c(w1,w2)/c(w1) (0 when the pair is unseen) and
  * p_lap = (c(w2)+1)/(N+V) — Laplace-smoothed unigram backoff, so
  * every pair has positive probability.
  *
  * 100 TB shape: training is two counting groupBys (unigram and
  * bigram vocabularies — Zipf-small relative to the corpus; only
  * (gram, count) rows shuffle) plus one model-sized join attaching
  * c(w1). Scoring joins corpus pairs to the bigram model on (w1,w2)
  * and to the unigram model on w2 — two shuffled equi-joins, no
  * broadcast assumption — then per-doc aggregates with map-side
  * partials. The 1-row stats frame broadcasts.
  *
  * Cross-engine determinism: the interpolation is computed with a
  * fixed left-to-right association and the per-pair log-prob is
  * floor-quantized to an INTEGER 1e-4 before the per-doc sum (the
  * [[UnigramLm]]/[[Bm25]] discipline), so the mean replays exactly.
  */
object BigramLm {

  private def toksCol(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "\\s+"), t => length(t) > 0)

  /** One row per adjacent token pair: (doc_id, w1, w2). Docs with
    * fewer than 2 tokens contribute nothing. Narrow explode.
    *
    * Built with `zip_with` over two shifted slices — NOT
    * `transform(sequence(...), i => element_at(toks, i))`: a lambda
    * that references `toks` re-evaluates the whole split+filter
    * tokenization per ELEMENT after CollapseProject inlines it
    * (O(len²) per doc — measured 2× on the sf0.1 bench); the slice
    * arguments evaluate it a constant number of times per row. */
  def pairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = toksCol(col(textCol))
    val len = greatest(size(toks) - 1, lit(0))
    val prs = zip_with(slice(toks, lit(1), len), slice(toks, lit(2), len),
      (x, y) => struct(x.as("w1"), y.as("w2")))
    docs.select(col(idCol).as("doc_id"), explode(prs).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
  }

  /** Unigram counts over the corpus: (token, cnt). */
  def trainUnigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(toksCol(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Bigram model: (w1, w2, cnt12, cnt1) — pair counts with the
    * first word's UNIGRAM count attached (one model-sized join), so
    * scoring needs no third corpus-sized join for the denominator. */
  def trainBigrams(docs: DataFrame, idCol: String, textCol: String,
                   unigrams: DataFrame): DataFrame =
    pairs(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt12"))
      .join(unigrams.select(col("token").as("w1"), col("cnt").as("cnt1")), "w1")

  /** Mean per-pair log-probability of each doc under the model.
    * Output (doc_id, n_pairs, lp_avg); docs with < 2 tokens are
    * omitted (no pairs, no defined score). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            bigrams: DataFrame, unigrams: DataFrame,
            lambda: Double = 0.8): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda $lambda must be in (0,1)")
    val stats = unigrams.agg(sum("cnt").as("n_total"), count(lit(1)).as("v_size"))
    // pre-aggregate repeated (doc, pair) occurrences to a multiplicity
    // BEFORE the model joins: natural-language bigrams are Zipf-
    // repetitive within documents, so the join streams shrink several-
    // fold; the quantized integer lp multiplies exactly, so the result
    // is bit-identical to per-occurrence scoring (the oracle replays
    // per-occurrence and hash-matches)
    val prs = pairs(docs, idCol, textCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
    val scored = prs
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(unigrams.select(col("token").as("w2"), col("cnt").as("cnt2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("m"),
        // λ·ml + (1−λ)·lap with fixed association, then floor-1e-4;
        // unseen pair ⇒ ml term exactly 0.0
        (col("m") * floor(log(
          lit(lambda) * when(col("cnt12").isNull, lit(0.0))
            .otherwise(col("cnt12") / col("cnt1")) +
          lit(1.0 - lambda) * ((coalesce(col("cnt2"), lit(0L)) + lit(1L)) /
            (col("n_total") + col("v_size")))) * lit(10000.0))
          .cast("long")).as("lp_m"))
    scored.groupBy("doc_id")
      .agg(sum("m").as("n_pairs"),
        (sum("lp_m") / sum("m") / lit(10000)).as("lp_avg"))
  }

  /** Train on the corpus and score the same corpus — the
    * single-corpus outlier-scoring form and the oracle query shape. */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String,
                lambda: Double = 0.8): DataFrame = {
    val uni = trainUnigrams(docs, idCol, textCol)
    score(docs, idCol, textCol, trainBigrams(docs, idCol, textCol, uni), uni,
      lambda)
  }
}
