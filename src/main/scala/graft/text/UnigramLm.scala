package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the perplexity-filter family of
  * training-corpus quality gates (score each document by its mean
  * per-token log-probability under a token LM; drop the gibberish /
  * boilerplate tails). The classic pipeline trains the model on a
  * trusted reference corpus and scores the candidate corpus; both
  * halves are exposed separately so that shape works, and
  * [[scoreSelf]] composes them for the self-scoring oracle query.
  *
  * 100 TB shape: training is one token groupBy (map-side partial
  * counts — only (token, count) pairs shuffle); scoring joins the
  * candidate corpus' postings to the model ON TOKEN (a plain shuffled
  * equi-join — the vocabulary can be millions of rows, so no broadcast
  * assumption) and per-doc aggregates with map-side partials. The
  * 1-row corpus stats broadcast.
  *
  * Cross-engine determinism: per-token log-probs are floor-quantized
  * to 1e-4 as INTEGERS and summed as integers (associative — no float
  * summation-order caveat), then divided once per doc — the same
  * technique as [[Bm25]]'s ranked sum, so a SQL engine replays the
  * score bit-for-bit.
  */
object UnigramLm {

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)

  /** Token counts over the training corpus: (token, cnt). */
  def train(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    tokens(docs, idCol, textCol).groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Mean per-token log-probability of each document under `model`
    * (Laplace-smoothed: p(t) = (cnt(t)+1) / (N+V), unseen tokens get
    * cnt 0). Output: (doc_id, n_tokens, lp_avg); documents with no
    * tokens are omitted (no defined probability). Lower lp_avg =
    * higher perplexity = less like the training corpus. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    // 1-row (N, V) stats, broadcast into the scoring projection
    val stats = model.agg(sum("cnt").as("n_total"), count(lit(1)).as("v_size"))
    // left join: unseen tokens take the smoothed floor count of 0
    val scored = tokens(docs, idCol, textCol)
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        // ln((cnt+1)/(N+V)) quantized to 1e-4 as an exact integer —
        // the cross-token sum below is then order-independent. 1e-4
        // matches the Bm25 quantum (green across engines at two
        // scales); a finer quantum would multiply the odds of a
        // floor-boundary flip on a 1-ulp ln() divergence
        floor(log((coalesce(col("cnt"), lit(0L)) + lit(1L)) /
            (col("n_total") + col("v_size"))) * lit(10000.0))
          .cast("long").as("lp_q"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum("lp_q") / count(lit(1)) / lit(10000)).as("lp_avg"))
  }

  /** Self-scoring: train on the corpus and score the same corpus —
    * the single-corpus form (outlier docs score far below the bulk)
    * and the oracle-replayable query shape. */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(docs, idCol, textCol, train(docs, idCol, textCol))
}
