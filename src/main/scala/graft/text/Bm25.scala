package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a document corpus against a bag of query
  * terms (Robertson & Spärck Jones probabilistic retrieval; the
  * Okapi BM25 form with the standard k1/b length normalization) — the
  * corpus-search / relevance-filter operator of a training-data
  * pipeline ("keep documents relevant to these seed terms").
  *
  * 100 TB shape: the only full-corpus work is two narrow scans (one
  * aggregate for corpus stats, one tokenize+explode). Postings are
  * filtered to the query terms BEFORE any shuffle, so both groupBys
  * move |matching postings| rows, not the corpus; document frequency
  * and corpus stats are broadcast back. No driver-side data beyond
  * the (tiny) term list.
  */
object Bm25 {

  /** Per-(doc, term) quantized partial scores: `score_q` =
    * floor(score · 10⁴) as BIGINT. The integer partials are what make
    * [[rank]]'s cross-term sum exactly engine-replayable — integer
    * addition is associative, so no float-summation-order caveat
    * survives the quantization. Columns: doc_id, token, tf, df,
    * score_q. */
  private[graft] def scoreTermsQ(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // tokenization case-folds the text, so fold the query bag the same
    // way — a caller passing "Spark" must not silently match nothing
    val qTerms = terms.map(_.trim.toLowerCase).filter(_.nonEmpty).distinct
    require(qTerms.nonEmpty, "bm25: empty term list")
    val base = docs.select(col(idCol).as("doc_id"),
      trim(lower(col(textCol))).as("t"))
    // corpus stats: one aggregate pass, 1-row result, broadcast.
    // avgdl spelled sum/count (exact integer sum, one double division)
    // rather than avg(): engines disagree on avg's internal
    // accumulation order, exact-sum-then-divide is reproducible.
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(TextAnalysis.wsTokenCount(col("t"))).cast("double") /
        count(lit(1))).as("avgdl"))
    // postings: doc length rides along as a grouping key (functionally
    // dependent on doc_id) so no corpus-wide doc-length join is needed
    val tf = base
      .select(col("doc_id"), TextAnalysis.wsTokenCount(col("t")).as("dl"),
        explode(split(col("t"), "\\s+")).as("token"))
      .where(length(col("token")) > 0 && col("token").isInCollection(qTerms))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // arithmetic shape AND association mirror the DuckDB oracle exactly
    // (IEEE mul/div are not associative, so idf*(num/denom) vs
    // (idf*num)/denom can floor() differently at a 1e-4 boundary —
    // both sides spell ((idf * num) / denom) * 10000, left-to-right);
    // constants enter as doubles on both sides
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNum = col("tf") * lit(k1 + 1.0)
    val tfDenom =
      col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        floor(idf * tfNum / tfDenom * lit(10000.0)).cast("long").as("score_q"))
  }

  /** Per-(doc, term) BM25 partial scores — the engine-replayable form.
    * Columns: doc_id, token, tf, df, score (= score_q / 10⁴, one exact
    * double division of an integral value). */
  def scoreTerms(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreTermsQ(docs, idCol, textCol, terms, k1, b)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("score_q") / lit(10000)).as("score"))

  /** Summed BM25 per document, ranked. Sums the INTEGER partials and
    * divides once, so the result is independent of addition order and
    * replayable by any engine — the r6 float-sum caveat is gone. */
  def rank(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreTermsQ(docs, idCol, textCol, terms, k1, b)
      .groupBy("doc_id").agg((sum("score_q") / lit(10000)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)

  /** Best `n` documents for the term bag — the serving form. The
    * orderBy+limit plans as TakeOrderedAndProject (each task keeps its
    * local top-n, the driver merges k·tasks rows), so answering "top
    * 100 documents for these seed terms" never global-sorts the scored
    * corpus — the difference between shuffling every matching doc and
    * shuffling n per task at 100 TB. */
  def rankTopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], n: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rank(docs, idCol, textCol, terms, k1, b).limit(n)
}
