package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick TF-IDF features: fixed-dimension sparse vectors with
  * no vocabulary table — each token maps to `hash(token) mod dim`, so
  * the feature space is bounded up front and never needs a fit step or
  * a driver-side dictionary (the classic scale-out property of feature
  * hashing; collisions simply add).
  *
  * Scale shape: tokenize + explode is narrow; tf aggregates map-side
  * per (doc, token); df derives FROM the tf frame; the one-row corpus
  * stats frame broadcasts. In the audited plan the df side re-runs the
  * scan + partial agg rather than reusing tf's exchange (AQE's
  * broadcast conversion of the small df frame defeats exchange reuse)
  * — an extra scan-bound pass, acceptable because scans parallelize
  * perfectly; callers featurizing a huge corpus repeatedly should
  * persist the tf frame and join df themselves. No driver collects, no
  * vocabulary table — at 100 TB the vocabulary can exceed driver
  * memory, which is exactly why the hashing trick exists.
  *
  * Weights are floor-quantized to integer 1e-4 partials BEFORE the
  * per-bucket collision sum, so the sum is order-independent and an
  * external engine replays it exactly (same trick as Bm25.rank).
  * Reference behavior: the TF-IDF featurization step of relevance /
  * quality scoring pipelines (sklearn HashingVectorizer semantics,
  * smooth idf = ln((1+N)/(1+df)) + 1).
  */
object TfIdf {

  /** Sparse hashed TF-IDF rows `(doc_id, bucket, w_q)` where
    * `w_q = Σ_tokens→bucket floor(tf · idf · 10⁴)` (integer partials).
    * `replayable = true` buckets via an md5 fold any engine can
    * recompute; the default xxhash64 is the cheaper production hash.
    */
  def hashedTfIdf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, replayable: Boolean = false): DataFrame = {
    require(dim > 0, s"dim $dim must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val bucket =
      if (replayable)
        conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long") % dim
      else pmod(xxhash64(col("token")), lit(dim.toLong))
    // smooth idf; association mirrors the oracle left-to-right
    val idf = log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), bucket.as("bucket"),
        floor(col("tf").cast("double") * idf * lit(10000.0)).cast("long").as("wq"))
      .groupBy("doc_id", "bucket").agg(sum("wq").as("w_q"))
  }
}
