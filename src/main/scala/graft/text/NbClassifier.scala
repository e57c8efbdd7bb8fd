package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable binary Naive-Bayes text classifier — the distributed
  * form of the "train a quality/language filter on a labeled seed
  * set, apply it at corpus scale" move that LLM data pipelines run as
  * a fastText linear classifier (CCNet's language filter, the
  * LLaMA-style "pages Wikipedia would cite" quality gate). A
  * bag-of-tokens NB model IS a linear classifier over token-count
  * features (the log-likelihood-ratio weights), and unlike SGD
  * training it fits in exactly two counting aggregates — the shape
  * Spark executes perfectly at any corpus size.
  *
  * 100 TB shape: training is one token groupBy with map-side partial
  * counts (only (token, cnt_pos, cnt_neg) triples shuffle — the
  * Zipf-small distinct vocabulary, not the corpus); scoring joins doc
  * postings to the model ON TOKEN (plain shuffled equi-join, no
  * broadcast assumption — vocabularies can be millions of rows) and
  * aggregates per doc with map-side partials. The 1-row stats frame
  * broadcasts. No driver-side model, no collect.
  *
  * Cross-engine determinism (same discipline as [[UnigramLm]] /
  * [[Bm25]]): each class's per-token log-prob is floor-quantized to
  * an INTEGER 1e-4 before the subtraction and the per-doc sum, so the
  * sum is associative and an external engine replays the logit — and
  * the keep decision — bit-for-bit.
  */
object NbClassifier {

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)

  /** Train on `docs` where `labelCol` is a boolean column: the model
    * is `(token, cnt_pos, cnt_neg)` token-occurrence counts per class
    * (every token seen in either class gets a row; the absent class
    * counts 0). The label rides the tokenizing projection, so the
    * only shuffle is the vocabulary groupBy. */
  def train(docs: DataFrame, textCol: String, labelCol: String): DataFrame =
    docs.select(col(labelCol).cast("boolean").as("_y"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token")
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("cnt_neg"))

  /** Per-document class log-likelihood ratio under `model` plus the
    * doc-count prior from `priors` (a 1-row frame `(n_pos_docs,
    * n_neg_docs)`): Laplace-smoothed p(t|c) = (cnt_c(t)+1)/(N_c+V)
    * with V = model vocabulary size; unseen tokens take cnt 0 in both
    * classes. Output `(doc_id, n_tokens, logit, pred)`; docs with no
    * tokens are omitted (no defined likelihood). `logit > 0` ⇒ the
    * positive class is more likely. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, priors: DataFrame): DataFrame = {
    val stats = model.agg(sum("cnt_pos").as("n_pos"), sum("cnt_neg").as("n_neg"),
        count(lit(1)).as("v_size"))
      .crossJoin(priors)
      // quantized prior log-odds, added once per doc
      .select(col("n_pos"), col("n_neg"), col("v_size"),
        floor(log(col("n_pos_docs").cast("double") / col("n_neg_docs")) * 10000.0)
          .cast("long").as("prior_q"))
    def lpQ(cnt: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      floor(log((coalesce(cnt, lit(0L)) + lit(1L)) / (n + col("v_size")))
        * lit(10000.0)).cast("long")
    val scored = tokens(docs, idCol, textCol)
      .join(model, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("prior_q"),
        (lpQ(col("cnt_pos"), col("n_pos")) - lpQ(col("cnt_neg"), col("n_neg")))
          .as("llr_q"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        ((sum("llr_q") + first("prior_q")) / lit(10000.0)).as("logit"))
      .withColumn("pred", col("logit") > 0.0)
  }

  /** Persist a trained model: token class counts under `path`/model,
    * the 1-row doc-count priors under `path`/priors — the same
    * "model is a small table" convention as the IVF centroids
    * ([[graft.ops.Ann.saveCentroids]]). */
  def saveModel(model: DataFrame, priors: DataFrame, path: String): Unit = {
    model.write.mode("overwrite").parquet(s"$path/model")
    priors.write.mode("overwrite").parquet(s"$path/priors")
  }

  /** Load a model persisted by [[saveModel]]: (model, priors). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/model"), spark.read.parquet(s"$path/priors"))

  /** Train on labeled `docs` and persist: convenience for the
    * offline-fit half of the "fit on seed set, apply on ingest"
    * split ([[graft.streaming.RecipeIngest]]'s classifier stage). */
  def trainAndSave(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String, path: String): Unit = {
    val priors = docs.select(col(labelCol).cast("boolean").as("_y"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos_docs"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("n_neg_docs"))
    saveModel(train(docs, textCol, labelCol), priors, path)
  }

  /** Train on the labeled corpus and score the SAME corpus — the
    * seed-set self-fit (resubstitution) form and the
    * oracle-replayable query shape. */
  def scoreSelf(docs: DataFrame, idCol: String, textCol: String,
                labelCol: String): DataFrame = {
    val y = docs.select(col(labelCol).cast("boolean").as("_y"))
    val priors = y.agg(sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos_docs"),
      sum(when(!col("_y"), 1L).otherwise(0L)).as("n_neg_docs"))
    score(docs, idCol, textCol, train(docs, textCol, labelCol), priors)
  }
}
