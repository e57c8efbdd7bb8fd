package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable binary logistic regression over hashed bag-of-ngram
  * features — the fastText-shape quality/language classifier proper
  * (Joulin et al. 2016: a linear model over pooled n-gram features),
  * one rung past [[NbClassifier]]: NB weights are fixed by counting,
  * while LR FITS its weights to minimize log-loss, which is what lets
  * the corpus-curation classifiers (CCNet, the LLaMA "pages Wikipedia
  * would cite" gate) trade precision/recall on a validation split.
  *
  * Training is full-batch gradient descent with the model resident on
  * the DRIVER — the [[graft.ops.PageRank]]/[[BpeTrain]] loop shape:
  * per epoch, one Spark job computes the exact gradient (no sampling,
  * no per-row model updates, nothing sequential), and the driver folds
  * it into the `dim`-sized weight vector (a few MB — model data, like
  * IVF centroids). Features are x_b = cnt_b / n_feats (mean bag, the
  * fastText pooling), from [[Dsir.hashedFeatures]]'s unigram+bigram
  * hashing.
  *
  * Determinism: weights live in INTEGER 1e-9 units and every per-doc
  * gradient contribution is floor-quantized to the same units BEFORE
  * the per-bucket sum, so epoch gradients are order-independent
  * integer adds — training is bit-reproducible across runs,
  * partitionings and retries (the repo-wide quantize-before-sum
  * discipline applied to SGD).
  *
  * Scale shape per epoch: one scan of the cached feature frame
  * (pre-partitioned by doc_id, so the margin groupBy and both doc
  * joins are shuffle-free) + one bucket-bounded shuffle (≤ dim·tasks
  * partial rows) + a ≤ dim+1 row collect. Epochs are jobs, like
  * PageRank rounds. Scoring is one broadcast join + one groupBy.
  */
object LogReg {

  /** Driver-resident model: integer 1e-9-unit weights per bucket plus
    * intercept. `weightsQ(b)` is the weight of hash bucket b. */
  final case class LrModel(dim: Int, biasQ: Long, weightsQ: Array[Long]) {
    def weight(b: Int): Double = weightsQ(b) / 1e9
    def bias: Double = biasQ / 1e9
  }

  private def featurize(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, replayable: Boolean): DataFrame =
    Dsir.hashedFeatures(docs, idCol, textCol, dim, replayable)

  /** Non-zero weights as a (bucket, w_q) frame for joining. */
  private def weightsDf(spark: SparkSession, wQ: Array[Long]): DataFrame = {
    import spark.implicits._
    wQ.iterator.zipWithIndex.collect { case (w, b) if w != 0L => (b.toLong, w) }
      .toSeq.toDF("bucket", "w_q")
  }

  /** Fit by `epochs` rounds of full-batch GD with learning rate `lr`
    * and L2 strength `l2`. `labelCol` must be boolean-castable. Docs
    * with no features carry no gradient and are skipped (consistent
    * with [[NbClassifier.score]] omitting token-less docs). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, epochs: Int, lr: Double,
      l2: Double = 0.0, replayable: Boolean = false): LrModel = {
    require(dim > 0 && epochs > 0 && lr > 0, "dim, epochs, lr must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // one-time setup: features joined with (n_feats, y), CLUSTERED by
    // doc so each doc's rows are consecutive within one partition -
    // every epoch then reads this cached frame in a single zero-shuffle
    // pass. (The earlier per-epoch broadcast-join + bucket groupBy
    // shuffled up to dim*tasks partial rows per epoch; the dense kernel
    // below performs the same integer adds into one Long array per task
    // with a tasks-many-array driver fold - the MLlib treeAggregate
    // shape, and the reason a 1000-executor epoch moves dim*tasks
    // LONGS, never rows.)
    val feats = featurize(docs.select(col(idCol), col(textCol)),
        idCol, textCol, dim, replayable)
    val docMeta = feats.groupBy("doc_id").agg(sum("cnt").as("n_feats"))
      .join(docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("boolean").as("y")), "doc_id")
    val rows = feats.join(docMeta, "doc_id")
      .repartition(col("doc_id")).sortWithinPartitions("doc_id")
      .select(col("doc_id").cast("long"), col("bucket").cast("long"),
        col("cnt").cast("long"), col("n_feats").cast("long"), col("y"))
      .as[(Long, Long, Long, Long, Boolean)]
      .cache()
    val nDocs = rows.map(_._1).distinct().count()
    require(nDocs > 0, "no documents with features to train on")
    val wQ = new Array[Long](dim)
    var biasQ = 0L
    for (_ <- 0 until epochs) {
      val bcW = spark.sparkContext.broadcast(wQ)
      val bcBias = biasQ
      // one pass: per doc (consecutive rows) compute the margin from
      // the broadcast weights, then add the floor-quantized per-(doc,
      // bucket) gradient contributions into a dim+1 Long array (slot
      // dim = intercept). Arithmetic identical to the former SQL form:
      // r = sigma((biasQ + sum cnt*w / n)/1e9) - y; g_q = floor(r*cnt/n*1e9).
      val partials = rows.mapPartitions { it =>
        val w = bcW.value
        val g = new Array[Long](w.length + 1)
        val bufB = new scala.collection.mutable.ArrayBuffer[Int](64)
        val bufC = new scala.collection.mutable.ArrayBuffer[Long](64)
        var any = false
        def flush(nF: Long, y: Boolean): Unit = {
          var swc = 0L
          var i = 0
          while (i < bufB.length) { swc += bufC(i) * w(bufB(i)); i += 1 }
          val m = (bcBias.toDouble + swc.toDouble / nF) / 1e9
          val r = 1.0 / (1.0 + math.exp(-m)) - (if (y) 1.0 else 0.0)
          i = 0
          while (i < bufB.length) {
            g(bufB(i)) += math.floor(r * bufC(i) / nF * 1e9).toLong
            i += 1
          }
          g(w.length) += math.floor(r * 1e9).toLong
          bufB.clear(); bufC.clear()
        }
        var curDoc = 0L; var curN = 0L; var curY = false
        while (it.hasNext) {
          val (d, b, c, nF, y) = it.next()
          if (any && d != curDoc) flush(curN, curY)
          if (!any || d != curDoc) { curDoc = d; any = true }
          curN = nF; curY = y
          bufB += b.toInt; bufC += c
        }
        if (any) flush(curN, curY)
        Iterator.single(g)
      }.rdd.fold(new Array[Long](dim + 1)) { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      bcW.destroy()
      var b = 0
      while (b < dim) {
        val grad = partials(b).toDouble / 1e9 / nDocs + l2 * (wQ(b).toDouble / 1e9)
        wQ(b) -= math.round(lr * grad * 1e9)
        b += 1
      }
      biasQ -= math.round(lr * (partials(dim).toDouble / 1e9 / nDocs) * 1e9)
    }
    rows.unpersist()
    LrModel(dim, biasQ, wQ)
  }

  /** Score a corpus under a trained model:
    * (doc_id, n_feats, logit, pred) with `pred = logit > 0`. Docs with
    * no features are omitted. One broadcast join + one groupBy. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LrModel, replayable: Boolean = false): DataFrame = {
    val wDf = weightsDf(docs.sparkSession, model.weightsQ)
    featurize(docs.select(col(idCol), col(textCol)), idCol, textCol,
        model.dim, replayable)
      .join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_feats"),
        sum(col("cnt") * coalesce(col("w_q"), lit(0L))).as("_swc"))
      .select(col("doc_id"), col("n_feats"),
        ((lit(model.biasQ).cast("double")
          + col("_swc").cast("double") / col("n_feats")) / lit(1e9)).as("logit"))
      .withColumn("pred", col("logit") > 0.0)
  }

  /** Persist: non-zero (bucket, w_q) rows, bucket -1 = intercept,
    * bucket -2 = dim — the "model is a small table" convention
    * ([[graft.ops.Ann.saveCentroids]], [[NbClassifier.saveModel]]). */
  def saveModel(spark: SparkSession, model: LrModel, path: String): Unit = {
    import spark.implicits._
    val rows = (-2L, model.dim.toLong) +: (-1L, model.biasQ) +:
      model.weightsQ.iterator.zipWithIndex
        .collect { case (w, b) if w != 0L => (b.toLong, w) }.toSeq
    rows.toDF("bucket", "w_q").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[saveModel]]. */
  def loadModel(spark: SparkSession, path: String): LrModel = {
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w_q")).toMap
    val dim = rows(-2L).toInt
    val wQ = new Array[Long](dim)
    rows.foreach { case (b, w) => if (b >= 0) wQ(b.toInt) = w }
    LrModel(dim, rows(-1L), wQ)
  }
}
