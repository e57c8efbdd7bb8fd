package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkSpec {

  // separable planted corpus: class tokens + shared filler
  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, s"good excellent fine filler$i the a of", true)
      else (i.toLong, s"bad awful poor filler$i the a of", false)
    }.toDF("doc_id", "text", "y")
  }

  test("separable data fits to 100% training accuracy") {
    val docs = corpus(40).cache()
    val model = LogReg.train(docs, "doc_id", "text", "y",
      dim = 1 << 14, epochs = 60, lr = 2.0)
    val scored = LogReg.score(docs, "doc_id", "text", model)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
    assert(scored.count() == 40)
    val wrong = scored.where(col("pred") =!= col("y")).count()
    assert(wrong == 0, s"$wrong misclassified")
    docs.unpersist()
  }

  test("training is bit-deterministic across runs") {
    val docs = corpus(20)
    val m1 = LogReg.train(docs, "doc_id", "text", "y",
      dim = 1 << 12, epochs = 10, lr = 1.0, l2 = 0.01)
    val m2 = LogReg.train(docs, "doc_id", "text", "y",
      dim = 1 << 12, epochs = 10, lr = 1.0, l2 = 0.01)
    assert(m1.biasQ == m2.biasQ)
    assert(m1.weightsQ.toSeq == m2.weightsQ.toSeq)
  }

  test("more epochs widen the decision margin on the training set") {
    val docs = corpus(20).cache()
    def meanAbsLogit(epochs: Int): Double =
      LogReg.score(docs, "doc_id", "text",
          LogReg.train(docs, "doc_id", "text", "y",
            dim = 1 << 12, epochs = epochs, lr = 1.0))
        .agg(avg(abs(col("logit")))).first().getDouble(0)
    assert(meanAbsLogit(30) > meanAbsLogit(3))
    docs.unpersist()
  }

  test("L2 shrinks weights toward zero") {
    val docs = corpus(20)
    def norm(l2: Double): Double =
      LogReg.train(docs, "doc_id", "text", "y",
          dim = 1 << 12, epochs = 20, lr = 1.0, l2 = l2)
        .weightsQ.iterator.map(w => (w / 1e9) * (w / 1e9)).sum
    assert(norm(0.5) < norm(0.0))
  }

  test("save/load round trip preserves scores exactly") {
    val docs = corpus(10)
    val model = LogReg.train(docs, "doc_id", "text", "y",
      dim = 1 << 12, epochs = 5, lr = 1.0)
    val path = java.nio.file.Files.createTempDirectory("lr").toString + "/model"
    LogReg.saveModel(spark, model, path)
    val back = LogReg.loadModel(spark, path)
    assert(back.dim == model.dim && back.biasQ == model.biasQ)
    assert(back.weightsQ.toSeq == model.weightsQ.toSeq)
  }

  test("docs with no features are omitted, not scored") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta", true), (2L, "   ", false))
      .toDF("doc_id", "text", "y")
    val model = LogReg.train(docs, "doc_id", "text", "y",
      dim = 256, epochs = 2, lr = 1.0)
    val ids = LogReg.score(docs, "doc_id", "text", model)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("generalizes: held-out docs with class tokens score correctly") {
    import spark.implicits._
    val model = LogReg.train(corpus(40), "doc_id", "text", "y",
      dim = 1 << 14, epochs = 60, lr = 2.0)
    val held = Seq((1000L, "good excellent quality prose here"),
        (1001L, "bad awful gibberish zzz"))
      .toDF("doc_id", "text")
    val preds = LogReg.score(held, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("pred")).toMap
    assert(preds(1000L) && !preds(1001L))
  }
}
