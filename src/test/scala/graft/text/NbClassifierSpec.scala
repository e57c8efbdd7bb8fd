package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two vocabularies with one shared token — separable but not trivial
  private def docs = Seq(
    (1L, "good fine great good", true),
    (2L, "good nice fine", true),
    (3L, "bad awful shared", false),
    (4L, "bad bad poor shared", false),
    (5L, "", true) // no tokens → omitted from scores
  ).toDF("doc_id", "text", "y")

  test("train counts tokens per class") {
    val m = NbClassifier.train(docs, "text", "y")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("good") == ((3L, 0L)))
    assert(m("bad") == ((0L, 3L)))
    assert(m("shared") == ((0L, 2L)))
    assert(m("fine") == ((2L, 0L)))
  }

  test("scoreSelf matches a driver-side quantized reference and separates the classes") {
    val toks = Map(
      1L -> Seq("good", "fine", "great", "good"),
      2L -> Seq("good", "nice", "fine"),
      3L -> Seq("bad", "awful", "shared"),
      4L -> Seq("bad", "bad", "poor", "shared"))
    val labels = Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
    val cntPos = toks.collect { case (id, ts) if labels(id) => ts }.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cntNeg = toks.collect { case (id, ts) if !labels(id) => ts }.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nPos = cntPos.values.sum
    val nNeg = cntNeg.values.sum
    val v = (cntPos.keySet ++ cntNeg.keySet).size.toLong
    // the blank doc carries no tokens but DOES count in the doc prior
    // (3 positive docs incl. the empty one, 2 negative)
    val priorQ = math.floor(math.log(3.0 / 2.0) * 10000).toLong
    def lpQ(c: Long, n: Long): Long =
      math.floor(math.log((c + 1).toDouble / (n + v)) * 10000).toLong
    def ref(id: Long): Double = {
      val s = toks(id).map(t =>
        lpQ(cntPos.getOrElse(t, 0L), nPos) - lpQ(cntNeg.getOrElse(t, 0L), nNeg)).sum
      (s + priorQ).toDouble / 10000
    }
    val got = NbClassifier.scoreSelf(docs, "doc_id", "text", "y")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L)) // blank doc omitted
    got.foreach { case (id, (nt, logit, pred)) =>
      assert(nt == toks(id).size.toLong, s"doc $id token count")
      assert(math.abs(logit - ref(id)) < 1e-12, s"doc $id: $logit vs ${ref(id)}")
      assert(pred == (logit > 0), s"doc $id pred")
    }
    // resubstitution on a separable corpus must classify perfectly
    assert(got(1L)._3 && got(2L)._3 && !got(3L)._3 && !got(4L)._3)
  }

  test("unseen tokens take the smoothed floor in both classes (llr contribution ~0)") {
    val priors = Seq((2L, 2L)).toDF("n_pos_docs", "n_neg_docs")
    val model = NbClassifier.train(docs, "text", "y")
    val out = NbClassifier.score(
      Seq((9L, "zzz qqq")).toDF("doc_id", "text"), "doc_id", "text", model, priors)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == 1 && out.head._2 == 2L)
    // both classes smooth to (0+1)/(N_c+V); N_pos=7, N_neg=7 here, so
    // the ratio is exactly 1 and the logit is exactly the prior (0)
    assert(out.head._3 == 0.0)
  }

  test("training and scoring aggregate with map-side partials (no window, no collect)") {
    val plan = NbClassifier.scoreSelf(docs, "doc_id", "text", "y")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregate in:\n$plan")
    assert(!plan.contains("Window"), s"no window expected in:\n$plan")
  }
}
