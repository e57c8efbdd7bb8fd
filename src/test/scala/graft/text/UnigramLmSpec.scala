package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "zx qq zx"),   // rare tokens → low log-prob
    (4L, "")            // no tokens → omitted from scores
  ).toDF("doc_id", "text")

  test("scoreSelf matches a driver-side Laplace-smoothed reference") {
    val toks = Map(
      1L -> Seq("the", "cat", "sat", "on", "the", "mat"),
      2L -> Seq("the", "dog", "sat"),
      3L -> Seq("zx", "qq", "zx"))
    val all = toks.values.flatten.toSeq
    val cnt = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (n, v) = (all.size.toLong, cnt.size.toLong)
    def ref(id: Long): (Long, Double) = {
      val qs = toks(id).map(t =>
        math.floor(math.log((cnt(t) + 1).toDouble / (n + v)) * 10000).toLong)
      (toks(id).size.toLong, qs.sum.toDouble / toks(id).size / 10000)
    }
    val got = UnigramLm.scoreSelf(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // blank doc omitted
    got.foreach { case (id, (nt, lp)) =>
      val (rn, rlp) = ref(id)
      assert(nt == rn && math.abs(lp - rlp) < 1e-12, s"doc $id: ($nt,$lp) vs ($rn,$rlp)")
    }
    // the rare-token doc must score strictly below the common-token docs
    assert(got(3L)._2 < got(1L)._2 && got(3L)._2 < got(2L)._2)
  }

  test("unseen tokens take the smoothed floor instead of NULLing out") {
    val model = UnigramLm.train(docs.where(col("doc_id") <= 2), "doc_id", "text")
    val out = UnigramLm.score(
      Seq((9L, "the unseen unseen")).toDF("doc_id", "text"),
      "doc_id", "text", model)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._2 == 3L)
    // unseen tokens contribute ln(1/(N+V)) — finite, more negative
    // than any seen token's probability
    assert(out.head._3 < 0 && !out.head._3.isNaN && !out.head._3.isInfinite)
  }

  test("training shuffles only (token, count) pairs — partial aggregation in plan") {
    val plan = UnigramLm.train(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregate in:\n$plan")
    // map-side partial before the exchange: two HashAggregate levels
    assert(plan.split("HashAggregate").length > 2, s"expected partial+final agg in:\n$plan")
  }
}
