package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran"),
    (3L, "mat the on cat"), // same words, scrambled order
    (4L, "solo"),           // 1 token → no pairs → omitted
    (5L, "")                // blank → omitted
  ).toDF("doc_id", "text")

  private val lambda = 0.8

  // driver-side reference
  private def reference: Map[Long, (Long, Double)] = {
    val toks = Map(
      1L -> Seq("the", "cat", "sat", "on", "the", "mat"),
      2L -> Seq("the", "cat", "ran"),
      3L -> Seq("mat", "the", "on", "cat"))
    // doc 4's lone token forms no pairs but still trains the unigram
    val all = toks.values.flatten.toSeq :+ "solo"
    val uni = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (n, v) = (all.size.toLong, uni.size.toLong)
    val bi = toks.values.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    toks.map { case (id, ts) =>
      val qs = ts.zip(ts.tail).map { case (w1, w2) =>
        val ml = bi.get((w1, w2)).map(_.toDouble / uni(w1)).getOrElse(0.0)
        val lap = (uni.getOrElse(w2, 0L) + 1).toDouble / (n + v)
        math.floor(math.log(lambda * ml + (1 - lambda) * lap) * 10000).toLong
      }
      id -> ((qs.size.toLong, qs.sum.toDouble / qs.size / 10000))
    }
  }

  test("pairs explodes adjacent token pairs, short docs contribute nothing") {
    val got = BigramLm.pairs(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().toSet
    assert(got.contains((1L, "the", "cat")) && got.contains((1L, "the", "mat")))
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 5L))
    assert(got.count(_._1 == 1L) == 5)
  }

  test("scoreSelf matches the driver-side interpolated reference") {
    val got = BigramLm.scoreSelf(docs, "doc_id", "text", lambda)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    reference.foreach { case (id, (rn, rlp)) =>
      val (gn, glp) = got(id)
      assert(gn == rn && math.abs(glp - rlp) < 1e-12,
        s"doc $id: ($gn,$glp) vs ($rn,$rlp)")
    }
    // under self-scoring even the scrambled doc's own pairs are in the
    // model, but its order still scores below the canonical doc
    assert(got(3L)._2 < got(1L)._2)
  }

  test("unseen pairs back off to the smoothed unigram, never -inf") {
    val uni = BigramLm.trainUnigrams(docs, "doc_id", "text")
    val bi = BigramLm.trainBigrams(docs, "doc_id", "text", uni)
    val out = BigramLm.score(
      Seq((9L, "zzz qqq www")).toDF("doc_id", "text"),
      "doc_id", "text", bi, uni, lambda)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._2 == 2L)
    assert(!out.head._3.isNaN && !out.head._3.isInfinite && out.head._3 < 0)
  }

  test("scoring plan: two equi-joins, partial aggregation, no window") {
    val plan = BigramLm.scoreSelf(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected agg in:\n$plan")
    assert(!plan.contains("Window"), s"no window in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"), s"no cartesian in:\n$plan")
  }
}
