package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hashedFeatures: unigrams + adjacent bigrams, counts add") {
    val f = Dsir.hashedFeatures(df(Seq((1L, "a b a"))), "doc_id", "text",
      dim = 1 << 20, replayable = true)
    // feats: a, b, a, "a b", "b a" → 5 total, 4 distinct
    assert(f.agg(sum("cnt")).first().getLong(0) == 5L)
    assert(f.count() == 4)
  }

  test("single-token and empty docs don't trip the bigram sequence guard") {
    val f = Dsir.hashedFeatures(df(Seq((1L, "solo"), (2L, ""), (3L, "  "))),
      "doc_id", "text", dim = 64)
    val byDoc = f.groupBy("doc_id").agg(sum("cnt").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 1L)) // empty docs contribute no features
  }

  test("weights rank target-like docs above junk") {
    val target = df(Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick red fox runs over the lazy cat")))
    val raw = df(Seq(
      (1L, "the quick brown fox jumps high"), // target-like
      (2L, "zzz qqq xxx vvv kkk jjj"), // junk
      (3L, "the lazy dog and the lazy cat"))) // target-like
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
        dim = 1 << 16, replayable = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lw_q")).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(1L) > w(2L) && w(3L) > w(2L))
  }

  test("dim=1 collapses every feature to one bucket: lw_q = n_feats * lr") {
    val target = df(Seq((100L, "x y")))
    val raw = df(Seq((1L, "a b c"), (2L, "d e")))
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", dim = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_feats"), r.getAs[Long]("lw_q"))).sortBy(_._1)
    val Seq((_, n1, l1), (_, n2, l2)) = w.toSeq
    assert(n1 == 5 && n2 == 3)
    assert(l1 % n1 == 0 && l2 % n2 == 0 && l1 / n1 == l2 / n2)
  }

  test("resample: k rows, deterministic, and weight-biased") {
    val target = df((0L until 20L).map(i => (100L + i, "alpha beta gamma delta")))
    // junk features must be corpus-FREQUENT but target-absent: that is
    // the regime DSIR separates (lr ≈ -ln(cnt_r) per feature); rare
    // junk features are nearly neutral under Laplace smoothing
    val raw = df((0L until 40L).map { i =>
      if (i < 20) (i, "alpha beta gamma delta")
      else (i, "zork gronk blat frum nix")
    })
    val pick = Dsir.resample(raw, target, "doc_id", "text",
      dim = 1 << 16, k = 10, replayable = true)
    val ids = pick.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 10)
    // the Gumbel perturbation is ~O(1) nats; the planted weight gap is
    // much larger, so every pick is target-like
    assert(ids.forall(_ < 20), s"junk docs selected: ${ids.filter(_ >= 20)}")
    val again = Dsir.resample(raw, target, "doc_id", "text",
      dim = 1 << 16, k = 10, replayable = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("replayable and xxhash paths agree on weight ORDER (planted gap)") {
    val target = df(Seq((100L, "alpha beta alpha beta")))
    val raw = df(Seq((1L, "alpha beta"), (2L, "junk words here")))
    def topId(replayable: Boolean): Long =
      Dsir.importanceWeights(raw, target, "doc_id", "text", dim = 1 << 16,
          replayable = replayable)
        .orderBy(desc("lw_q")).first().getAs[Long]("doc_id")
    assert(topId(replayable = true) == 1L)
    assert(topId(replayable = false) == 1L)
  }
}
