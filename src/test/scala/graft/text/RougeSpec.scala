package graft.text

import graft.SparkSpec

class RougeSpec extends SparkSpec {

  private def pairs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("pair_id", "ref", "cand")
  }

  private def one(n: Int, ref: String, cand: String): (Long, Long, Long) = {
    val r = Rouge.rougeN(pairs(Seq((1L, ref, cand))), "pair_id", "ref", "cand", n)
      .collect().head
    (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cand"), r.getAs[Long]("n_match"))
  }

  test("ROUGE-1: hand-computed clipped unigram overlap") {
    // ref counts {the:2,cat,sat,on,mat}; cand {the:2,cat,lay,on,mat}
    // match = 2+1+1+1 = 5
    assert(one(1, "the cat sat on the mat", "the cat lay on the mat") ==
      (6L, 6L, 5L))
  }

  test("ROUGE-2: hand-computed bigram overlap") {
    // shared bigrams: "the cat", "on the", "the mat"
    assert(one(2, "the cat sat on the mat", "the cat lay on the mat") ==
      (5L, 5L, 3L))
  }

  test("clipping: candidate repetition can't inflate the match") {
    assert(one(1, "a a a", "a a a a a") == (3L, 5L, 3L))
    assert(one(1, "a a a a a", "a a a") == (5L, 3L, 3L))
  }

  test("no overlap → n_match 0, not a missing row") {
    assert(one(1, "alpha beta", "gamma delta") == (2L, 2L, 0L))
  }

  test("texts shorter than n yield empty gram sets, zero counts") {
    assert(one(3, "two words", "also short") == (0L, 0L, 0L))
    assert(one(2, "", "  ") == (0L, 0L, 0L))
  }

  test("case and whitespace normalization matches tokenizer convention") {
    assert(one(1, "The  CAT", "the cat") == (2L, 2L, 2L))
  }

  test("many pairs keep independent counts") {
    val r = Rouge.rougeN(pairs(Seq(
        (1L, "x y z", "x y z"), (2L, "x y z", "p q r"))),
        "pair_id", "ref", "cand", 2)
      .collect().map(x => x.getAs[Long]("pair_id") ->
        (x.getAs[Long]("n_ref"), x.getAs[Long]("n_cand"), x.getAs[Long]("n_match"))).toMap
    assert(r(1L) == (2L, 2L, 2L) && r(2L) == (2L, 2L, 0L))
  }
}
