package graft.ops

import graft.SparkSpec

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: b1{A,B,C} b2{A,B} b3{A,B,C} b4{B,C} b5{A,D}
  private def bi = Seq(
    ("b1", "A"), ("b1", "B"), ("b1", "C"),
    ("b2", "A"), ("b2", "B"),
    ("b3", "A"), ("b3", "B"), ("b3", "C"),
    ("b4", "B"), ("b4", "C"),
    ("b5", "A"), ("b5", "D")
  ).toDF("bk", "it")

  test("frequent pairs match the hand enumeration") {
    val p = Itemsets.frequentPairs(bi, "bk", "it", minSupport = 2)
      .orderBy("i1", "i2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p.toSeq == Seq(("A", "B", 3L), ("A", "C", 2L), ("B", "C", 3L)))
  }

  test("frequent triples: ABC at support 2, closure kills it at 3") {
    val t2 = Itemsets.frequentTriples(bi, "bk", "it", minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(t2.toSeq == Seq(("A", "B", "C", 2L)))
    val t3 = Itemsets.frequentTriples(bi, "bk", "it", minSupport = 3)
    assert(t3.count() == 0)
  }

  test("duplicate basket rows collapse; infrequent items pruned by L1") {
    val dup = bi.unionAll(Seq(("b1", "A"), ("b5", "D")).toDF("bk", "it"))
    val p = Itemsets.frequentPairs(dup, "bk", "it", minSupport = 2)
      .orderBy("i1", "i2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p.toSeq == Seq(("A", "B", 3L), ("A", "C", 2L), ("B", "C", 3L)))
    // D appears in one basket only: no pair with D even at minSupport 1
    val p1 = Itemsets.frequentPairs(bi, "bk", "it", minSupport = 1)
    assert(p1.where($"i1" === "D" || $"i2" === "D").count() == 1) // (A,D)
  }

  test("maxBasket drops oversized baskets entirely") {
    val p = Itemsets.frequentPairs(bi, "bk", "it", minSupport = 2,
      maxBasket = 2)
    // only the 2-item baskets b2{A,B}, b4{B,C}, b5{A,D} remain:
    // no pair reaches support 2
    assert(p.count() == 0)
    val p1 = Itemsets.frequentPairs(bi, "bk", "it", minSupport = 1,
        maxBasket = 2)
      .orderBy("i1", "i2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p1.toSeq == Seq(("A", "B", 1L), ("A", "D", 1L), ("B", "C", 1L)))
  }

  test("deterministic across partitionings") {
    val big = (1 to 300).flatMap(b =>
      (0 until (b % 5 + 1)).map(i => (s"b$b", s"i${(b + i) % 7}")))
      .toDF("bk", "it")
    def run(parts: Int) =
      Itemsets.frequentTriples(big.repartition(parts), "bk", "it", 3)
        .orderBy("i1", "i2", "i3").collect().toSeq
    assert(run(1) == run(7))
  }
}
