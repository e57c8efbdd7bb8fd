package graft.ops

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("projection: both directions, no self-pairs, deduped") {
    val bi = Seq(("b1", "A"), ("b1", "B"), ("b1", "A"), // dup row
      ("b2", "A"), ("b2", "B"), // repeat pair in another basket
      ("b3", "C")).toDF("bk", "it")
    val e = Graphs.coOccurrence(bi, "bk", "it", maxBasket = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e == Set(("A", "B"), ("B", "A")))
  }

  test("maxBasket drops pathological baskets before the self-join") {
    val bi = (Seq(("big", s"x")) ++ (1 to 50).map(i => ("big", s"x$i")) ++
      Seq(("ok", "A"), ("ok", "B"))).toDF("bk", "it")
    val e = Graphs.coOccurrence(bi, "bk", "it", maxBasket = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e == Set(("A", "B"), ("B", "A")))
    // uncapped, the big basket contributes its full quadratic fan-out
    val full = Graphs.coOccurrence(bi, "bk", "it", maxBasket = 0).count()
    assert(full == 51L * 50 + 2)
  }

  test("capped and uncapped agree when every basket is under the cap") {
    val bi = (1 to 100).flatMap(b =>
      (0 until b % 4 + 1).map(i => (s"b$b", s"i${(b + i) % 9}")))
      .toDF("bk", "it")
    val a = Graphs.coOccurrence(bi, "bk", "it").orderBy("src", "dst")
      .collect().toSeq
    val b = Graphs.coOccurrence(bi, "bk", "it", maxBasket = 0)
      .orderBy("src", "dst").collect().toSeq
    assert(a == b)
  }
}
