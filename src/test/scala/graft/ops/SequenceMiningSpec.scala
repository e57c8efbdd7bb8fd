package graft.ops

import graft.SparkSpec

class SequenceMiningSpec extends SparkSpec {
  import spark.implicits._

  // s1: a@1 b@2 c@3 | s2: b@1 a@2 c@3 | s3: a@1 c@2 b@3 a@4
  private def ev = Seq(
    ("s1", "a", 1L), ("s1", "b", 2L), ("s1", "c", 3L),
    ("s2", "b", 1L), ("s2", "a", 2L), ("s2", "c", 3L),
    ("s3", "a", 1L), ("s3", "c", 2L), ("s3", "b", 3L), ("s3", "a", 4L)
  ).toDF("sq", "it", "t")

  test("ordered pairs match hand enumeration, including repeats") {
    val p = SequenceMining.frequentPairs(ev, "sq", "it", "t", 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a→b: s1 (1<2), s3 (1<3) = 2; b→a: s2 (1<2), s3 (3<4) = 2
    // a→c: s1, s2, s3 = 3; c→a: s3 only (2<4) = 1
    // b→c: s1, s2 = 2; c→b: s3 = 1; a→a: s3 (two a's) = 1
    val exp = Map(("a","b") -> 2L, ("b","a") -> 2L, ("a","c") -> 3L,
      ("c","a") -> 1L, ("b","c") -> 2L, ("c","b") -> 1L, ("a","a") -> 1L)
    assert(p == exp, p.toString)
  }

  test("minSupport filters pairs") {
    val p = SequenceMining.frequentPairs(ev, "sq", "it", "t", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(p == Set(("a","b"), ("b","a"), ("a","c"), ("b","c")))
  }

  test("ordered triples: non-adjacent subsequences count; bounds trick is exact") {
    val t3 = SequenceMining.frequentTriples(ev, "sq", "it", "t", 1)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    // a→b→c: s1 only. b→a→c: s2 only. a→c→b: s3. a→c→a: s3. c→b→a: s3.
    assert(t3(("a","b","c")) == 1L)
    assert(t3(("b","a","c")) == 1L)
    assert(t3(("a","c","b")) == 1L)
    assert(t3(("a","c","a")) == 1L)
    assert(t3(("c","b","a")) == 1L)
    // never occurring: c→a→b (a after c only in s3 at t=4, no later b)
    assert(!t3.contains(("c","a","b")))
  }

  test("strict ordering: simultaneous events do not chain") {
    val tied = Seq(("s", "a", 5L), ("s", "b", 5L)).toDF("sq", "it", "t")
    assert(SequenceMining.frequentPairs(tied, "sq", "it", "t", 1)
      .count() == 0)
  }

  test("the middle event must lie strictly INSIDE the (a, c) bounds") {
    // a@1 b@1 c@2: b not after a (tie) → a→b→c absent even though
    // a→c holds
    val s = Seq(("s", "a", 1L), ("s", "b", 1L), ("s", "c", 2L))
      .toDF("sq", "it", "t")
    val t3 = SequenceMining.frequentTriples(s, "sq", "it", "t", 1)
      .collect()
    assert(!t3.exists(r => (r.getString(0), r.getString(1),
      r.getString(2)) == ("a", "b", "c")), t3.mkString(";"))
  }

  test("deterministic across partitionings") {
    val big = (1 to 500).map(i =>
      (s"s${i % 40}", s"e${i % 6}", (i * 7 % 97).toLong))
      .toDF("sq", "it", "t")
    def run(parts: Int) =
      SequenceMining.frequentTriples(big.repartition(parts),
        "sq", "it", "t", 5).orderBy("a", "b", "c").collect().toSeq
    assert(run(1) == run(7))
  }
}
