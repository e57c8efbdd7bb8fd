package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkipGramSpec extends SparkSpec {
  import spark.implicits._

  test("pairs: every within-window co-occurrence, both directions") {
    val got = SkipGram.pairs(Seq((1L, "a b c d")).toDF("id", "t"), "id", "t",
        window = 2)
      .select("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c"),
      ("a", "c"), ("c", "a"), ("b", "d"), ("d", "b"))
    assert(got.sorted.toSeq == expected.sorted)
    assert(got.length == expected.length) // multiplicity, not a set
  }

  test("a huge threshold disables subsampling: trainingPairs == pairs") {
    val df = Seq((1L, "x y z x y"), (2L, "p q r")).toDF("id", "t")
    val a = SkipGram.pairs(df, "id", "t", window = 2)
      .groupBy("center", "context").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val b = SkipGram.trainingPairs(df, "id", "t", window = 2, t = 1e9)
      .groupBy("center", "context").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("subsampling thins the hyper-frequent word and is deterministic") {
    // "the" is half the stream; content words are rare
    val docs = (1 to 200).map(i => (i.toLong, s"the w$i the v$i the u$i"))
      .toDF("id", "t")
    def pairCount(filter: String => Boolean): Long =
      SkipGram.trainingPairs(docs, "id", "t", window = 1, t = 1e-3)
        .where(col("center").isNotNull)
        .collect().count(r => filter(r.getString(1)))
    val withThe = pairCount(_ == "the")
    val full = SkipGram.pairs(docs, "id", "t", window = 1)
      .collect().count(_.getString(1) == "the")
    assert(withThe < full / 2, s"subsampled $withThe vs full $full")
    // determinism: same salt, same pairs
    val x = SkipGram.trainingPairs(docs, "id", "t", 1, 1e-3, salt = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    val y = SkipGram.trainingPairs(docs.repartition(13), "id", "t", 1, 1e-3, salt = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq.sorted
    assert(x == y)
  }

  test("pmi ranks a planted collocation above independent co-occurrence") {
    // "san francisco" always adjacent; "the" co-occurs with everything
    val docs = (1 to 50).map(i =>
      (i.toLong, s"the san francisco c$i trip the report d$i the end"))
      .toDF("id", "t")
    val pmi = SkipGram.pmi(SkipGram.pairs(docs, "id", "t", window = 1))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(pmi(("san", "francisco")) > pmi(("the", "san")))
    // hand check: pmi is symmetric for symmetric pair generation
    assert(pmi(("san", "francisco")) == pmi(("francisco", "san")))
  }

  test("weightedCooc: exact integer distance weights, adjacency outweighs distance") {
    val got = SkipGram.weightedCooc(Seq((1L, "a b c a")).toDF("id", "t"),
        "id", "t", window = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // pairs from "a b c a": offsets — (a,b)1 (b,c)1 (c,a)1 (a,c)2
    // (b,a)2 (a,a)3; scale = lcm(1..3) = 6
    assert(got(("a", "b")) == ((2L, 6L + 3L, 6L))) // adjacent + offset-2
    assert(got(("a", "a")) == ((2L, 2L + 2L, 6L))) // both directions of offset 3
    assert(got(("c", "a")) == ((2L, 6L + 3L, 6L)))
    // weighted signal: (a,b) at 9/6 outweighs (a,a) at 4/6 despite equal n
    assert(got(("a", "b"))._2 > got(("a", "a"))._2)
  }

  test("discarding from the stream widens effective windows (paper semantics)") {
    // every middle token is the hyper-frequent one; with window=1 the
    // (aN, bN) pair can ONLY appear when the middle was discarded
    val docs = (1 to 300).map(i => (i.toLong, s"a$i the b$i")) ++
      (1 to 300).flatMap(i => Seq((1000L + i, "the the the the")))
    val pairs = SkipGram.trainingPairs(docs.toDF("id", "t"), "id", "t",
        window = 1, t = 1e-4)
      .where(col("center").startsWith("a") && col("context").startsWith("b"))
      .count()
    assert(pairs > 0, "no widened-window pairs — stream semantics broken?")
  }
}
