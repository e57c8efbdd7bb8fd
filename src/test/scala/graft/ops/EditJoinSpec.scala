package graft.ops

import graft.SparkSpec

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val f = rows.filter(_._2.length >= k + 1)
    (for {
      (i1, s1) <- f; (i2, s2) <- f if i1 < i2
      d = lev(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    EditJoin.selfJoin(rows.toDF("id", "s"), "id", "s", k)
      .as[(Long, Long, Int)].collect().toSet

  test("matches brute force on a mutated-word corpus (k=1 and k=2)") {
    val seedWords = Seq("analytics", "analysis", "validator", "validation",
      "pipeline", "pipelines", "streaming", "stream", "sparkly", "sparse",
      "segment", "segments", "sequent", "sediment", "abcdefg", "abcdefgh")
    val rows = seedWords.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    for (k <- Seq(1, 2))
      assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("matches brute force under substitutions at segment boundaries") {
    // mutate a base string at every single position: every pair is
    // within ed 2 of the base; cross-pair distances stress all shifts
    val base = "abcdefghij"
    val rows = (0 until base.length).map { i =>
      (i.toLong, base.updated(i, 'X'))
    } :+ (99L, base)
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("insertions and deletions shift segments and are still found") {
    val rows = Seq(1L -> "abcdefghijkl", 2L -> "abcdefghijklmn",
      3L -> "bcdefghijkl", 4L -> "abXdefghijkl", 5L -> "zzzzzzzzzzzz")
    assert(run(rows, 2) == brute(rows, 2))
  }

  test("strings shorter than k+1 are excluded") {
    val rows = Seq(1L -> "ab", 2L -> "ab", 3L -> "abcd", 4L -> "abcd")
    val got = run(rows, 2)
    assert(got == Set((3L, 4L, 0)))
  }

  test("exact duplicates verify at distance 0") {
    val rows = Seq(1L -> "hello world", 2L -> "hello world",
      3L -> "hello worlD")
    assert(run(rows, 1) ==
      Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("deterministic across partitionings") {
    val rows = (1L to 60L).map(i => (i, s"prefix${i % 7}suffix${i % 3}"))
    val a = EditJoin.selfJoin(rows.toDF("id", "s").repartition(1),
      "id", "s", 2).as[(Long, Long, Int)].collect().toSet
    val b = EditJoin.selfJoin(rows.toDF("id", "s").repartition(9),
      "id", "s", 2).as[(Long, Long, Int)].collect().toSet
    assert(a == b)
  }
}
