package graft.ops

import graft.SparkSpec

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private val diamond = Seq( // 1 -> {2,3} -> 4 -> 1 (cycle)
    (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 1L))

  test("every consecutive pair in every path is a real edge") {
    val edgeSet = diamond.map { case (a, b) => (a.toString, b.toString) }.toSet
    val paths = RandomWalks.walks(diamond.toDF("src", "dst"), 3, 6)
      .as[(String, Seq[String])].collect()
    assert(paths.nonEmpty)
    paths.foreach { case (_, p) =>
      p.sliding(2).foreach {
        case Seq(a, b) => assert(edgeSet.contains((a, b)), s"$a->$b in $p")
        case _ =>
      }
    }
  }

  test("full-length walks unless a dead end cuts them short") {
    val paths = RandomWalks.walks(diamond.toDF("src", "dst"), 2, 5)
      .as[(String, Seq[String])].collect()
    assert(paths.forall(_._2.length == 6), "cycle graph: no dead ends")
    val dead = RandomWalks.walks(Seq((1L, 2L)).toDF("src", "dst"), 1, 5)
      .as[(String, Seq[String])].collect()
    assert(dead.map(_._2).toSet == Set(Seq("1", "2")))
  }

  test("both branches of a fork are taken across enough walks") {
    val paths = RandomWalks.walks(diamond.toDF("src", "dst"), 16, 1)
      .as[(String, Seq[String])].collect()
      .filter(_._1.startsWith("1#")).map(_._2(1)).toSet
    assert(paths == Set("2", "3"), s"fork coverage: $paths")
  }

  test("deterministic across partitionings; seed changes the walks") {
    val df = diamond.toDF("src", "dst")
    val a = RandomWalks.walks(df.repartition(1), 4, 4, "s")
      .as[(String, Seq[String])].collect().toMap
    val b = RandomWalks.walks(df.repartition(5), 4, 4, "s")
      .as[(String, Seq[String])].collect().toMap
    assert(a == b)
    val c = RandomWalks.walks(df, 4, 4, "other")
      .as[(String, Seq[String])].collect().toMap
    assert(a != c)
  }
}
