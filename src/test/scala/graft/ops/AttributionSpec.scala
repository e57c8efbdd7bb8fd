package graft.ops

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, id, channel) touches; (user, ts, id) conversions
  private def run(touches: Seq[(Long, Long, Long, String)],
      convs: Seq[(Long, Long, Long)]): Map[String, (Long, Long, Long)] =
    Attribution.byChannel(touches.toDF("user", "ts", "id", "channel"),
        convs.toDF("user", "ts", "id"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("single path: first/last/linear split by hand") {
    // user 1: a@1, b@2, a@3 then conversion @10
    val r = run(
      Seq((1L, 1L, 101L, "a"), (1L, 2L, 102L, "b"), (1L, 3L, 103L, "a")),
      Seq((1L, 10L, 900L)))
    // linear: 1000000 div 3 = 333333 each, remainder 1 to last (a@3)
    assert(r("a") == ((1L, 1L, 333333L + 333333L + 1L)))
    assert(r("b") == ((0L, 0L, 333333L)))
    assert(r.values.map(_._3).sum == 1000000L)
  }

  test("previous conversion fences the path") {
    // touch t1@1 → conv c1@5; touch t2@7 → conv c2@9.
    // t1 must not earn credit for c2.
    val r = run(
      Seq((1L, 1L, 101L, "a"), (1L, 7L, 102L, "b")),
      Seq((1L, 5L, 900L), (1L, 9L, 901L)))
    assert(r("a") == ((1L, 1L, 1000000L)))
    assert(r("b") == ((1L, 1L, 1000000L)))
  }

  test("conversion with no touches earns nothing; boundary ties excluded") {
    // touch exactly AT the conversion instant is excluded (strict <),
    // touch exactly AT the previous conversion is excluded (strict >)
    val r = run(
      Seq((1L, 5L, 101L, "a"), (1L, 3L, 102L, "b")),
      Seq((1L, 3L, 900L), (1L, 5L, 901L)))
    assert(r.get("b").isEmpty) // b@3 == prev conv ts AND < nothing else
    assert(r.get("a").isEmpty) // a@5 == conv ts
  }

  test("micro-credits conserve mass per conversion for every n") {
    for (n <- 1 to 7) {
      val touches = (1 to n).map(i => (1L, i.toLong, 100L + i, s"c$i"))
      val r = run(touches, Seq((1L, 100L, 900L)))
      assert(r.values.map(_._3).sum == 1000000L, s"n=$n mass")
      assert(r.values.map(_._1).sum == 1L && r.values.map(_._2).sum == 1L)
    }
  }

  test("deterministic position order on ts ties via id") {
    // two touches at the same instant: id breaks the tie, so the
    // remainder lands on the higher id
    val r = run(Seq((1L, 1L, 101L, "a"), (1L, 1L, 102L, "b")),
      Seq((1L, 10L, 900L)))
    assert(r("a") == ((1L, 0L, 500000L)))
    assert(r("b") == ((0L, 1L, 500000L)))
  }

  test("users do not cross") {
    val r = run(Seq((1L, 1L, 101L, "a"), (2L, 1L, 102L, "b")),
      Seq((1L, 10L, 900L)))
    assert(r("a") == ((1L, 1L, 1000000L)) && r.get("b").isEmpty)
  }
}
