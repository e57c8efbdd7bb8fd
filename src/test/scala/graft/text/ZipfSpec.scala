package graft.text

import graft.SparkSpec

class ZipfSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(freqs: Map[String, Int]): Seq[String] =
    Seq(freqs.toSeq.sortBy(_._1)
      .flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" "))

  private def expected(freqs: Seq[Long]): (Double, Double) = {
    // replicate the operator's integer-quantized OLS by hand
    val pts = freqs.sorted(Ordering[Long].reverse).zipWithIndex.map {
      case (f, i) =>
        (math.round(math.log((i + 1).toDouble) * 1000),
          math.round(math.log(f.toDouble) * 1000))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    (math.floor(slope * 1000000) / 1000000,
      math.floor((sy.toDouble - slope * sx.toDouble) / n.toDouble
        / 1000.0 * 1000000) / 1000000)
  }

  test("hand-built geometric corpus matches the replicated formula") {
    val freqs = Map("aa" -> 16, "bb" -> 8, "cc" -> 4, "dd" -> 2, "ee" -> 1)
    val got = Zipf.fit(corpus(freqs).toDF("text"), "text", k = 1000)
      .as[(Long, Double, Double)].collect().head
    val (slope, icpt) = expected(freqs.values.map(_.toLong).toSeq)
    assert(got._1 == 5L)
    assert(got._2 == slope, s"slope ${got._2} vs $slope")
    assert(got._3 == icpt, s"intercept ${got._3} vs $icpt")
  }

  test("a near-perfect power law fits slope ~ -1") {
    val freqs = (1 to 40).map(r => f"t$r%02d" -> (2000 / r)).toMap
    val got = Zipf.fit(corpus(freqs).toDF("text"), "text", 1000)
      .as[(Long, Double, Double)].collect().head
    assert(math.abs(got._2 + 1.0) < 0.05, s"slope ${got._2}")
  }

  test("k caps the fitted head and ties rank deterministically") {
    val freqs = Map("x" -> 9, "y" -> 9, "z" -> 3, "w" -> 1)
    val a = Zipf.fit(corpus(freqs).toDF("text"), "text", k = 3)
      .as[(Long, Double, Double)].collect().head
    assert(a._1 == 3L)
    val b = Zipf.fit(corpus(freqs).toDF("text").repartition(5), "text", 3)
      .as[(Long, Double, Double)].collect().head
    assert(a == b)
  }
}
