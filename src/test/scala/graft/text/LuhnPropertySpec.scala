package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check of the Luhn aggregate against an independent
  * plain-Scala reference over random digit strings (raw ScalaCheck
  * generators, seeded sampling — the scalatest/scalacheck bridge
  * isn't on the offline classpath). */
class LuhnPropertySpec extends SparkSpec {
  import spark.implicits._

  // independent implementation: classic reversed-digits formulation
  private def luhnRef(s: String): Boolean =
    s.length >= 13 && s.length <= 19 && {
      val sum = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
      sum % 10 == 0
    }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("luhnValid agrees with an independent reference on random digit runs") {
    val digits = Gen.choose(10, 22).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 9)).map(_.mkString))
    val cases = (1 to 400).map(i => sample(digits, i.toLong)) ++
      // force some valid numbers: fix the check digit of random bases
      (1 to 100).map { i =>
        val base = sample(Gen.listOfN(15, Gen.choose(0, 9)), 1000L + i).mkString
        val d = (0 to 9).find(d => luhnRef(base + d)).get
        base + d
      }
    val got = cases.toDF("d")
      .select(col("d"), TextAnalysis.luhnValid(col("d")).as("v"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach(c => assert(got(c) == luhnRef(c), s"luhn($c)"))
    // the constructed numbers really are valid (plant check)
    assert(cases.takeRight(100).forall(luhnRef))
  }
}
