package graft.rules

import graft.SparkSpec
import graft.validate.Validator
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style checks (raw ScalaCheck generators, seeded sampling —
  * the scalatest/scalacheck bridge isn't on the offline classpath):
  * the column combinators must agree with plain-Scala reference
  * semantics on arbitrary inputs. Each trial evaluates a whole batch
  * in one DataFrame pass. */
class ChecksPropertySpec extends SparkSpec {
  import spark.implicits._

  private val weird = Gen.oneOf("", " ", "  \t ", "a", "Z9", "hello world",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "123456789", "12#456789", "nue",
    "line\nbreak", "trailing ", " leading")
  private val anyStr = Gen.oneOf(weird, Gen.alphaNumStr, Gen.asciiPrintableStr)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def evalCheck(values: Seq[String], mk: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Boolean] =
    values.toDF("v")
      .select(coalesce(mk(col("v")), lit(false)).as("r"))
      .as[Boolean].collect().toSeq

  // Spark's trim() strips SPACES only (not tabs/newlines) — the
  // reference model must match: blank ⇔ null or all-space.
  private def refBlank(s: String): Boolean = s == null || s.forall(_ == ' ')

  test("maxLength violation ⇔ present && len > n (20 seeded trials)") {
    for (t <- 1 to 20) {
      val vs = sample(Gen.listOfN(30, anyStr), t)
      val n = sample(Gen.choose(1, 20), t + 1000)
      val got = evalCheck(vs, c => Checks.maxLength(c, n))
      val want = vs.map(s => !refBlank(s) && s.length > n)
      assert(got == want, s"trial $t, n=$n, vs=$vs")
    }
  }

  test("digits violation ⇔ present && not exactly n digits (20 seeded trials)") {
    for (t <- 1 to 20) {
      val vs = sample(Gen.listOfN(30, anyStr), t * 31)
      val n = sample(Gen.choose(1, 12), t + 2000)
      val got = evalCheck(vs, c => Checks.digits(c, n))
      val want = vs.map(s =>
        !refBlank(s) && !(s.length == n && s.forall(ch => ch >= '0' && ch <= '9')))
      assert(got == want, s"trial $t, n=$n, vs=$vs")
    }
  }

  test("inSet violation ⇔ present && not member (20 seeded trials)") {
    for (t <- 1 to 20) {
      val vs = sample(Gen.listOfN(30, anyStr), t * 17)
      val set = sample(Gen.nonEmptyListOf(Gen.oneOf("A", "B", "EFT", "CHK", "x")), t + 3000)
      val got = evalCheck(vs, c => Checks.inSet(c, set))
      val want = vs.map(s => !refBlank(s) && !set.contains(s))
      assert(got == want, s"trial $t, set=$set, vs=$vs")
    }
  }

  test("RuleSet valid flag equals errors.isEmpty on arbitrary rows") {
    val rules = RuleSet(Seq(
      Rule("r1", Checks.maxLength(col("v"), 5), "too long"),
      Rule("r2", Checks.numeric(col("v")), "not numeric"),
      Rule("r3", Checks.required(col("v")), "required")))
    for (t <- 1 to 10) {
      val vs = sample(Gen.listOfN(40, anyStr), t * 7)
      val v = Validator.validate(vs.toDF("v"), rules)
        .select(col(Validator.ValidCol), size(col(Validator.ErrorsCol)) === 0)
        .as[(Boolean, Boolean)].collect()
      assert(v.forall { case (a, b) => a == b })
    }
  }
}
