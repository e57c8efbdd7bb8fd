package graft.rules

import graft.SparkSpec
import graft.validate.Validator
import org.apache.spark.sql.functions._

class RuleSpec extends SparkSpec {
  import spark.implicits._

  private val rules = RuleSet(Seq(
    Rule("name.required", Checks.required(col("name")), "name is required"),
    Rule("name.max", Checks.maxLength(col("name"), 5), "name too long"),
    Rule("kind.enum", Checks.inSet(col("kind"), Seq("A", "B")), "bad kind"),
    Rule("code.digits", Checks.digits(col("code"), 3), "code must be 3 digits"),
    Rule("code.condReq", Checks.required(col("code")), "code required for kind A")
      .onlyWhen(col("kind") === "A")))

  private def df = Seq(
    ("ok", "A", "123"),      // valid
    ("", "A", "123"),        // name blank
    ("toolong7", "B", "12"), // too long + bad digits
    ("x", "C", null),        // bad kind; code blank but kind!=A so ok
    ("y", "A", null)         // code required for A
  ).toDF("name", "kind", "code")

  test("errors column collects violated rule messages in order") {
    val v = Validator.validate(df, rules)
    val errs = v.select("errors").as[Seq[String]].collect()
    assert(errs(0) == Seq.empty)
    assert(errs(1) == Seq("name is required")) // code present, condReq ok
    assert(errs(2) == Seq("name too long", "code must be 3 digits"))
    assert(errs(3) == Seq("bad kind"))
    assert(errs(4) == Seq("code required for kind A"))
  }

  test("null and whitespace-only are both blank") {
    val d = Seq(("  ", "A", "123"), (null, "A", "123")).toDF("name", "kind", "code")
    val v = Validator.validate(d, rules)
    assert(v.where(!col("is_valid")).count() == 2)
  }

  test("split partitions rows exactly") {
    val (valid, invalid) = Validator.split(df, rules)
    assert(valid.count() == 1 && invalid.count() == 4)
    assert(valid.columns.toSeq == Seq("name", "kind", "code"))
  }

  test("summary counts violations per rule") {
    val s = Validator.summary(df, rules).as[(String, Long)].collect().toMap
    assert(s == Map(
      "name.required" -> 1L, "name.max" -> 1L, "kind.enum" -> 1L,
      "code.digits" -> 1L, "code.condReq" -> 1L))
  }

  test("errorFile emits reference-shaped rows") {
    val ef = Validator.errorFile(df, rules, "name", "file1")
      .as[(String, String, String)].collect()
    assert(ef.length == 4)
    assert(ef.forall(_._1 == "file1"))
    assert(ef.exists(r => r._3 == "name too long, code must be 3 digits"))
  }

  test("splitCounts matches split") {
    val counts = Validator.splitCounts(df, rules).as[(String, Long)].collect().toMap
    assert(counts == Map("invalid" -> 4L, "valid" -> 1L))
  }
}
