package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOf(text: String): (String, Boolean) = {
    val r = C4Filter.clean(Seq((1L, text)).toDF("id", "t"), "id", "t").collect()(0)
    (r.getString(1), r.getBoolean(2))
  }

  test("keeps punctuated prose lines, drops labels and unterminated lines") {
    val (clean, _) = cleanOf(
      "Click here\n" +
      "This is a perfectly fine prose sentence.\n" +
      "a sentence without any terminal punctuation at all\n" +
      "Is this a long enough question to survive?\n" +
      "Short one.\n")
    assert(clean ==
      "This is a perfectly fine prose sentence.\n" +
      "Is this a long enough question to survive?")
  }

  test("javascript lines are dropped case-insensitively") {
    val (clean, _) = cleanOf(
      "Please enable JAVASCRIPT in your browser settings.\n" +
      "This sentence about scripts in general is fine.\n")
    assert(clean == "This sentence about scripts in general is fine.")
  }

  test("quote-terminated lines survive the punctuation rule") {
    val (clean, _) = cleanOf("He said the whole thing was \"finished\"\n")
    assert(clean == "He said the whole thing was \"finished\"")
  }

  test("page gate: lorem ipsum, braces, and too few sentences") {
    val good =
      "First real sentence with plenty of words here.\n" +
      "Second real sentence with plenty of words here.\n" +
      "Third real sentence with plenty of words here.\n"
    assert(cleanOf(good)._2)
    assert(!cleanOf(good.replace("Second real", "Some lorem ipsum"))._2)
    assert(!cleanOf(good.replace("Second real", "Code { brace }"))._2)
    // two sentences only
    assert(!cleanOf(good.linesIterator.take(2).mkString("\n"))._2)
  }

  test("minWords is the paper's 5 and is configurable") {
    val four = "only four words here.\n"
    assert(cleanOf(four)._1 == "")
    val r = C4Filter.clean(Seq((1L, four)).toDF("id", "t"), "id", "t",
      minWords = 4).collect()(0)
    assert(r.getString(1) == "only four words here.")
  }

  test("the whole operator is one narrow projection — no shuffle, no explode") {
    val df = C4Filter.clean(
      spark.range(10).selectExpr("id", "concat('w w w w w sentence ', id, '.') AS t"),
      "id", "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
