package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CodeTextSpec extends SparkSpec {
  import spark.implicits._

  private def one(md: String) =
    Seq((1L, md)).toDF("id", "t")

  test("codeFences extracts block contents in order, info string dropped") {
    val md = "intro\n```python\nprint(1)\n```\nmid\n```\nplain\nblock\n```\ntail"
    val blocks = one(md).select(CodeText.codeFences(col("t")).as("b"))
      .collect()(0).getSeq[String](0)
    assert(blocks == Seq("print(1)\n", "plain\nblock\n"))
  }

  test("stripCodeFences leaves prose with token boundaries intact") {
    val md = "before\n```js\nvar x = 1;\n```\nafter"
    val prose = one(md).select(CodeText.stripCodeFences(col("t")).as("p"))
      .collect()(0).getString(0)
    // the fence (including its closing marker) becomes one space; the
    // surrounding newlines belong to the prose and stay
    assert(prose == "before\n \nafter")
    assert(!prose.contains("var x"))
  }

  test("an unterminated fence swallows nothing") {
    val md = "prose\n```python\ndef f(): pass\nno closing fence here"
    val row = one(md).select(
      CodeText.codeFences(col("t")).as("b"),
      CodeText.stripCodeFences(col("t")).as("p")).collect()(0)
    assert(row.getSeq[String](0).isEmpty)
    assert(row.getString(1) == md)
  }

  test("codeFlags: counts, long lines, braces, comments, indentation") {
    val code = "// header comment\nfunction f() {\n    if (x) {\n" +
      "        return 1;\n    }\n" + ("x" * 130) + "\n}"
    val f = one(code).select(CodeText.codeFlags(col("t")).as("f"))
      .select("f.*").collect()(0)
    assert(f.getAs[Long]("n_lines") == 7L)
    assert(f.getAs[Long]("max_line_len") == 130L)
    assert(f.getAs[Double]("long_line_frac") == math.floor(1.0 / 7 * 1e6) / 1e6)
    assert(f.getAs[Long]("brace_delta") == 0L)
    assert(f.getAs[Double]("comment_frac") == math.floor(1.0 / 7 * 1e6) / 1e6)
    // 3 indented lines of 7
    assert(f.getAs[Double]("indent_frac") == math.floor(3.0 / 7 * 1e6) / 1e6)
  }

  test("truncated code shows a nonzero brace delta") {
    val f = one("class A {\n  void m() {\n    x();\n")
      .select(CodeText.codeFlags(col("t")).as("f")).select("f.*").collect()(0)
    assert(f.getAs[Long]("brace_delta") == 2L)
  }
}
