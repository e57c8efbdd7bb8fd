package graft.validate

import graft.SparkSpec

class SchemaInferSpec extends SparkSpec {
  import spark.implicits._

  test("suggests the narrowest type each column fully fits") {
    val feed = Seq(
      ("1", "1.5", "2020-01-02", "true", "abc", "7", null),
      ("22", "2", "2020-2-3", "FALSE", "9", "x", ""),
      ("-3", "-0.25", "1999-12-31", "true", "def", "8", null))
      .toDF("ints", "dbls", "dates", "bools", "mixed", "intish", "empty")
    val out = SchemaInfer.inferColumnTypes(feed)
      .select("column", "suggested").as[(String, String)].collect().toMap
    assert(out == Map(
      "ints" -> "bigint", "dbls" -> "double", "dates" -> "date",
      "bools" -> "boolean", "mixed" -> "string", "intish" -> "string",
      "empty" -> "string"), out)
  }

  test("bare 4-digit years never count as dates") {
    val feed = Seq(("1234"), ("2020"), ("1999")).toDF("yr")
    val row = SchemaInfer.inferColumnTypes(feed).collect()(0)
    assert(row.getAs[Long]("n_date") == 0L)
    assert(row.getAs[String]("suggested") == "bigint")
  }

  test("nulls and blanks are excluded from the fit requirement") {
    val feed = Seq(Some("5"), None, Some(" "), Some("6"))
      .map(v => Tuple1(v.orNull)).toDF("c")
    val row = SchemaInfer.inferColumnTypes(feed).collect()(0)
    assert(row.getAs[Long]("n_null") == 2L)
    assert(row.getAs[String]("suggested") == "bigint")
  }
}
