package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AbaChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def bad(values: Seq[String]): Map[String, Boolean] =
    values.toDF("rtn")
      .withColumn("bad", Checks.abaChecksum(col("rtn")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("real-world valid routing numbers pass") {
    // Federal Reserve Bank of Boston, Chase, BofA — public ABA numbers
    val m = bad(Seq("011000015", "021000021", "026009593"))
    assert(m.values.forall(_ == false), m)
  }

  test("single-digit typo fails the checksum") {
    val m = bad(Seq("011000016", "121000021", "021000012"))
    assert(m.values.forall(_ == true), m)
  }

  test("non-digit and wrong-length are flagged without ANSI cast errors") {
    val m = bad(Seq("01100001X", "12345678", "1234567890", "abcdefghi"))
    assert(m.values.forall(_ == true), m)
  }

  test("blank is not this rule's problem (requiredness is separate)") {
    val m = bad(Seq("", "   "))
    assert(m.values.forall(_ == false), m)
  }
}
