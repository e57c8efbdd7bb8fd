package graft.schema

import graft.bank.BankSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaCheckSpec extends AnyFunSuite {

  private val expected = BankSchema.schema

  test("identical schema passes") {
    assert(SchemaCheck.check(expected, expected).ok)
  }

  test("missing column detected (run_missing_column_scenario)") {
    val actual = StructType(expected.fields.filterNot(_.name == "AccountNumber"))
    val r = SchemaCheck.check(expected, actual)
    assert(r.missing.map(_.column) == Seq("AccountNumber"))
    assert(!r.ok)
  }

  test("extra column detected (save_to_formats extra_columns)") {
    val actual = StructType(expected.fields :+ StructField("Extra_col", IntegerType))
    val r = SchemaCheck.check(expected, actual)
    assert(r.extra.map(_.column) == Seq("Extra_col"))
  }

  test("rename detected as missing+extra same-type pair (run_rename_column_scenario)") {
    val actual = StructType(expected.fields.map(f =>
      if (f.name == "PayeeID") f.copy(name = "PayeeIdentifier") else f))
    val r = SchemaCheck.check(expected, actual)
    assert(r.renamed == Seq(SchemaCheck.LikelyRenamed("PayeeID", "PayeeIdentifier")))
    assert(r.missing.isEmpty && r.extra.isEmpty)
  }

  test("type drift detected") {
    val actual = StructType(expected.fields.map(f =>
      if (f.name == "PostalCode") f.copy(dataType = IntegerType) else f))
    val r = SchemaCheck.check(expected, actual)
    assert(r.mismatched.map(_.column) == Seq("PostalCode"))
  }
}
