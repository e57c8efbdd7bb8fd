package graft.validate

import graft.SparkSpec

/** Mirrors compare_csv_and_db_error_desc semantics
  * (DM_bankfile_validate_pipeline.py:932): comma-split, whitespace-
  * normalized, per-key token-set comparison. */
class ErrorCompareSpec extends SparkSpec {
  import spark.implicits._

  test("matching sources produce empty diff despite spacing/split differences") {
    val csv = Seq(
      ("P1", "RoutingTransitNumber must be 9 digits, AccountNumber is required"),
      ("P2", "For OrgCode R,  all banking fields must be blank")).toDF("payee", "desc")
    val db = Seq(
      ("P1", "AccountNumber is required"),
      ("P1", "RoutingTransitNumber  must be 9 digits"),
      ("P2", "For OrgCode R, all banking fields must be blank")).toDF("pid", "err")
    val d = ErrorCompare.diff(csv, "payee", "desc", db, "pid", "err")
    assert(d.count() == 0)
  }

  test("missing tokens and missing keys surface on the correct side") {
    val csv = Seq(("P1", "rule A, rule B"), ("P3", "rule C")).toDF("payee", "desc")
    val db = Seq(("P1", "rule A"), ("P2", "rule D")).toDF("pid", "err")
    val rows = ErrorCompare.diff(csv, "payee", "desc", db, "pid", "err")
      .as[(String, String, Boolean, Boolean)].collect().toSet
    assert(rows == Set(
      ("P1", "rule B", true, false),
      ("P3", "rule C", true, false),
      ("P2", "rule D", false, true)))
  }

  test("tokens deduplicate within a key") {
    val csv = Seq(("P1", "rule A, rule A"), ("P1", "rule A")).toDF("payee", "desc")
    val db = Seq(("P1", "rule A")).toDF("pid", "err")
    assert(ErrorCompare.diff(csv, "payee", "desc", db, "pid", "err").count() == 0)
  }
}
