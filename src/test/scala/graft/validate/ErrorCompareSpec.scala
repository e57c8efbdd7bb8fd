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

  test("error CSV round-trips through the reference's pipe-delimited shape") {
    import graft.bank.{BankDataGen, BankRules}
    val dir = java.nio.file.Files.createTempDirectory("graft-errcsv").toString
    // cache() = plan barrier: without it CollapseProject inlines the
    // generator's trees into all ~68 rules (see bank_gen_validate)
    val feed = BankDataGen.withInvalid(
      BankDataGen.generate(spark, 200, seed = 7).cache(), "OrganizationTIN", "12",
      rowIds = (0L until 200L by 10L))
    val errors = Validator.errorFile(feed, BankRules.all, "PayeeID", "feed.csv")
    Validator.writeErrorCsv(errors, s"$dir/errors", singleFile = true)

    // on-disk shape: one part file, pipe header, commas survive unquoted
    val part = new java.io.File(s"$dir/errors").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(part.length === 1)
    val lines = scala.io.Source.fromFile(part.head).getLines().toSeq
    assert(lines.head === "FILENAME|PayeeId|ERROR_DESC")
    assert(lines.tail.forall(_.split('|').length === 3))

    // read-back compares clean against the in-memory error table
    val back = Validator.readErrorCsv(spark, s"$dir/errors")
    assert(ErrorCompare.diff(
      back, "PayeeId", "ERROR_DESC",
      errors, "PayeeId", "ERROR_DESC").isEmpty)
    assert(back.count() === errors.count() && errors.count() > 0)
  }

  test("tokens deduplicate within a key") {
    val csv = Seq(("P1", "rule A, rule A"), ("P1", "rule A")).toDF("payee", "desc")
    val db = Seq(("P1", "rule A")).toDF("pid", "err")
    assert(ErrorCompare.diff(csv, "payee", "desc", db, "pid", "err").count() == 0)
  }

  test("token-set compare with the DB side read over JDBC (embedded Derby)") {
    // the reference's actual workflow: error CSV vs a LIVE DATABASE
    // error table (get_error_count_from_db / run_sql_test.py) — here
    // the database is embedded Derby (in the Spark distribution) and
    // the DB side arrives through Sources.readJdbc
    val url = "jdbc:derby:memory:graft_errdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE errors (payee_id VARCHAR(20), error_desc VARCHAR(400))")
      val ins = conn.prepareStatement("INSERT INTO errors VALUES (?, ?)")
      for ((k, d) <- Seq(
          ("P1", "AccountNumber is required"),
          ("P1", "RoutingTransitNumber  must be 9 digits"),
          ("P2", "For OrgCode R, all banking fields must be blank"),
          ("P4", "rule only in db"))) {
        ins.setString(1, k); ins.setString(2, d); ins.executeUpdate()
      }
      val db = graft.sources.Sources.readJdbc(spark, url, "errors")
      assert(db.columns.toSeq == Seq("PAYEE_ID", "ERROR_DESC")) // Derby upcases
      val csv = Seq(
        ("P1", "RoutingTransitNumber must be 9 digits, AccountNumber is required"),
        ("P2", "For OrgCode R,  all banking fields must be blank")).toDF("payee", "desc")
      val rows = ErrorCompare.diff(csv, "payee", "desc", db, "PAYEE_ID", "ERROR_DESC")
        .as[(String, String, Boolean, Boolean)].collect().toSet
      assert(rows == Set(("P4", "rule only in db", false, true)))

      // pushdown subquery: the DATABASE filters before rows move
      val filtered = graft.sources.Sources.readJdbc(spark, url,
        "(SELECT * FROM errors WHERE payee_id = 'P1') e")
      assert(filtered.count() == 2)
    } finally {
      conn.close()
      // drop the in-memory db so reruns in one JVM start clean
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graft_errdb;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" by design
    }
  }
}
