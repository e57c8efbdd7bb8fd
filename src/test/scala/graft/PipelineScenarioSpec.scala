package graft

import graft.bank.{BankDataGen, BankRules}
import graft.ops.Dedup
import graft.schema.SchemaCheck
import graft.sources.Sources
import graft.validate.{ErrorCompare, Validator}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end replay of the reference's file-drop validation scenario
  * (DM_bankfile_validate_pipeline.py run_test_scenario /
  * run_invalid_values_scenario): generate a feed, inject invalid
  * values, land it as parquet, schema-gate it, validate, split, emit
  * the error file, reconcile error sources, and archive the valid
  * slice partitioned — the whole loop the Glue job + harness perform,
  * as one Spark pipeline.
  */
class PipelineScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("full drop-validate-route scenario") {
    val dir = Files.createTempDirectory("graft-scenario").toString

    // 1. generate + inject invalids (reference --invalid-values)
    val feed = BankDataGen.withInvalid(
      BankDataGen.withInvalid(
        BankDataGen.generate(spark, 200, seed = 99),
        "RoutingTransitNumber", "12345ABCD", Seq(3L, 4L)),
      "State", "C1", Seq(5L))
    val dropPath = s"$dir/mtf_dmbankdata.parquet"
    feed.drop("id").write.parquet(dropPath)

    // 2. extension + schema gate (metadata only)
    assert(Sources.extensionOf(dropPath) == "parquet")
    val read = Sources.read(spark, dropPath, bank.BankSchema.schema) match {
      case Sources.Ok(df) => df
      case Sources.SchemaDrift(df, r) => fail(s"unexpected drift: ${r.issues}")
      case Sources.BadExtension(_, e) => fail(s"unexpected extension $e")
    }

    // 3. validate + split (the Glue job's valid/error routing)
    val (valid, invalid) = Validator.split(read, BankRules.all)
    val nValid = valid.count(); val nInvalid = invalid.count()
    assert(nValid + nInvalid == 200)
    assert(nInvalid == 3) // exactly the injected rows

    // 4. error file (FILENAME|PayeeId|ERROR_DESC)
    val errorFile = Validator.errorFile(read, BankRules.all, "PayeeID", "mtf_dmbankdata")
    val errs = errorFile.as[(String, String, String)].collect()
    assert(errs.length == 3)
    assert(errs.count(_._3.contains("RoutingTransitNumber must be 9 digits")) == 2)
    assert(errs.count(_._3.contains("State must be a 2-letter uppercase code")) == 1)

    // 5. error-source reconciliation (CSV-vs-DB): identical sources agree
    assert(ErrorCompare.diff(errorFile, "PayeeId", "ERROR_DESC",
      errorFile, "PayeeId", "ERROR_DESC").count() == 0)

    // 6. no duplicate business keys in the feed
    assert(Dedup.duplicateKeys(read, Seq("PayeeID")).count() == 0)

    // 7. archive valid slice partitioned by org code
    Sources.writePartitioned(valid, s"$dir/archive", Seq("OrganizationCode"))
    assert(spark.read.parquet(s"$dir/archive").count() == nValid)
  }

  test("composite transform scenario: rename + drop + invalid values, one merged report") {
    // mirrors run_composite_transform_scenario
    // (DM_bankfile_validate_pipeline.py:2510): rename first, then
    // drop, then inject — one pass, one report
    val base = BankDataGen.generate(spark, 100, seed = 21)
    val expected = base.schema
    val report = graft.bank.Scenario.compositeTransform(
      base,
      renames = Seq("OrganizationName" -> "OrgName"),
      dropColumns = Seq("ContactFax"),
      invalid = Seq(
        ("RoutingTransitNumber", "12345ABCD", 0L until 10L),
        ("State", "C1", 10L until 20L)),
      expected = expected,
      rules = BankRules.all,
      keyCol = "PayeeID",
      fileName = "composite")

    // schema side: the rename is detected as a rename (same type
    // missing+extra pair), the drop as missing
    assert(report.schema.renamed.exists(r =>
      r.column == "OrganizationName" && r.renamedTo == "OrgName"))
    assert(report.schema.missing.exists(_.column == "ContactFax"))

    // rule side: rules over transformed-away columns are skipped and
    // REPORTED; everything else still validates
    assert(report.skippedRules.toSet ==
      Set("OrganizationName.required", "OrganizationName.maxLength",
        "OrganizationName.charset", "ContactFax.maxLength", "ContactFax.format"))
    assert(report.appliedRules.size == BankRules.all.rules.size - 5)

    // row side: both injections surface in the merged error file
    val errs = report.errorFile.collect()
    assert(errs.length >= 20)
    val descs = errs.map(r => r.getString(1) -> r.getString(2)).toMap
    assert(descs.values.exists(_.contains("RoutingTransitNumber must be 9 digits")))
    assert(descs.values.exists(_.contains("State must be a 2-letter uppercase code")))
    val summary = report.summary.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary("RoutingTransitNumber.format") == 10L)
    assert(summary("State.format") == 10L)
    assert(!summary.contains("ContactFax.format"))
  }

  test("run report aggregates a mixed composite run into one frame") {
    import graft.bank.Scenario
    import graft.bank.Scenario.ScenarioSpec
    // seed 99 generates an inherently clean feed (pinned by the full
    // scenario test above) so error counts are exactly the injections
    val base = BankDataGen.generate(spark, 100, seed = 99)
    def scenario(invalidIds: Seq[Long]) = () => Scenario.compositeTransform(
      base, renames = Nil, dropColumns = Nil,
      // withInvalid treats an empty id list as "all rows", so a clean
      // scenario must inject NOTHING rather than inject-into-none
      invalid = if (invalidIds.isEmpty) Nil
                else Seq(("RoutingTransitNumber", "12345ABCD", invalidIds)),
      expected = base.schema, rules = BankRules.all, keyCol = "PayeeID")

    val report = Scenario.runReport(spark, Seq(
      // pass: observed errors match the declaration
      ScenarioSpec("clean_feed", scenario(Nil), expectedErrors = Some(0L)),
      // pass: 5 injected, 5 declared
      ScenarioSpec("five_bad_rows", scenario(0L until 5L), expectedErrors = Some(5L)),
      // fail: 5 injected but 2 declared
      ScenarioSpec("wrong_expectation", scenario(0L until 5L), expectedErrors = Some(2L)),
      // pass: no declaration → observational only
      ScenarioSpec("undeclared", scenario(0L until 3L)),
      // error: the scenario itself blows up
      ScenarioSpec("throws", () => sys.error("boom"))))

    val rows = report.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getLong(2), r.getInt(4), r.getInt(5))).toMap
    assert(rows("clean_feed")._1 == "pass" && rows("clean_feed")._2 == 0L)
    assert(rows("five_bad_rows")._1 == "pass" && rows("five_bad_rows")._2 == 5L)
    assert(rows("wrong_expectation")._1 == "fail" && rows("wrong_expectation")._2 == 5L)
    assert(rows("undeclared")._1 == "pass" && rows("undeclared")._2 == 3L)
    assert(rows("throws")._1 == "error" && rows("throws")._2 == -1L)
    val failure = report.where(col("scenario") === "throws")
      .select("failure").as[String].collect().head
    assert(failure.contains("boom"))
    // every applied rule count surfaces for the non-error scenarios
    assert(rows("five_bad_rows")._3 == BankRules.all.rules.size)
  }
}
