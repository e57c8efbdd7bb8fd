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
}
