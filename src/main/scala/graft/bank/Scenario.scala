package graft.bank

import graft.rules.{Rule, RuleSet}
import graft.schema.SchemaCheck
import graft.validate.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Composite transform scenario — the reference's
  * `run_composite_transform_scenario`
  * (/root/reference/DM_bankfile_validate_pipeline.py:2510): one run
  * applying, in the reference's order, renames → dropped columns →
  * injected invalid values, then producing a MERGED report: the
  * schema issues (renames detected as missing+extra type pairs,
  * drops as missing) AND the row-level error file/summary from the
  * rules that still apply.
  *
  * Rules referencing transformed-away columns are skipped by
  * inspecting each rule's referenced column set — validating what
  * remains validatable instead of failing analysis, exactly what an
  * ingest pipeline facing a drifted feed must do. The skipped names
  * are part of the report, so nothing is silently un-checked.
  */
object Scenario {

  final case class CompositeReport(
      schema: SchemaCheck.Report,
      appliedRules: Seq[String],
      skippedRules: Seq[String],
      errorFile: DataFrame,
      summary: DataFrame)

  /** A rule applies iff its violation expression analyzes against the
    * frame — the authoritative "does it reference only surviving
    * columns" test (metadata-only, no job; and robust to however the
    * Column API encodes attribute references). */
  private[bank] def applies(df: DataFrame, r: Rule): Boolean =
    scala.util.Try(df.select(r.violation).queryExecution.analyzed).isSuccess

  def compositeTransform(base: DataFrame,
                         renames: Seq[(String, String)],
                         dropColumns: Seq[String],
                         invalid: Seq[(String, String, Seq[Long])],
                         expected: StructType,
                         rules: RuleSet,
                         keyCol: String,
                         fileName: String = "composite"): CompositeReport = {
    // reference order: rename first (drops/injections may use either
    // name), then drop, then inject into surviving columns
    val renamed = renames.foldLeft(base) { case (d, (o, n)) => d.withColumnRenamed(o, n) }
    val dropped = renamed.drop(dropColumns: _*)
    val transformed = invalid.foldLeft(dropped) { case (d, (c, v, ids)) =>
      BankDataGen.withInvalid(d, c, v, ids)
    }
    require(transformed.columns.contains(keyCol),
      s"composite scenario: key column $keyCol was transformed away")

    val report = SchemaCheck.check(expected, transformed.schema)
    val (applicable, skipped) = rules.rules.partition(r => applies(transformed, r))
    val rs = RuleSet(applicable)
    CompositeReport(
      schema = report,
      appliedRules = applicable.map(_.name),
      skippedRules = skipped.map(_.name),
      errorFile = Validator.errorFile(transformed, rs, keyCol, fileName),
      summary = Validator.summary(transformed, rs))
  }

  /** One named scenario of a composite run: `run` produces its report
    * (thrown exceptions become status "error"), `expectedErrors`
    * (when declared) is the pass/fail assertion — the reference
    * checks each scenario's observed error count against an expected
    * one before uploading outcomes (run_sql_test.py's
    * expected-vs-db-count compare; the TestRail upload in
    * DM_bankfile_validate_pipeline.py's run_full_etl_pipeline). */
  final case class ScenarioSpec(name: String,
                                run: () => CompositeReport,
                                expectedErrors: Option[Long] = None)

  /** Run-level orchestration report — the Spark-native replacement
    * for the reference's result upload: one frame summarizing every
    * scenario of a composite run. Columns: scenario, status
    * ("pass" | "fail" | "error"), error_rows, expected_errors,
    * rules_applied, rules_skipped, schema_issues, failure (the
    * exception message for status "error", else null).
    *
    * status: "error" when the scenario threw; "fail" when
    * expectedErrors is declared and the observed error-row count
    * differs; "pass" otherwise. The frame is scenario-count-sized
    * (driver-trivial); each scenario's error count is one Spark job
    * against its error file. */
  def runReport(spark: org.apache.spark.sql.SparkSession,
                scenarios: Seq[ScenarioSpec]): DataFrame = {
    val rows = scenarios.map { s =>
      scala.util.Try {
        val rep = s.run()
        val errs = rep.errorFile.count()
        val status =
          if (s.expectedErrors.exists(_ != errs)) "fail" else "pass"
        (s.name, status, errs, s.expectedErrors,
          rep.appliedRules.size, rep.skippedRules.size,
          rep.schema.issues.size, Option.empty[String])
      }.recover { case e: Throwable =>
        (s.name, "error", -1L, s.expectedErrors, 0, 0, 0,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }.get
    }
    import spark.implicits._
    rows.toDF("scenario", "status", "error_rows", "expected_errors",
        "rules_applied", "rules_skipped", "schema_issues", "failure")
      .orderBy("scenario")
  }
}
