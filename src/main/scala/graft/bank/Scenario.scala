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
}
