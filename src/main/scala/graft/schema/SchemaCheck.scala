package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Schema-drift detection — the reference's missing-column / renamed-
  * column / extra-column upload scenarios
  * (/root/reference/DM_bankfile_validate_pipeline.py:2279 run_missing_
  * column_scenario, :2330 run_rename_column_scenario, save_to_formats
  * extra_columns at newaugsver_clean.py:526).
  *
  * Operates on `StructType` metadata only — zero data scan, so it is
  * free at any data size and should gate ingestion before the first
  * byte of a 100 TB read.
  */
object SchemaCheck {

  sealed trait Issue { def column: String }
  final case class MissingColumn(column: String, expectedType: String) extends Issue
  final case class ExtraColumn(column: String, actualType: String) extends Issue
  final case class TypeMismatch(column: String, expectedType: String, actualType: String) extends Issue
  /** An extra column whose type matches a missing one — the reference's
    * rename scenario presents exactly this signature. */
  final case class LikelyRenamed(column: String, renamedTo: String) extends Issue

  final case class Report(issues: Seq[Issue]) {
    def ok: Boolean = issues.isEmpty
    def missing: Seq[MissingColumn] = issues.collect { case i: MissingColumn => i }
    def extra: Seq[ExtraColumn] = issues.collect { case i: ExtraColumn => i }
    def mismatched: Seq[TypeMismatch] = issues.collect { case i: TypeMismatch => i }
    def renamed: Seq[LikelyRenamed] = issues.collect { case i: LikelyRenamed => i }
  }

  def check(expected: StructType, actual: StructType): Report = {
    val exp = expected.fields.map(f => f.name -> f).toMap
    val act = actual.fields.map(f => f.name -> f).toMap

    val missing = expected.fields.filterNot(f => act.contains(f.name))
    val extra = actual.fields.filterNot(f => exp.contains(f.name))

    // Pair up missing/extra columns with identical types as likely renames
    // (greedy by declaration order — matches the scenario's 1:1 renames).
    val renames = scala.collection.mutable.ListBuffer.empty[LikelyRenamed]
    var freeExtra = extra.toList
    val unrenamedMissing = missing.filter { m =>
      freeExtra.find(_.dataType == m.dataType) match {
        case Some(e) =>
          renames += LikelyRenamed(m.name, e.name)
          freeExtra = freeExtra.filterNot(_.name == e.name)
          false
        case None => true
      }
    }

    val mismatches = expected.fields.flatMap { f =>
      act.get(f.name).collect {
        case a if a.dataType != f.dataType =>
          TypeMismatch(f.name, f.dataType.simpleString, a.dataType.simpleString)
      }
    }

    Report(
      unrenamedMissing.map(f => MissingColumn(f.name, f.dataType.simpleString)).toSeq ++
      freeExtra.map(f => ExtraColumn(f.name, f.dataType.simpleString)).toSeq ++
      renames.toSeq ++ mismatches.toSeq)
  }

  def check(expected: StructType, df: DataFrame): Report = check(expected, df.schema)
}
