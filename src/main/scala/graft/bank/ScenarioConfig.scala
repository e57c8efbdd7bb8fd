package graft.bank

import graft.rules.RuleSetConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-driven composite scenarios — the loader that turns the
  * reference's scenario dicts (`run_composite_transform_scenario(
  * rename_specs, drop_columns, invalid_values, ...)`,
  * /root/reference/DM_bankfile_validate_pipeline.py:2510, :3113) into
  * [[Scenario.compositeTransform]] runs without writing Scala: a JSON
  * document declares named scenarios (renames, drops, injected invalid
  * values, expected error count) and optionally the rule set itself
  * ([[graft.rules.RuleSetConfig]] wire format), and
  * [[ScenarioConfig.runFromJson]] executes the whole suite into the
  * [[Scenario.runReport]] frame.
  *
  * Wire format:
  * {{{
  * { "rules": [ ... RuleSetConfig rules, optional ... ],
  *   "keyCol": "id",
  *   "scenarios": [
  *     { "name": "rename_payee",
  *       "renames": [{"from": "PayeeID", "to": "payee_id"}],
  *       "dropColumns": ["ContactFax"],
  *       "invalid": [{"col": "State", "value": "xx", "keys": [1, 5]}],
  *       "expectedErrors": 12 } ] }
  * }}}
  * All scenario fields except `name` default to empty/absent, matching
  * the reference drivers' optional kwargs.
  */
object ScenarioConfig {

  final case class InvalidSpec(col: String, value: String, keys: Seq[Long])
  final case class SpecDef(name: String,
                           renames: Seq[(String, String)] = Nil,
                           dropColumns: Seq[String] = Nil,
                           invalid: Seq[InvalidSpec] = Nil,
                           expectedErrors: Option[Long] = None)
  final case class Suite(rules: Option[RuleSetConfig],
                         keyCol: Option[String],
                         scenarios: Seq[SpecDef])

  private def str(v: JValue, f: String): String = v \ f match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"field $f: expected string, got $other")
  }

  def fromJson(json: String): Suite = {
    val o = JsonMethods.parse(json)
    val rules = o \ "rules" match {
      case JNothing => None
      case _ => Some(RuleSetConfig.fromJson(json)) // same document carries the rules array
    }
    val keyCol = o \ "keyCol" match { case JString(s) => Some(s); case _ => None }
    val scenarios = o \ "scenarios" match {
      case JArray(xs) => xs.map { s =>
        SpecDef(
          name = str(s, "name"),
          renames = s \ "renames" match {
            case JArray(rs) => rs.map(r => (str(r, "from"), str(r, "to")))
            case _ => Nil
          },
          dropColumns = s \ "dropColumns" match {
            case JArray(ds) => ds.map { case JString(d) => d
              case other => throw new IllegalArgumentException(s"dropColumns: $other") }
            case _ => Nil
          },
          invalid = s \ "invalid" match {
            case JArray(is) => is.map { i =>
              InvalidSpec(str(i, "col"), str(i, "value"),
                i \ "keys" match {
                  case JArray(ks) => ks.map { case JInt(k) => k.toLong
                    case JLong(k) => k
                    case other => throw new IllegalArgumentException(s"keys: $other") }
                  case _ => Nil
                })
            }
            case _ => Nil
          },
          expectedErrors = s \ "expectedErrors" match {
            case JInt(n) => Some(n.toLong); case JLong(n) => Some(n); case _ => None
          })
      }
      case other => throw new IllegalArgumentException(s"scenarios must be an array, got $other")
    }
    Suite(rules, keyCol, scenarios)
  }

  /** Bind one declared scenario to a concrete base frame + rule set —
    * the lazy [[Scenario.ScenarioSpec]] runReport consumes. */
  def toSpec(base: DataFrame, expected: StructType,
             rules: graft.rules.RuleSet, keyCol: String)
            (d: SpecDef): Scenario.ScenarioSpec =
    Scenario.ScenarioSpec(
      name = d.name,
      run = () => Scenario.compositeTransform(
        base, d.renames, d.dropColumns,
        d.invalid.map(i => (i.col, i.value, i.keys)),
        expected, rules, keyCol, fileName = d.name),
      expectedErrors = d.expectedErrors)

  /** Execute a whole JSON-declared suite: rules come from the document
    * when present (the fully config-driven path), else from `fallback`.
    * Returns the [[Scenario.runReport]] frame. */
  def runFromJson(spark: SparkSession, json: String, base: DataFrame,
                  expected: StructType,
                  fallbackRules: Option[graft.rules.RuleSet] = None,
                  fallbackKeyCol: Option[String] = None): DataFrame = {
    val suite = fromJson(json)
    val rules = suite.rules.map(_.toRuleSet)
      .orElse(fallbackRules)
      .getOrElse(throw new IllegalArgumentException(
        "no rules: neither the document nor the caller supplied a rule set"))
    val keyCol = suite.keyCol.orElse(fallbackKeyCol)
      .getOrElse(throw new IllegalArgumentException("no keyCol in document or caller"))
    Scenario.runReport(spark,
      suite.scenarios.map(toSpec(base, expected, rules, keyCol)))
  }

  /** Load + run from a config file path (local or Hadoop-visible FS). */
  def runFromFile(spark: SparkSession, path: String, base: DataFrame,
                  expected: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    runFromJson(spark, json, base, expected)
  }
}
