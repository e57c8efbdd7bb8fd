package graft.recipe

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Data-curation recipes as DATA — the LLM-pipeline sibling of
  * [[graft.rules.RuleSetConfig]]'s rules-live-in-config: a JSON
  * document declares an ordered stage list (gates, cleaners, dedup,
  * mixing, budgets, sampling) over a documents-shaped frame, and
  * [[RecipeConfig.run]] compiles it onto the exact operators the
  * hand-written pipelines use — same Catalyst plan, so a recipe
  * loaded from config reproduces a compiled pipeline bit-for-bit
  * (the q_recipe_config oracle gate pins that against
  * q_recipe_pipeline). A curator iterates on corpus composition
  * without a recompile; the recipe file IS the experiment record.
  *
  * Stage kinds (all preserve the (id, lang, text, ...) schema unless
  * noted): `gopherGate` (minWords/maxWords optional), `c4Clean`
  * (rewrites text), `qualityMin` {min}, `langAllow` {langs},
  * `minChars` {n}, `scrubPii`, `exactDedup` (canonical-fingerprint
  * keep-min-id), `hashSample` {rate, seed}, `mix` {weights,
  * replayable}, `tokenBudget` {budget} (adds n_tokens). Unknown kinds
  * fail loudly at parse time, not mid-run. */
final case class RecipeConfig(idCol: String, textCol: String,
    langCol: String, stages: Seq[RecipeStage]) {

  def run(docs: DataFrame): DataFrame =
    stages.foldLeft(docs)((df, s) => s(df, this))

  def toJson: String =
    JsonMethods.pretty(JsonMethods.render(RecipeConfig.toJValue(this)))
}

sealed trait RecipeStage {
  def apply(df: DataFrame, rc: RecipeConfig): DataFrame
}

object RecipeStage {
  final case class GopherGate(minWords: Int, maxWords: Int) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      df.where(TextAnalysis.gopherKeep(col(rc.textCol), minWords, maxWords))
  }
  final case class C4Clean() extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      graft.text.C4Filter.clean(df, rc.idCol, rc.textCol)
  }
  final case class QualityMin(min: Double) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      df.where(TextAnalysis.qualityScore(col(rc.textCol)) >= min)
  }
  final case class LangAllow(langs: Seq[String]) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      df.where(col(rc.langCol).isInCollection(langs))
  }
  final case class MinChars(n: Int) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      df.where(length(col(rc.textCol)) >= n)
  }
  final case class ScrubPii() extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      df.withColumn(rc.textCol, TextAnalysis.scrubPii(col(rc.textCol)))
  }
  final case class ExactDedup() extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame = {
      // same shape as the hand-written pipeline: fingerprint once,
      // pin it (feeds both join sides and any later stage's action),
      // keep the min-id representative. Lazy localCheckpoint, not
      // cache(): recipes are library calls that can never issue the
      // matching unpersist — ContextCleaner frees the blocks with the
      // frame (the PageRank r12 discipline).
      val fp = df.withColumn("_fp",
        TextAnalysis.canonicalFingerprint(col(rc.textCol)))
        .localCheckpoint(eager = false)
      val reps = fp.groupBy("_fp").agg(min(col(rc.idCol)).as(rc.idCol))
      fp.join(reps, Seq("_fp", rc.idCol)).drop("_fp")
    }
  }
  final case class HashSample(rate: Double, seed: String) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame = {
      val u = (conv(substring(md5(concat_ws(":", lit(seed),
        col(rc.idCol).cast("string"))), 1, 15), 16, 10).cast("long")
        % lit(1099511627776L)).cast("double") / lit(1099511627776.0)
      df.where(u < rate)
    }
  }
  final case class Mix(weights: Map[String, Double], replayable: Boolean)
      extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      graft.ops.Sampling.mix(df, rc.langCol, rc.idCol, weights,
        replayable = replayable)
  }
  final case class TokenBudget(budget: Long) extends RecipeStage {
    def apply(df: DataFrame, rc: RecipeConfig): DataFrame =
      graft.ops.Sampling.tokenBudget(
        df.withColumn("n_tokens", TextAnalysis.wsTokenCount(col(rc.textCol))),
        rc.langCol, rc.idCol, "n_tokens", budget)
  }
}

object RecipeConfig {
  import RecipeStage._

  def fromJson(json: String): RecipeConfig = {
    val o = JsonMethods.parse(json)
    def str(v: JValue, what: String): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"$what: $other")
    }
    def dbl(v: JValue, what: String): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(s"$what: $other")
    }
    def int(v: JValue, what: String, default: Option[Int] = None): Int =
      v match {
        case JInt(i) => i.toInt
        case JNothing if default.isDefined => default.get
        case other => throw new IllegalArgumentException(s"$what: $other")
      }
    val stages = o \ "stages" match {
      case JArray(xs) => xs.map { st =>
        str(st \ "kind", "stage kind") match {
          case "gopherGate" => GopherGate(
            int(st \ "minWords", "minWords", Some(30)),
            int(st \ "maxWords", "maxWords", Some(100000)))
          case "c4Clean" => C4Clean()
          case "qualityMin" => QualityMin(dbl(st \ "min", "min"))
          case "langAllow" => LangAllow(st \ "langs" match {
            case JArray(ls) => ls.map(str(_, "lang"))
            case other => throw new IllegalArgumentException(s"langs: $other")
          })
          case "minChars" => MinChars(int(st \ "n", "n"))
          case "scrubPii" => ScrubPii()
          case "exactDedup" => ExactDedup()
          case "hashSample" => HashSample(dbl(st \ "rate", "rate"),
            str(st \ "seed", "seed"))
          case "mix" => Mix(
            (st \ "weights" match {
              case JObject(fs) => fs.map { case (k, v) => k -> dbl(v, k) }.toMap
              case other => throw new IllegalArgumentException(s"weights: $other")
            }),
            st \ "replayable" match {
              case JBool(b) => b
              case JNothing => false
              case other => throw new IllegalArgumentException(s"replayable: $other")
            })
          case "tokenBudget" => TokenBudget(st \ "budget" match {
            case JInt(i) => i.toLong
            case other => throw new IllegalArgumentException(s"budget: $other")
          })
          case other =>
            throw new IllegalArgumentException(s"unknown stage kind: $other")
        }
      }
      case other =>
        throw new IllegalArgumentException(s"stages must be an array: $other")
    }
    RecipeConfig(
      o \ "idCol" match { case JString(s) => s; case _ => "doc_id" },
      o \ "textCol" match { case JString(s) => s; case _ => "text" },
      o \ "langCol" match { case JString(s) => s; case _ => "lang" },
      stages)
  }

  private[recipe] def toJValue(rc: RecipeConfig): JValue =
    JObject("idCol" -> JString(rc.idCol), "textCol" -> JString(rc.textCol),
      "langCol" -> JString(rc.langCol),
      "stages" -> JArray(rc.stages.map {
        case GopherGate(mn, mx) => JObject("kind" -> JString("gopherGate"),
          "minWords" -> JInt(mn), "maxWords" -> JInt(mx))
        case C4Clean() => JObject("kind" -> JString("c4Clean"))
        case QualityMin(m) => JObject("kind" -> JString("qualityMin"),
          "min" -> JDouble(m))
        case LangAllow(ls) => JObject("kind" -> JString("langAllow"),
          "langs" -> JArray(ls.map(JString(_)).toList))
        case MinChars(n) => JObject("kind" -> JString("minChars"),
          "n" -> JInt(n))
        case ScrubPii() => JObject("kind" -> JString("scrubPii"))
        case ExactDedup() => JObject("kind" -> JString("exactDedup"))
        case HashSample(r, s) => JObject("kind" -> JString("hashSample"),
          "rate" -> JDouble(r), "seed" -> JString(s))
        case Mix(w, rep) => JObject("kind" -> JString("mix"),
          "weights" -> JObject(w.toList.sortBy(_._1)
            .map { case (k, v) => k -> (JDouble(v): JValue) }),
          "replayable" -> JBool(rep))
        case TokenBudget(b) => JObject("kind" -> JString("tokenBudget"),
          "budget" -> JInt(b))
      }.toList))

  /** Load from a file path (local or any Hadoop-visible FS). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): RecipeConfig = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try fromJson(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }
}
