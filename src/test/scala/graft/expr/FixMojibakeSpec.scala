package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  /** Corrupt like the accident does: UTF-8 bytes read as cp1252 (the
    * browser default Latin-1 really means). */
  private def corrupt(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), "windows-1252")

  test("single-round mojibake repairs to the original") {
    val originals = Seq(
      "die tür ist zu, große änderung",
      "el niño y el café",
      "russkij tekst: привет мир",
      "curly ’quotes’ and the € sign",
      "emoji survive too 😀")
    originals.foreach { o =>
      assert(FixMojibake.fix(corrupt(o)) == o, s"failed on: $o")
    }
  }

  test("double-encoded text repairs in two rounds") {
    val o = "tür café ärger"
    assert(FixMojibake.fix(corrupt(corrupt(o))) == o)
  }

  test("clean text — ASCII, real accents, CJK — passes through untouched") {
    val clean = Seq(
      "plain ascii text stays",
      "naïve café résumé",   // real accents, NOT mojibake
      "日本語のテキスト",
      "")
    clean.foreach(s => assert(FixMojibake.fix(s) == s, s"changed: $s"))
  }

  test("column + SQL surfaces, codegen span intact") {
    graft.GraftFunctions.register(spark)
    val df = Seq((1L, corrupt("tür")), (2L, "plain"), (3L, null))
      .toDF("id", "t")
    val rows = df.select(col("id"), FixMojibake.fixMojibake(col("t")).as("f"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "tür")
    assert(rows(1).getString(1) == "plain")
    assert(rows(2).isNullAt(1))
    df.createOrReplaceTempView("mj_in")
    assert(spark.sql("SELECT fix_mojibake(t) AS f FROM mj_in WHERE id = 1")
      .collect()(0).getString(0) == "tür")
    val plan = spark.range(3)
      .select(FixMojibake.fixMojibake(concat(lit("x"), col("id"))).as("f"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("a lone Latin-1 char that is not valid UTF-8 stays put") {
    // 'ä' alone: byte E4 is not a valid UTF-8 sequence — no repair
    assert(FixMojibake.fix("ä") == "ä")
    assert(FixMojibake.fix("80° fahrenheit — fine") == "80° fahrenheit — fine")
  }
}
