package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes — composed and decomposed "café" render
  // identically in source, which is exactly the bug class this
  // expression exists to fix
  private val Composed = "caf\u00e9"        // é = U+00E9
  private val Decomposed = "cafe\u0301"     // e + combining acute

  test("NFC unifies composed and decomposed spellings") {
    val df = Seq(("composed", Composed), ("decomposed", Decomposed)).toDF("kind", "s")
    val out = df.select(col("kind"),
        NormalizeText.normalize(col("s"), "NFC").as("n"))
      .as[(String, String)].collect().toMap
    assert(out("composed") === out("decomposed"))
    assert(out("composed") === Composed)
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    val out = Seq("ﬁle Ａ").toDF("s") // fi-ligature, fullwidth A
      .select(NormalizeText.normalize(col("s"), "NFKC"))
      .as[String].head()
    assert(out === "file A")
  }

  test("ASCII text passes through unchanged (fast path)") {
    val out = Seq("plain ascii text").toDF("s")
      .select(NormalizeText.normalize(col("s"), "NFC")).as[String].head()
    assert(out === "plain ascii text")
  }

  test("canonicalFingerprint equates composed/decomposed docs; fingerprint does not") {
    val df = Seq((1L, s"$Composed au lait"), (2L, s"$Decomposed au lait")).toDF("id", "text")
    val canon = df.select(graft.text.TextAnalysis.canonicalFingerprint(col("text")))
      .as[String].collect()
    assert(canon(0) === canon(1))
    val plain = df.select(graft.text.TextAnalysis.fingerprint(col("text")))
      .as[String].collect()
    assert(plain(0) !== plain(1))
  }

  test("invalid form and non-string input are analysis errors") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s").select(NormalizeText.normalize(col("s"), "NFX")).collect()
    }
    assert(e1.getMessage.contains("normalize_text"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").select(NormalizeText.normalize(col("v"), "NFC")).collect()
    }
    assert(e2.getMessage.contains("normalize_text"))
  }

  test("SQL registration: normalize_text with default and explicit form") {
    graft.GraftFunctions.register(spark)
    Seq(Decomposed).toDF("s").createOrReplaceTempView("nrm_in")
    val nfc = spark.sql("SELECT normalize_text(s) AS n FROM nrm_in").as[String].head()
    assert(nfc === Composed)
    val nfd = spark.sql(s"SELECT normalize_text(s, 'NFD') AS n FROM nrm_in").as[String].head()
    assert(nfd === Decomposed)
  }
}
