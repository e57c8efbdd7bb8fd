package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Equivalence pins: every StringCheck kernel must agree with the
  * regex/Column formulation it replaced, on randomized strings drawn
  * from an adversarial alphabet plus hand-picked edge cases. The old
  * formulations live HERE as the executable spec. */
class StringCheckSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99)
  // alphabet biased toward the edges of every class in play
  private val alphabet =
    "abcXZ019.-()_%+@x \t\n\f\r'&,/#é́π"
  private def randStr(maxLen: Int): String =
    Seq.fill(rnd.nextInt(maxLen + 1))(alphabet(rnd.nextInt(alphabet.length))).mkString

  private val edges = Seq(
    "", " ", "  ", "\t", "+", "x", "+x1", "1x", "1x2", "x2", "+1", "1x2x3",
    "12 34.56", "(555) 867-5309x42", "+1-800-FLOWERS",
    "a@b.co", "a@b.c", "a@b..co", "a@.co", "@b.co", "a@b.", "a@b.c2", "a@b-x.com",
    "a.b@c.d.ee", "a@b@c.dd", "café@x.com",
    "2024-02-29", "2023-02-29", "2024-02-30", "2024-13-01", "2024-00-10",
    "2024-01-00", "2024-1-01", "0000-01-01", "9999-12-31", "2024-04-31",
    "2024-06-31", "x024-01-01", "2024-01-011", "20240101")

  private def cases(n: Int, maxLen: Int): Seq[String] =
    edges ++ Seq.fill(n)(randStr(maxLen))

  private def compare(name: String, data: Seq[String],
                      kernel: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                      spec: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val df = data.toDF("s")
    val rows = df.select(col("s"), kernel(col("s")).as("k"), spec(col("s")).as("r"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getBoolean(1) == r.getBoolean(2)),
        s"$name mismatch on ${"\"" + r.getString(0) + "\""}: kernel=${r.get(1)} spec=${r.get(2)}")
    }
  }

  test("blank kernel == isNull || trim == ''") {
    val data = cases(2000, 6) :+ null
    val df = data.toDF("s")
    val rows = df.select(col("s"), StringCheck.check(col("s"), "blank").as("k"),
      (col("s").isNull || trim(col("s")) === "").as("r")).collect()
    rows.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), s"on ${r.get(0)}"))
  }

  // spec regexes use \A..\z (true end-of-input): Java's $ also matches
  // BEFORE a final newline, so the pre-kernel forms silently accepted a
  // trailing \n — a quirk DuckDB's RE2 oracle ($ = end of text) never
  // shared. The kernels implement the strict/RE2 semantics.

  test("allin kernel == regex char-class full match") {
    compare("digits", cases(3000, 8),
      StringCheck.check(_, "allin", "0123456789"),
      c => c.rlike("\\A[0-9]*\\z"))
    compare("alnum-extra", cases(3000, 8),
      StringCheck.check(_, "allin",
        ('A' to 'Z').mkString + ('a' to 'z').mkString + "0123456789-&.,'() "),
      c => c.rlike("\\A[A-Za-z0-9\\-&.,'() ]*\\z"))
  }

  test("namefmt kernel == ^[A-Za-z][A-Za-z.' -]*$") {
    compare("namefmt", cases(3000, 8),
      StringCheck.check(_, "namefmt",
        ('A' to 'Z').mkString + ('a' to 'z').mkString + ".' -"),
      c => c.rlike("\\A[A-Za-z][A-Za-z.' \\-]*\\z"))
  }

  test("phone kernel == phone regex") {
    compare("phone", cases(4000, 10),
      StringCheck.check(_, "phone"),
      c => c.rlike("\\A\\+?[0-9().\\-\\s]+(x[0-9]+)?\\z"))
  }

  test("email kernel == email regex") {
    compare("email", cases(4000, 12),
      StringCheck.check(_, "email"),
      c => c.rlike("\\A[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\z"))
  }

  test("ymd kernel == format regex + try_to_date") {
    // random digit-heavy strings shaped like dates plus the edge list
    val dateish = Seq.fill(3000) {
      f"${rnd.nextInt(10000)}%04d-${rnd.nextInt(15)}%02d-${rnd.nextInt(35)}%02d"
    }
    compare("ymd", edges ++ dateish ++ cases(1000, 12),
      StringCheck.check(_, "ymd"),
      c => c.rlike("\\A[0-9]{4}-[0-9]{2}-[0-9]{2}\\z") &&
        try_to_date(c, "yyyy-MM-dd").isNotNull)
  }
}
