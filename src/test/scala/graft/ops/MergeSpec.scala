package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  // dim: key, one attr; k=1 has history (a closed row + an open row)
  private def dim() = Merge.asScd2(
      Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "attr"), "2024-01-01")
    .union(Seq((1L, "a1", "2023-01-01", "2024-01-01", false))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current"))

  test("scd2: changed key closes old row and opens new one") {
    val out = Merge.scd2(dim(), Seq((1L, "a3")).toDF("k", "attr"),
      Seq("k"), Seq("attr"), "2025-06-01")
    val k1 = out.where($"k" === 1).orderBy("valid_from")
      .as[(Long, String, String, String, Boolean)].collect()
    assert(k1 === Seq(
      (1L, "a1", "2023-01-01", "2024-01-01", false), // history untouched
      (1L, "a2", "2024-01-01", "2025-06-01", false), // closed
      (1L, "a3", "2025-06-01", "9999-12-31", true))) // reopened
    // untouched keys pass through open
    assert(out.where($"k" === 2 && $"is_current").count() === 1)
    // 1 history + (closed + reopened) k1 + pass-through k2, k3
    assert(out.count() === 5)
  }

  test("scd2: attribute-identical update is a no-op; new key inserts") {
    val out = Merge.scd2(dim(),
      Seq((2L, "b"), (9L, "z")).toDF("k", "attr"),
      Seq("k"), Seq("attr"), "2025-06-01")
    assert(out.where($"k" === 2).count() === 1) // unchanged → no churn
    val k9 = out.where($"k" === 9)
      .as[(Long, String, String, String, Boolean)].collect()
    assert(k9 === Seq((9L, "z", "2025-06-01", "9999-12-31", true)))
    // 1 history + 3 pass-through + 1 insert
    assert(out.count() === 5)
  }

  test("scd2: duplicate update key fails fast instead of corrupting the dim") {
    val ex = intercept[Exception] {
      Merge.scd2(dim(), Seq((1L, "a3"), (1L, "a4")).toDF("k", "attr"),
        Seq("k"), Seq("attr"), "2025-06-01").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("compact to latest-per-key")))
  }

  test("scd2: null attribute drift is detected null-safely") {
    val out = Merge.scd2(dim(),
      Seq((3L, Option.empty[String])).toDF("k", "attr"),
      Seq("k"), Seq("attr"), "2025-06-01")
    val k3 = out.where($"k" === 3).orderBy("valid_from")
      .select("attr", "is_current").collect()
    assert(k3.map(r => (Option(r.getString(0)), r.getBoolean(1))).toSeq ===
      Seq((Some("c"), false), (None, true)))
  }
}
