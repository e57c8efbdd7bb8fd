package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: leave-one-out mean shrunk to the prior") {
    // cat a: targets 10, 20 (sum 30); cat b: 40. global prior = 70/3
    // m=2: te(a,10) = (30-10 + (70/3)*2) / (2-1+2) = (20 + 140/3)/3
    val df = Seq(("a", 10L), ("a", 20L), ("b", 40L)).toDF("c", "y")
    val m = TargetEncode.looEncode(df, "c", "y", m = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    def te(sum: Long, y: Long, n: Long): Double =
      math.floor((sum - y + (70.0 / 3) * 2.0) / (n - 1 + 2.0) * 1e6) / 1e6
    assert(m(("a", 10L)) == te(30, 10, 2))
    assert(m(("a", 20L)) == te(30, 20, 2))
    assert(m(("b", 40L)) == te(40, 40, 1)) // singleton: pure prior
  }

  test("singleton category encodes exactly the prior") {
    val df = Seq(("a", 10L), ("a", 30L), ("solo", 999L)).toDF("c", "y")
    val prior = (10.0 + 30.0 + 999.0) / 3
    val r = TargetEncode.looEncode(df, "c", "y", m = 5.0)
      .where($"c" === "solo").collect()(0).getDouble(2)
    // (999 - 999 + prior*5) / (0 + 5) = prior
    assert(r == math.floor(prior * 1e6) / 1e6)
  }

  test("own label never leaks: constant-category rows with distinct targets differ") {
    val df = Seq(("a", 0L), ("a", 100L)).toDF("c", "y")
    val rows = TargetEncode.looEncode(df, "c", "y", m = 1.0)
      .orderBy("y").collect().map(_.getDouble(2))
    // row y=0 sees the other row's 100; row y=100 sees 0 — encodings
    // must differ and order opposite to the labels
    assert(rows(0) > rows(1))
  }

  test("null category or target: NULL encoding, excluded from stats") {
    val df = Seq((Some("a"), Some(10L)), (Some("a"), Some(20L)),
      (None, Some(50L)), (Some("a"), None)).toDF("c", "y")
    val out = TargetEncode.looEncode(df, "c", "y")
    assert(out.where(col("te").isNull).count() == 2)
    // prior from the 2 valid rows only: 15
    val v = out.where(col("te").isNotNull).orderBy("y").collect()
    assert(v.length == 2)
  }

  test("deterministic across partitionings") {
    val df = (1 to 400).map(i => (s"c${i % 13}", (i * 7 % 101).toLong))
      .toDF("c", "y")
    def run(p: Int) = TargetEncode.looEncode(df.repartition(p), "c", "y")
      .orderBy("c", "y").collect().toSeq
    assert(run(1) == run(7))
  }

  test("woe: hand-computed smoothed log-odds, signs and IV") {
    // a: 3 rows 2 pos, b: 2 rows 0 pos; alpha 0.5, k=2, pt=2, negs=3
    val df = Seq(("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0))
      .toDF("c", "l")
    val rows = TargetEncode.woe(df, "c", "l", alpha = 0.5)
      .orderBy("category").collect()
    val psA = 2.5 / 3.0; val nsA = 1.5 / 4.0
    val psB = 0.5 / 3.0; val nsB = 2.5 / 4.0
    assert(math.abs(rows(0).getAs[Double]("woe") -
      math.log(psA / nsA)) < 2e-6)
    assert(math.abs(rows(1).getAs[Double]("woe") -
      math.log(psB / nsB)) < 2e-6)
    assert(rows(0).getAs[Double]("woe") > 0 &&
      rows(1).getAs[Double]("woe") < 0)
    // IV = Σ (ps − ns)·woe, both terms positive (shares and woe
    // deviate the same way)
    val iv = rows.map(_.getAs[Long]("iv_term9")).sum / 1e9
    val expected = (psA - nsA) * math.log(psA / nsA) +
      (psB - nsB) * math.log(psB / nsB)
    assert(math.abs(iv - expected) < 1e-6, s"iv $iv vs $expected")
  }

  test("woe: uninformative column gives near-zero IV") {
    // label alternates INDEPENDENTLY of the category (i%4 vs i%2
    // would be perfectly correlated)
    val df = (1 to 200).map(i => (s"c${i % 4}", (i / 4) % 2)).toDF("c", "l")
    val iv = TargetEncode.woe(df, "c", "l")
      .agg(org.apache.spark.sql.functions.sum("iv_term9"))
      .collect()(0).getLong(0) / 1e9
    assert(math.abs(iv) < 0.01, s"iv $iv")
  }
}
