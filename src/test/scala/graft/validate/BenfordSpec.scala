package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("first digit from the decimal string; <1 filtered") {
    val r = Seq(1L, 9L, 10L, 123L, 987654L, 0L, -5L).toDF("v")
      .select(Benford.firstDigit(col("v")).as("d"))
      .collect().map(x => if (x.isNullAt(0)) -1 else x.getInt(0))
    assert(r.toSeq == Seq(1, 9, 1, 1, 9, -1, -1))
  }

  test("uniform digits 1-9: equal shares, known expected table") {
    val a = Benford.audit((1L to 9L).toDF("v"), "v")
      .orderBy("digit").collect()
    assert(a.length == 9)
    assert(a.forall(_.getDouble(2) == 0.111111)) // floor(1/9 * 1e6)/1e6
    assert(a(0).getDouble(3) == 0.301029) // log10(2) floored
    assert(a(8).getDouble(3) == 0.045757) // log10(10/9) floored
    // uniform digits violate Benford: digit 1 underrepresented
    assert(a(0).getDouble(4) > 0.15)
  }

  test("a geometric sequence conforms closely (MAD under Nigrini's 0.015)") {
    // 1.01^i spans ~17 decades in 4000 samples — multiplicative data,
    // Benford's home turf (measured MAD ≈ 0.0025)
    val vals = (1 until 4000).map(i => math.pow(1.01, i).toLong)
    val a = Benford.audit(vals.toDF("v"), "v")
    val mad = a.agg(avg("abs_dev")).collect()(0).getDouble(0)
    assert(mad < 0.015, s"MAD $mad")
  }

  test("deterministic across partitionings") {
    val df = (1L to 5000L).map(i => i * i).toDF("v")
    val a = Benford.audit(df.repartition(1), "v").orderBy("digit").collect()
    val b = Benford.audit(df.repartition(7), "v").orderBy("digit").collect()
    assert(a.toSeq == b.toSeq)
  }
}
