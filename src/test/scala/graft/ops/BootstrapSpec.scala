package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("CI brackets the true mean and tightens with n") {
    def ci(n: Int) = {
      val df = (1 to n).map(i => (i.toLong, (i % 100).toLong))
        .toDF("id", "v")
      val r = Bootstrap.meanCi(df, "id", "v", replicates = 200).collect()(0)
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    val (p1, lo1, hi1) = ci(500)
    assert(lo1 <= p1 && p1 <= hi1, s"$lo1 <= $p1 <= $hi1")
    assert(hi1 - lo1 > 0, "nonzero width")
    val (p2, lo2, hi2) = ci(5000)
    assert(lo2 <= p2 && p2 <= hi2)
    assert(hi2 - lo2 < hi1 - lo1, s"width must shrink: ${hi2 - lo2} vs ${hi1 - lo1}")
  }

  test("poisson weights have mean ~1 and the documented distribution") {
    val df = (1L to 20000L).toDF("id").select(col("id"), lit(1L).as("v"))
    val rep = df.select(col("id").cast("string").as("_id"),
      explode(sequence(lit(0), lit(0))).as("r"))
    val u = (conv(substring(md5(concat_ws(":", lit("bs"), col("r"),
      col("_id"))), 1, 15), 16, 10).cast("long") % lit(1099511627776L))
      .cast("double") / lit(1099511627776.0)
    val ws = rep.select(Bootstrap.weight(u).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = ws.values.sum.toDouble
    assert(math.abs(ws(0L) / n - 0.3679) < 0.02, ws.toString)
    assert(math.abs(ws(1L) / n - 0.3679) < 0.02)
    assert(math.abs(ws(2L) / n - 0.1839) < 0.02)
    val mean = ws.map { case (w, c) => w * c }.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.03, s"weight mean $mean")
  }

  test("deterministic across partitionings and sensitive to seed") {
    val df = (1 to 400).map(i => (i.toLong, (i % 37).toLong)).toDF("id", "v")
    val a = Bootstrap.meanCi(df.repartition(1), "id", "v", 100).collect()(0)
    val b = Bootstrap.meanCi(df.repartition(7), "id", "v", 100).collect()(0)
    assert(a == b)
    val c = Bootstrap.meanCi(df, "id", "v", 100, seed = "other").collect()(0)
    assert(a.getDouble(3) != c.getDouble(3) || a.getDouble(4) != c.getDouble(4))
  }

  test("constant column gives a degenerate zero-width CI at the value") {
    val df = (1 to 300).map(i => (i.toLong, 42L)).toDF("id", "v")
    val r = Bootstrap.meanCi(df, "id", "v", 100).collect()(0)
    assert(r.getDouble(2) == 42.0 && r.getDouble(3) == 42.0 &&
      r.getDouble(4) == 42.0)
  }
}
