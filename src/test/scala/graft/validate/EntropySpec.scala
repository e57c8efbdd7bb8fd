package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.Row

class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def ent(rows: Array[Row]): Map[String, (Long, Long, Double)] =
    rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("constant, key, and uniform columns hit their textbook values") {
    val n = 64
    val df = (1 to n).map(i => ("k", i.toLong, (i % 2).toString))
      .toDF("const", "key", "coin")
    val m = ent(Profiler.entropy(df, Seq("const", "key", "coin")).collect())
    assert(math.abs(m("const")._3) <= 0.000001, s"const ${m("const")}")
    assert(m("const")._2 == 1L)
    val lnN = math.floor(math.log(n.toDouble) * 1000000) / 1000000
    assert(math.abs(m("key")._3 - lnN) <= 0.000002, s"key ${m("key")}")
    assert(m("key")._2 == n.toLong)
    assert(math.abs(m("coin")._3 - math.log(2)) <= 0.000002,
      s"coin ${m("coin")}")
  }

  test("nulls are excluded from the distribution") {
    val df = Seq[(String, String)](("a", "x"), ("b", null), ("a", "y"))
      .toDF("c1", "c2")
    val m = ent(Profiler.entropy(df, Seq("c1", "c2")).collect())
    assert(m("c2")._1 == 2L && m("c2")._2 == 2L)
    assert(m("c1")._1 == 3L)
  }

  test("skewed distribution sits between constant and uniform") {
    // 9:1 split — H = -(0.9 ln 0.9 + 0.1 ln 0.1) ~ 0.325
    val df = (1 to 100).map(i => if (i <= 90) "a" else "b").toDF("c")
    val m = ent(Profiler.entropy(df, Seq("c")).collect())
    assert(math.abs(m("c")._3 - 0.325083) < 0.00001, s"${m("c")}")
  }

  test("deterministic across partitionings") {
    val df = (1 to 997).map(i => ((i % 13).toString, (i % 7).toString))
      .toDF("a", "b")
    val r1 = Profiler.entropy(df.repartition(1), Seq("a", "b"))
      .orderBy("col_name").collect().toSeq
    val r2 = Profiler.entropy(df.repartition(11), Seq("a", "b"))
      .orderBy("col_name").collect().toSeq
    assert(r1 == r2)
  }
}
