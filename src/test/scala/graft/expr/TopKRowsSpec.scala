package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKRowsSpec extends SparkSpec {
  import spark.implicits._

  test("topk_rows_by matches the window formulation, payload intact") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500) { i =>
      (s"g${i % 7}", rnd.nextInt(40).toDouble, i.toLong, s"payload-$i")
    }
    val df = rows.toDF("g", "s", "id", "txt").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(TopKRowsByScore.topKRowsBy(col("s"), col("id"),
        struct(col("id"), col("txt")), 5).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), (col("pos") + 1).as("rnk"),
        col("col.id").as("id"), col("col.txt").as("txt"))
      .as[(String, Int, Long, String)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 5).select("g", "rnk", "id", "txt")
      .as[(String, Int, Long, String)].collect().toSet
    assert(viaAgg === viaWindow)
    // payload survives the heap/serialize path verbatim
    assert(viaAgg.forall { case (_, _, id, txt) => txt == s"payload-$id" })
  }

  test("topk_rows_by partials combine map-side; serialize round-trips payloads") {
    // repartition forces partial buffers through serialize/deserialize
    // at the shuffle; mixed-width payloads (strings, arrays) exercise
    // the UnsafeRow byte path
    val df = spark.range(2000).select(
      (col("id") % 3).cast("string").as("g"),
      col("id").cast("double").as("s"),
      col("id").as("i"),
      concat(lit("x"), col("id")).as("txt"),
      array(col("id"), col("id") * 2).as("arr"))
      .repartition(16)
    val plan = df.groupBy("g")
      .agg(TopKRowsByScore.topKRowsBy(col("s"), col("i"),
        struct(col("i"), col("txt"), col("arr")), 4).as("t"))
    assert(plan.queryExecution.executedPlan.toString.contains("partial_topk_rows_by"))
    val out = plan.select(explode(col("t")).as("e"))
      .select(col("e.i"), col("e.txt"), col("e.arr"))
      .as[(Long, String, Seq[Long])].collect()
    assert(out.length == 12)
    out.foreach { case (i, txt, arr) =>
      assert(txt == s"x$i" && arr == Seq(i, i * 2), s"payload corrupted at $i")
    }
    // top-4 by score desc = ids 1997..1994 spread over groups 0/1/2
    assert(out.map(_._1).toSet == (1988L to 1999L).toSet)
  }

  test("topk_rows_by skips NaN scores and null payload rows") {
    val df = Seq((1.0, 1L), (Double.NaN, 2L), (3.0, 3L)).toDF("s", "id")
      .select(col("s"), col("id"),
        when(col("id") =!= 3L, struct(col("id"))).as("p"))
    val out = df.agg(TopKRowsByScore.topKRowsBy(col("s"), col("id"), col("p"), 3).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.id"))
      .as[Long].collect().toSeq
    // NaN row skipped; id=3 has null payload → skipped; only id=1 left
    assert(out === Seq(1L))
  }
}
