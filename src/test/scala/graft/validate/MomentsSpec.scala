package graft.validate

import graft.SparkSpec

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric uniform 1..5: zero skew, kurtosis −1.3, exact mean") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
    val r = Profiler.moments(df, Seq("x")).collect()(0)
    assert(r.getAs[String]("col_name") == "x")
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Double]("mean") == 3.0)
    assert(r.getAs[Double]("skewness") == 0.0)
    // m4/m2² − 3 = 6.8/4 − 3 = −1.3 up to the pinned double chain
    assert(math.abs(r.getAs[Double]("kurtosis") - (-1.3)) < 1e-5,
      r.toString)
  }

  test("right tail skews positive, left tail negative") {
    val right = Seq(1.0, 1.0, 1.0, 10.0).toDF("x")
    assert(Profiler.moments(right, Seq("x")).collect()(0)
      .getAs[Double]("skewness") > 0.5)
    val left = Seq(10.0, 10.0, 10.0, 1.0).toDF("x")
    assert(Profiler.moments(left, Seq("x")).collect()(0)
      .getAs[Double]("skewness") < -0.5)
  }

  test("constant column: NULL shape stats; nulls excluded from n") {
    val df = Seq((Some(7.0), Some(2.0)), (Some(7.0), None),
      (Some(7.0), Some(4.0))).toDF("c", "x")
    val rows = Profiler.moments(df, Seq("c", "x")).orderBy("col_name")
      .collect()
    val c = rows(0)
    assert(c.getAs[Long]("n") == 3 && c.getAs[Double]("mean") == 7.0)
    assert(c.isNullAt(c.fieldIndex("skewness")))
    assert(c.isNullAt(c.fieldIndex("kurtosis")))
    assert(rows(1).getAs[Long]("n") == 2)
  }

  test("all columns ride one aggregate; deterministic across partitionings") {
    val df = (1 to 300).map(i => (i.toDouble, (i * i % 97).toDouble))
      .toDF("a", "b")
    val plan = Profiler.moments(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "single wide aggregate, no join")
    val r1 = Profiler.moments(df.repartition(1), Seq("a", "b"))
      .orderBy("col_name").collect().toSeq
    val r7 = Profiler.moments(df.repartition(7), Seq("a", "b"))
      .orderBy("col_name").collect().toSeq
    assert(r1 == r7)
  }
}
