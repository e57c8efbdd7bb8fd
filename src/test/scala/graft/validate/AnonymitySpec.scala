package graft.validate

import graft.SparkSpec

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  // zip+age: one group of 3, one pair, one singleton
  private def people = Seq(
    (1L, "10001", 30), (2L, "10001", 30), (3L, "10001", 30),
    (4L, "10002", 41), (5L, "10002", 41),
    (6L, "10003", 77)
  ).toDF("id", "zip", "age")

  test("riskyGroups lists exactly the under-k combinations") {
    val r = Anonymity.riskyGroups(people, Seq("zip", "age"), k = 3)
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2))).toSet
    assert(r == Set(("10002", 41, 2L), ("10003", 77, 1L)))
  }

  test("audit reports exposure and the achieved k") {
    val a = Anonymity.audit(people, Seq("zip", "age"), k = 3).collect()(0)
    assert(a.getAs[Long]("total_rows") == 6L)
    assert(a.getAs[Long]("exposed_rows") == 3L) // the pair + the singleton
    assert(a.getAs[Double]("exposed_frac") == 0.5)
    assert(a.getAs[Long]("achieved_k") == 1L)
    assert(a.getAs[Long]("n_groups") == 3L && a.getAs[Long]("risky_groups") == 2L)
  }

  test("a uniform corpus is clean: zero exposure, achieved_k = group size") {
    val uniform = Seq.tabulate(12)(i => (i.toLong, "Z", i % 3)).toDF("id", "zip", "age")
    val a = Anonymity.audit(uniform, Seq("zip", "age"), k = 4).collect()(0)
    assert(a.getAs[Long]("exposed_rows") == 0L)
    assert(a.getAs[Double]("exposed_frac") == 0.0)
    assert(a.getAs[Long]("achieved_k") == 4L)
  }

  test("suppress drops exactly the exposed rows and the release is k-anonymous") {
    val kept = Anonymity.suppress(people, Seq("zip", "age"), k = 3)
    assert(kept.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val a = Anonymity.audit(kept, Seq("zip", "age"), k = 3).collect()(0)
    assert(a.getAs[Long]("exposed_rows") == 0L)
    assert(a.getAs[Long]("achieved_k") >= 3L)
  }

  test("argument guards") {
    intercept[IllegalArgumentException] {
      Anonymity.audit(people, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Anonymity.riskyGroups(people, Seq("zip"), k = 1)
    }
  }
}
