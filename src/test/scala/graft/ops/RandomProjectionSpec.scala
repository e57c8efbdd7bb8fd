package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("projection preserves neighbor structure (planted twin pairs)") {
    import spark.implicits._
    // 40 well-separated random vectors, each with a slightly-perturbed
    // twin: after a 64→16 projection, a vector's nearest neighbor must
    // still be its twin (the property ANN pre-reduction relies on; JL
    // per-pair epsilons at k=16 are too loose to assert directly)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(40)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val twin = v.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, twin))
    }
    val out = RandomProjection.project(
        rows.toSeq.toDF("vec_id", "embedding"), "embedding", 64, 16)
      .select(col("vec_id"), col("proj"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val twinIsNearest = out.count { case (id, p) =>
      val twin = out((id ^ 1L).toInt)._2
      val dTwin = d2(p, twin)
      out.forall { case (oid, op) =>
        oid == id || oid == (id ^ 1L) || d2(p, op) > dTwin }
    }
    assert(twinIsNearest >= 76, s"only $twinIsNearest/80 twins survived")
  }

  test("deterministic, salt-sensitive, and -0.0-free") {
    val a = RandomProjection.project(emb.limit(20), "embedding", 64, 8)
      .select("proj").collect().map(_.getSeq[Double](0))
    val b = RandomProjection.project(emb.limit(20), "embedding", 64, 8)
      .select("proj").collect().map(_.getSeq[Double](0))
    assert(a.toSeq === b.toSeq)
    val c = RandomProjection.project(emb.limit(20), "embedding", 64, 8, salt = 9L)
      .select("proj").collect().map(_.getSeq[Double](0))
    assert(c.toSeq !== a.toSeq)
    // an all-zero vector projects to +0.0 everywhere (the -0.0 guard)
    import spark.implicits._
    val zero = Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val z = RandomProjection.project(zero, "embedding", 64, 8)
      .select("proj").head().getSeq[Double](0)
    assert(z.forall(v => v == 0.0 &&
      java.lang.Double.doubleToRawLongBits(v) == 0L))
  }

  test("projection plan is a narrow map: no shuffle, no UDF") {
    val df = RandomProjection.project(emb, "embedding", 64, 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"), plan)
  }
}
