package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "common rare1 common"),
    (2L, "common"),
    (3L, "common rare2")).toDF("doc_id", "text")

  test("hashedTfIdf: tf * smooth-idf with integer partials; collisions add") {
    // dim=1 forces every token into bucket 0, so each doc's weight is
    // the sum of its per-token partials — checks the collision sum and
    // the idf formula at once.
    val m = TfIdf.hashedTfIdf(docs, "doc_id", "text", dim = 1, replayable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // idf(common) = ln((1+3)/(1+3)) + 1 = 1; idf(rare) = ln(2) + 1
    val rareW = math.floor(1.0 * (math.log(2.0) + 1.0) * 10000).toLong // 16931
    assert(m(1L) == 20000L + rareW) // tf=2 common + rare1
    assert(m(2L) == 10000L)
    assert(m(3L) == 10000L + rareW)
  }

  test("hashedTfIdf: buckets bounded by dim, both hash paths deterministic") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (replayable <- Seq(true, false)) {
      val out = TfIdf.hashedTfIdf(real, "doc_id", "text", dim = 32,
        replayable = replayable).cache()
      val (lo, hi) = out.agg(min("bucket"), max("bucket"))
        .as[(Long, Long)].head()
      assert(lo >= 0 && hi < 32)
      // deterministic across runs
      val again = TfIdf.hashedTfIdf(real, "doc_id", "text", dim = 32,
        replayable = replayable)
      assert(out.except(again).isEmpty && again.except(out).isEmpty)
    }
  }
}
