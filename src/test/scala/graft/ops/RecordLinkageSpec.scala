package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (1L, "acme corporation", "north street 5"),
    (2L, "acme corporatiom", "north street 5"),   // typo dup of 1
    (3L, "acme corp", "south road 99"),           // same block, too far
    (10L, "zenith labs", "east avenue 1"),
    (11L, "zenith labs", "east avenue 1"),        // exact dup of 10
    (20L, "other thing", null.asInstanceOf[String])) // null field
    .toDF("id", "name", "addr")

  private val fields = Seq(("name", 2.0), ("addr", 1.0))
  private def blk = lower(substring(col("name"), 1, 2))

  test("scoredPairs: only within-block candidates, weighted score, threshold") {
    val pairs = RecordLinkage.scoredPairs(recs, "id", blk, fields, 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((1L, 2L), (10L, 11L)), pairs)
    // exact dup scores 1.0
    val s = RecordLinkage.scoredPairs(recs, "id", blk, fields, 0.9)
      .where(col("id1") === 10L).select("score").as[Double].head()
    assert(s == 1.0)
  }

  test("cross-block pairs are never generated even if similar") {
    val r = Seq((1L, "abcdef"), (2L, "xbcdef")).toDF("id", "name")
    val pairs = RecordLinkage.scoredPairs(r, "id",
      lower(substring(col("name"), 1, 2)), Seq(("name", 1.0)), 0.0)
    assert(pairs.count() == 0)
  }

  test("linkClusters: transitive closure with singletons, min-id entity") {
    val m = RecordLinkage.linkClusters(recs, "id", blk, fields, 0.9)
      .as[(Long, Long)].collect().toMap
    assert(m(1L) == 1L && m(2L) == 1L)
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m(3L) == 3L && m(20L) == 20L)
    assert(m.size == 6)
  }

  test("maxBlockSize drops oversized blocks entirely") {
    val big = (0L until 20L).map(i => (i, "same prefix " + i))
      .toDF("id", "name")
    val capped = RecordLinkage.scoredPairs(big, "id",
      lower(substring(col("name"), 1, 2)), Seq(("name", 1.0)), 0.0,
      maxBlockSize = 10)
    assert(capped.count() == 0)
    val uncapped = RecordLinkage.scoredPairs(big, "id",
      lower(substring(col("name"), 1, 2)), Seq(("name", 1.0)), 0.0)
    assert(uncapped.count() == 190) // 20 choose 2
  }

  test("linkTables: cross-table candidates only, best-per-left with id tie-break") {
    val left = Seq((1L, "acme corp"), (2L, "acme corpse")).toDF("id", "name")
    val right = Seq((10L, "acme corp"), (11L, "acme corp"), (12L, "zzz"))
      .toDF("id", "name")
    val all = RecordLinkage.linkTables(left, right, "id",
        lower(substring(col("name"), 1, 2)), Seq(("name", 1.0)), 0.5)
      .as[(Long, Long, Double)].collect()
    // left-left and right-right pairs never appear
    assert(all.forall(p => p._1 < 10 && p._2 >= 10), all.toSeq)
    val best = RecordLinkage.linkTables(left, right, "id",
        lower(substring(col("name"), 1, 2)), Seq(("name", 1.0)), 0.5,
        bestPerLeft = true)
      .as[(Long, Long, Double)].collect().map(p => p._1 -> p._2).toMap
    // 10 and 11 tie at score 1.0 for left 1 — smaller right id wins
    assert(best(1L) == 10L, best)
    assert(best(2L) == 10L, best)
  }

  test("null fields contribute zero for their weight, not null score") {
    // name matches exactly (w=2), addr null on one side (w=1):
    // score = 2/3 floor-quantized
    val r = Seq((1L, "same", "addr here"), (2L, "same", null))
      .toDF("id", "name", "addr")
    val s = RecordLinkage.scoredPairs(r, "id", lit("b"), fields, 0.0)
      .select("score").as[Double].head()
    assert(s == math.floor(2.0 / 3.0 * 1e4) / 1e4, s)
  }
}
