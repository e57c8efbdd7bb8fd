package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("shuffled positions are a dense 0..n-1 permutation matching a driver sort") {
    val df = spark.range(500).toDF("id")
    val got = GlobalOrder.shuffled(df, "id", salt = 3L, numPartitions = 7)
      .select("id", "pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted == (0L until 500L))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) =
      md.digest(s"$id:3".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (0L until 500L).sortBy(key).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got == expect)
  }

  test("partition count does not change positions") {
    val df = spark.range(300).toDF("id")
    val a = GlobalOrder.shuffled(df, "id", salt = 1L, numPartitions = 2)
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GlobalOrder.shuffled(df, "id", salt = 1L, numPartitions = 11)
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("salt produces a different permutation (epoch reshuffle)") {
    val df = spark.range(200).toDF("id")
    val a = GlobalOrder.shuffled(df, "id", salt = 0L).select("id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GlobalOrder.shuffled(df, "id", salt = 99L).select("id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a != b)
  }

  test("byCurriculum is nondecreasing in the signal along positions, ties md5-broken") {
    val df = Seq(
      (1L, 0.5), (2L, 0.1), (3L, 0.5), (4L, -0.3), (5L, 2.0)
    ).toDF("id", "difficulty")
    val rows = GlobalOrder.byCurriculum(df, "difficulty", "id")
      .orderBy("pos").select("id", "difficulty", "pos").collect()
    assert(rows.map(_.getLong(2)).toSeq == (0L until 5L))
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted)
    assert(scores == Seq(-0.3, 0.1, 0.5, 0.5, 2.0))
  }

  test("the plan ranks per bucket over the pinned exchange — no global window sort") {
    val df = spark.range(100).toDF("id")
    val plan = GlobalOrder.shuffled(df, "id")
      .queryExecution.executedPlan.toString
    // the range exchange ran EAGERLY inside the localCheckpoint (which
    // pins bucket boundaries against recompute and frees with the
    // frame) — downstream the plan reads the checkpointed RDD, so the
    // visible shape is scan-of-existing-rdd, never a fresh global sort
    assert(plan.toLowerCase.contains("existingrdd"))
    assert(!plan.toLowerCase.contains("rangepartitioning"))
    // the rank window is partitioned (by _bucket) — an unpartitioned
    // Window would trigger Spark's move-everything-to-one-task path
    assert(plan.contains("windowspecdefinition(_bucket"))
  }

  test("repeated orderings do not accrete storage blocks (checkpoint frees with the frame)") {
    // cache() via CacheManager would leak one corpus-sized entry per
    // call until an unpersist the API never issues; localCheckpoint
    // blocks are ContextCleaner-managed. Pin: no CacheManager entry.
    // the session (and its CacheManager) is shared across suites —
    // start from a clean slate so residue from an unrelated suite
    // cannot fail (or mask) THIS operator's no-cache pin
    spark.sharedState.cacheManager.clearCache()
    val df = spark.range(1000).toDF("id")
    GlobalOrder.shuffled(df, "id").count()
    GlobalOrder.shuffled(df, "id", salt = 7L).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("payload columns survive the ordering") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
    val rows = GlobalOrder.shuffled(df, "id").collect()
    assert(rows.map(_.getAs[String]("payload")).toSet == Set("a", "b"))
    assert(rows.forall(r => r.schema.fieldNames.toSet == Set("id", "payload", "pos")))
  }
}
