package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {

  import spark.implicits._

  test("writeShards round trip: every row lands, manifest certifies directories") {
    val df = spark.range(1000).selectExpr("id", "id * 3 AS payload")
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val written = Shards.writeShards(df, "id", path, numShards = 4)
        .orderBy("shard").collect()
      assert(written.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
      assert(written.map(_.getLong(1)).sum === 1000L)
      // written manifest == planned manifest: the files hold exactly
      // the planned multiset
      val planned = Shards.manifest(df, "id", 4).orderBy("shard").collect()
      assert(written.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
        === planned.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
      // read-back preserves every row and its payload
      val back = spark.read.parquet(path)
      assert(back.count() === 1000L)
      assert(back.select(sum("payload")).head().getLong(0)
        === df.select(sum("payload")).head().getLong(0))
      // assignment is stable: a second write produces identical shards
      val path2 = java.nio.file.Files.createTempDirectory("shards2").toString
      try {
        val again = Shards.writeShards(df, "id", path2, 4)
          .orderBy("shard").collect()
        assert(again.map(_.toSeq).toSeq === written.map(_.toSeq).toSeq)
      } finally new scala.reflect.io.Directory(new java.io.File(path2))
        .deleteRecursively()
    } finally new scala.reflect.io.Directory(new java.io.File(path))
      .deleteRecursively()
  }

  test("a missing or duplicated row flips exactly its shard's checksum") {
    val df = spark.range(500).toDF("id")
    val full = Shards.manifest(df, "id", 4).orderBy("shard").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val victimShard = Shards.assignShard(lit(123L), 4) // row 123's shard
    val vs = spark.range(1).select(victimShard.as("s")).head().getInt(0)
    // drop one row
    val dropped = Shards.manifest(df.where(col("id") =!= 123L), "id", 4)
      .orderBy("shard").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(dropped(vs)._1 === full(vs)._1 - 1)
    assert(dropped(vs)._2 !== full(vs)._2)
    assert(full.keySet.filter(_ != vs).forall(s => dropped(s) === full(s)))
    // duplicate the same row: XOR cancels, n_rows does not — the pair
    // of fields together still catches it
    val duped = Shards.manifest(
        df.union(df.where(col("id") === 123L)), "id", 4)
      .orderBy("shard").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(duped(vs)._1 === full(vs)._1 + 1) // the count catches the dup
    // ...because the XOR alone cannot: the pair cancels, leaving the
    // checksum of the manifest WITHOUT the row
    assert(duped(vs)._2 === dropped(vs)._2)
  }

  test("manifests compose: merge of batch manifests == manifest of the union") {
    val all = spark.range(2000).toDF("id")
    val (b1, b2) = (all.where(col("id") < 1200), all.where(col("id") >= 1200))
    val merged = Shards.mergeManifests(
        Shards.manifest(b1, "id", 4), Shards.manifest(b2, "id", 4))
      .orderBy("shard").collect().map(_.toSeq)
    val direct = Shards.manifest(all, "id", 4)
      .orderBy("shard").collect().map(_.toSeq)
    assert(merged.toSeq === direct.toSeq)
    // merging a manifest with itself cancels every checksum (the
    // XOR-visibility of double ingestion) while counts double
    val twice = Shards.mergeManifests(
        Shards.manifest(b1, "id", 4), Shards.manifest(b1, "id", 4))
      .collect()
    assert(twice.forall(r => r.getLong(2) === 0L))
    val once = Shards.manifest(b1, "id", 4).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    twice.foreach(r => assert(r.getLong(1) === 2 * once(r.getInt(0))))
  }

  test("shard sizes are balanced and the manifest plan is one aggregation") {
    val df = spark.range(40000).toDF("id")
    val m = Shards.manifest(df, "id", 8).collect()
    val sizes = m.map(_.getLong(1))
    assert(sizes.length === 8)
    sizes.foreach(n => assert(math.abs(n - 5000L) < 500, s"skewed shard: $n"))
    val plan = Shards.manifest(df, "id", 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"), plan)
  }

  test("writeOrderedShards: contiguous position ranges, sorted files, certified manifest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ordshards").toString
    val df = spark.range(1000).select(col("id"), (col("id") * 3).as("payload"))
    val man = Shards.writeOrderedShards(df, "id", s"$dir/out",
      rowsPerShard = 256, salt = 9L).orderBy("shard").collect()
    // 1000 rows / 256 → shards 0..3 with arithmetic ranges
    assert(man.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    man.foreach { r =>
      val (s, n, lo, hi) = (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == s * 256L && n == hi - lo + 1, r.toString)
      assert(if (s < 3) n == 256L else n == 1000L - 768L)
    }
    // the manifest from files equals the data-side derivation
    val derived = Shards.orderedManifest(df, "id", 256, salt = 9L)
      .orderBy("shard").collect()
    assert(man.map(_.toSeq).toSeq == derived.map(_.toSeq).toSeq)
    // read-back reconstructs the exact global permutation, and rows
    // inside each file are position-sorted (resume = skip + scan)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 1000)
    assert(back.select("pos").as[Long].collect().sorted.toSeq == (0L until 1000L))
    val firstFile = new java.io.File(s"$dir/out/shard=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).head
    val inFile = spark.read.parquet(firstFile.toString).select("pos").as[Long].collect()
    assert(inFile.toSeq == inFile.sorted.toSeq)
  }
}
