package graft.streaming

import graft.SparkSpec
import graft.ops.Ann
import org.apache.spark.sql.functions._

class AnnIngestSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // the same deterministic md5-sampled quantizer Ann.ivfTopK defaults to
  private def centroids(n: Int) =
    emb.select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))
      .orderBy(md5(col("cent_id").cast("string")).asc, col("cent_id").asc)
      .limit(n).cache()

  test("incremental ingest + partition-pruned probe matches batch IVF exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-ingest").toString
    val idx = s"$dir/index"
    val cents = centroids(16)

    // ingest the corpus in two micro-batches
    AnnIngest.processBatch(emb.where(col("vec_id") % 2 === 0),
      cents, "vec_id", "embedding", idx, "run1", 0L)
    AnnIngest.processBatch(emb.where(col("vec_id") % 2 === 1),
      cents, "vec_id", "embedding", idx, "run1", 1L)

    val queries = emb.where(col("vec_id") < 5)
    val streamed = AnnIngest.probe(spark, idx, cents, queries,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .orderBy("query_id", "rnk").collect()
    val batch = Ann.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 10, numCells = 16, nprobe = 4, centroids = Some(cents))
      .orderBy("query_id", "rnk").collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))

    // index is cell-partitioned on disk → probes partition-prune
    val cellDirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell="))
    assert(cellDirs.length > 1)

    // replaying a batch (foreachBatch retry) leaves the index unchanged
    val before = spark.read.parquet(idx).count()
    AnnIngest.processBatch(emb.where(col("vec_id") % 2 === 1),
      cents, "vec_id", "embedding", idx, "run1", 1L)
    assert(spark.read.parquet(idx).count() === before)
    cents.unpersist()
  }

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    emb.limit(100).write.mode("append").parquet(drop)
    val cents = centroids(8)

    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT").parquet(drop)
    val q = AnnIngest.start(stream, cents, "vec_id", "embedding",
      s"$dir/index", s"$dir/ckpt")
    try q.awaitTermination(60000) finally q.stop()

    assert(spark.read.parquet(s"$dir/index").count() === 100)
    cents.unpersist()
  }
}
