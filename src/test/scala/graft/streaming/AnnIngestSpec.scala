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

  // synthetic corpora with known structure: clustered = 8 well-separated
  // one-hot-ish centers + small noise (neighbors at cosine ~1);
  // uniform = hash-random directions (best neighbor cosine well below 1)
  private def clusteredCorpus(n: Int) = spark.range(n).selectExpr(
    "id AS vec_id",
    "transform(sequence(0, 15), j -> CAST(" +
      "(CASE WHEN j = pmod(id, 8) THEN 10.0 ELSE 0.0 END) + " +
      "pmod(xxhash64(id, j), 100) / 1000.0 AS FLOAT)) AS embedding")
  private def uniformCorpus(n: Int) = spark.range(n).selectExpr(
    "id AS vec_id",
    "transform(sequence(0, 15), j -> " +
      "CAST(pmod(xxhash64(id, j), 2000) / 1000.0 - 1.0 AS FLOAT)) AS embedding")

  test("clusterednessProbe separates clustered from uniform corpora") {
    val hi = Ann.clusterednessProbe(clusteredCorpus(2000), "vec_id", "embedding",
      nQueries = 64, sampleRows = 1000)
    val lo = Ann.clusterednessProbe(uniformCorpus(2000), "vec_id", "embedding",
      nQueries = 64, sampleRows = 1000)
    assert(hi > 0.9, s"clustered probe $hi")
    assert(lo < 0.8, s"uniform probe $lo")
  }

  test("buildAuto picks per corpus, persists the decision, probeAuto routes through it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-auto").toString

    val clustered = clusteredCorpus(2000)
    val c1 = AnnIngest.buildAuto(clustered, "vec_id", "embedding",
      s"$dir/idx-c", "r", 0L, numCells = 32, numCoarse = 4, numFine = 4,
      sampleRows = 1000)
    assert(c1.kind == "two_level")
    assert(AnnIngest.readQuantizerChoice(s"$dir/idx-c") == c1) // metadata round trip

    val uniform = uniformCorpus(2000)
    val c2 = AnnIngest.buildAuto(uniform, "vec_id", "embedding",
      s"$dir/idx-u", "r", 0L, numCells = 32, numCoarse = 4, numFine = 4,
      sampleRows = 1000)
    assert(c2.kind == "flat")
    assert(AnnIngest.readQuantizerChoice(s"$dir/idx-u").kind == "flat")

    // probeAuto ≡ the explicit probe through the persisted model
    val queries = clustered.where(col("vec_id") < 3)
    val auto = AnnIngest.probeAuto(spark, s"$dir/idx-c", queries,
        "vec_id", "embedding", k = 5, nCoarseProbe = 2, nprobe = 4)
      .orderBy("query_id", "rnk").collect()
    val (coarse, fine) = Ann.loadTwoLevel(spark, s"$dir/idx-c/_model")
    val explicit = AnnIngest.probe2(spark, s"$dir/idx-c", coarse, fine, queries,
        "vec_id", "embedding", k = 5, nCoarseProbe = 2, nprobe = 4)
      .orderBy("query_id", "rnk").collect()
    assert(auto.map(_.toString) === explicit.map(_.toString))
    assert(auto.nonEmpty)

    val qU = uniform.where(col("vec_id") < 3)
    val autoU = AnnIngest.probeAuto(spark, s"$dir/idx-u", qU,
        "vec_id", "embedding", k = 5, nprobe = 8)
      .orderBy("query_id", "rnk").collect()
    val flat = Ann.loadCentroids(spark, s"$dir/idx-u/_model/flat")
    val explicitU = AnnIngest.probe(spark, s"$dir/idx-u", flat, qU,
        "vec_id", "embedding", k = 5, nprobe = 8)
      .orderBy("query_id", "rnk").collect()
    assert(autoU.map(_.toString) === explicitU.map(_.toString))
    assert(autoU.nonEmpty)
  }

  test("recluster preserves the quantizer kind: two_level stays two_level") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-rekind").toString
    val clustered = clusteredCorpus(2000)
    val c1 = AnnIngest.buildAuto(clustered, "vec_id", "embedding",
      s"$dir/idx", "r", 0L, numCells = 32, numCoarse = 4, numFine = 4,
      sampleRows = 1000)
    assert(c1.kind == "two_level")

    AnnIngest.recluster(spark, s"$dir/idx", numCells = 32, sampleRows = 1000)
    val gen = AnnIngest.currentDataPath(spark, s"$dir/idx")
    assert(gen.endsWith("_gen00000001"), gen)
    val after = AnnIngest.readQuantizerChoice(gen)
    assert(after.kind == "two_level",
      s"recluster must not downgrade a two_level index: $after")
    assert(after.numCoarse == c1.numCoarse && after.numFine == c1.numFine,
      "the recorded coarse/fine dials survive maintenance")

    // probeAuto still routes through the two-level path, and its
    // results equal an explicit probe2 through the NEW generation's
    // model over the same index
    val queries = clustered.where(col("vec_id") < 3)
    val auto = AnnIngest.probeAuto(spark, s"$dir/idx", queries,
        "vec_id", "embedding", k = 5, nCoarseProbe = 2, nprobe = 4)
      .orderBy("query_id", "rnk").collect()
    val (coarse, fine) = Ann.loadTwoLevel(spark, s"$gen/_model")
    val explicit = AnnIngest.probe2(spark, s"$dir/idx", coarse, fine, queries,
        "vec_id", "embedding", k = 5, nCoarseProbe = 2, nprobe = 4)
      .orderBy("query_id", "rnk").collect()
    assert(auto.map(_.toString) === explicit.map(_.toString))
    assert(auto.nonEmpty)
  }
}
