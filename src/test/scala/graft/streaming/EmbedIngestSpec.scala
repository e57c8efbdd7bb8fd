package graft.streaming

import graft.SparkSpec
import graft.text.{Sgns, SkipGram}
import org.apache.spark.sql.functions._

class EmbedIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Three topic clusters (the SgnsSpec fixture shape). */
  private def corpus = {
    val docs = for {
      c <- 0 until 3
      d <- 0 until 40
    } yield {
      val words = (0 until 8).map(p => s"c${c}w${(d + p) % 6}")
      (c.toLong * 100 + d, words.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  test("streaming text index: micro-batch ingest ≡ batch embeddings; twins probe at cosine 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-embed-ingest").toString
    val idx = s"$dir/index"
    // offline: train once, freeze weights + centroids (model data)
    val m = Sgns.train(SkipGram.pairs(corpus, "doc_id", "text", window = 2),
      dim = 16, epochs = 40, lr = 2.0, negatives = 3, topV = 100,
      seed = "ingest")
    val weights = Sgns.idfWeights(corpus, "doc_id", "text",
      m.embeddingsDf(spark)).cache()
    val offline = Sgns.docEmbeddings(corpus, "doc_id", "text",
      m.embeddingsDf(spark))
    val cents = offline
      .select(col("doc_id").as("cent_id"), col("embedding").as("cent_vec"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      .limit(6).cache()

    // ingest in two micro-batches
    EmbedIngest.processBatch(corpus.where(col("doc_id") % 2 === 0),
      "doc_id", "text", weights, cents, idx, "r1", 0L)
    EmbedIngest.processBatch(corpus.where(col("doc_id") % 2 === 1),
      "doc_id", "text", weights, cents, idx, "r1", 1L)

    // frozen-weight ingest reproduces the offline embeddings EXACTLY
    val indexed = spark.read.parquet(idx)
      .select(col("id"), col("vec")).as[(Long, Seq[Float])]
      .collect().toMap
    val off = offline.as[(Long, Seq[Float])].collect().toMap
    assert(indexed.keySet == off.keySet)
    off.foreach { case (id, v) =>
      assert(indexed(id) == v, s"doc $id drifted between batch and stream")
    }

    // word-shuffled twins arriving LATER probe their indexed originals
    // at cosine 1.0 (order-invariant bag-of-vectors mean)
    val twins = corpus.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"),
        array_join(reverse(split(col("text"), " ")), " ").as("text"))
    val hits = EmbedIngest.probeText(spark, idx, twins, "doc_id", "text",
        weights, cents, k = 1, nprobe = 3)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(hits.length == 12)
    hits.foreach { case (q, n, c) =>
      assert(c >= 0.999999, s"twin $q cosine $c")
      // the matched neighbor is the original OR an embedding-identical
      // sibling (the cyclic fixture makes same-residue docs exact
      // duplicates — any of them is a correct dedup hit)
      assert(n == q - 1000L || off(n) == off(q - 1000L),
        s"twin $q matched non-duplicate $n")
    }

    // replay idempotence (foreachBatch retry)
    val before = spark.read.parquet(idx).count()
    EmbedIngest.processBatch(corpus.where(col("doc_id") % 2 === 1),
      "doc_id", "text", weights, cents, idx, "r1", 1L)
    assert(spark.read.parquet(idx).count() == before)
    weights.unpersist(); cents.unpersist()
  }

  test("drifted feed crowds stale centroids; recluster rebalances in one atomic generation swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-embed-drift").toString
    val idx = s"$dir/index"
    // six DISTINCT-vocabulary topics; the quantizer only ever sees the
    // first three (the pre-drift world), topics 3-5 arrive later
    val all = {
      val docs = for {
        c <- 0 until 6
        d <- 0 until 30
      } yield {
        val words = (0 until 8).map(p => s"t${c}w${(d + p) % 6}")
        (c.toLong * 100 + d, words.mkString(" "))
      }
      docs.toDF("doc_id", "text")
    }
    val early = all.where(col("doc_id") < 300)
    val late = all.where(col("doc_id") >= 300)
    val m = Sgns.train(SkipGram.pairs(all, "doc_id", "text", window = 2),
      dim = 16, epochs = 40, lr = 2.0, negatives = 3, topV = 200,
      seed = "drift")
    val weights = Sgns.idfWeights(all, "doc_id", "text",
      m.embeddingsDf(spark)).cache()
    // centroids trained on the EARLY world only — the serving reality
    val cents0 = graft.ops.Ann.kmeansCentroids(
      Sgns.docEmbeddings(early, "doc_id", "text", m.embeddingsDf(spark)),
      "doc_id", "embedding", k = 6, iters = 3).cache()

    EmbedIngest.processBatch(early, "doc_id", "text", weights, cents0,
      idx, "r1", 0L)
    EmbedIngest.processBatch(late, "doc_id", "text", weights, cents0,
      idx, "r1", 1L)

    def maxLateCellFraction: Double = {
      val cells = spark.read.parquet(
          AnnIngest.currentDataPath(spark, idx))
        .where(col("id") >= 300).groupBy("cell").count()
        .select("count").as[Long].collect()
      cells.max.toDouble / cells.sum
    }
    // drift: the three unseen topics crowd into few stale cells
    val crowdedBefore = maxLateCellFraction
    assert(crowdedBefore >= 0.5,
      s"fixture should crowd drifted docs, got $crowdedBefore")

    // maintenance: retrain from the accumulated index, rewrite, swap
    assert(AnnIngest.currentDataPath(spark, idx) == idx)
    AnnIngest.recluster(spark, idx, numCells = 12, iters = 3)
    val gen1 = AnnIngest.currentDataPath(spark, idx)
    assert(gen1 == s"$idx/_gen00000001")
    assert(spark.read.parquet(gen1).count() == 180, "rewrite lost rows")
    val crowdedAfter = maxLateCellFraction
    assert(crowdedAfter < crowdedBefore,
      s"recluster must rebalance: $crowdedBefore -> $crowdedAfter")

    // probes resolve the new generation transparently and twins of
    // DRIFTED docs still land at cosine 1.0
    val cents1 = AnnIngest.currentCentroids(spark, idx).cache()
    val twins = late.where(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 9000L).as("doc_id"),
        array_join(reverse(split(col("text"), " ")), " ").as("text"))
    val hits = EmbedIngest.probeText(spark, idx, twins, "doc_id", "text",
        weights, cents1, k = 1, nprobe = 2)
      .select("query_id", "cosine").as[(Long, Double)].collect()
    assert(hits.length == 9)
    hits.foreach { case (q, c) => assert(c >= 0.999999, s"twin $q cosine $c") }

    // a replayed pre-swap batch (foreachBatch retry after restart)
    // appends into the NEW generation idempotently: same (cell, run,
    // batch) partitions, same content, count unchanged
    val before = spark.read.parquet(gen1).count()
    EmbedIngest.processBatch(late, "doc_id", "text", weights, cents1,
      idx, "r1", 1L)
    assert(spark.read.parquet(gen1).count() == before)

    // the maintenance DIAL: cell balance improves across the swap
    val bal = AnnIngest.cellBalance(spark, idx, nprobe = 2).collect()(0)
    assert(bal.getAs[Long]("rows") == 180L)
    assert(bal.getAs[Double]("max_cell_frac") < crowdedBefore)

    // second maintenance round: the marker sequence keeps advancing
    AnnIngest.recluster(spark, idx, numCells = 12, iters = 1)
    assert(AnnIngest.currentDataPath(spark, idx) == s"$idx/_gen00000002")
    assert(spark.read.parquet(
      AnnIngest.currentDataPath(spark, idx)).count() == 180)

    // vacuum: superseded gen-1 reclaims past the grace window; the
    // current generation and the gen-0 root survive
    AnnIngest.vacuumGenerations(spark, idx, graceMs = -1L)
    val hfs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$idx/_gen00000001")))
    assert(hfs.exists(new org.apache.hadoop.fs.Path(s"$idx/_gen00000002")))
    assert(AnnIngest.currentDataPath(spark, idx) == s"$idx/_gen00000002")
    assert(spark.read.parquet(
      AnnIngest.currentDataPath(spark, idx)).count() == 180)
    weights.unpersist(); cents0.unpersist(); cents1.unpersist()
  }

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-embed-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    corpus.write.mode("append").parquet(drop)
    val m = Sgns.train(SkipGram.pairs(corpus, "doc_id", "text", window = 2),
      dim = 8, epochs = 5, lr = 1.0, negatives = 2, topV = 100,
      seed = "ingest2")
    val weights = Sgns.idfWeights(corpus, "doc_id", "text",
      m.embeddingsDf(spark)).cache()
    val cents = Sgns.docEmbeddings(corpus, "doc_id", "text",
        m.embeddingsDf(spark))
      .select(col("doc_id").as("cent_id"), col("embedding").as("cent_vec"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      .limit(4).cache()
    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .parquet(drop)
    val q = EmbedIngest.start(stream, "doc_id", "text", weights, cents,
      s"$dir/index", s"$dir/ckpt")
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.read.parquet(s"$dir/index").count() == 120)
    // a verbatim re-arrival is detectable against the streamed index
    val dup = corpus.where(col("doc_id") === 7L)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
    val hit = EmbedIngest.probeText(spark, s"$dir/index", dup, "doc_id",
        "text", weights, cents, k = 1, nprobe = 2)
      .select("neighbor_id", "cosine").as[(Long, Double)].head()
    assert(hit._2 >= 0.999999)
    weights.unpersist(); cents.unpersist()
  }
}
