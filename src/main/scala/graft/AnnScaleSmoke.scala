package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for similarity search over N hash-derived 64-dim
  * vectors (no driver state): exact brute-force top-10 for 100
  * queries, then the serving shape — build the cell-partitioned IVF
  * index ONCE (AnnIngest), probe the same 100 queries against it with
  * partition pruning. Reports brute vs build vs probe wall times and
  * probe recall against the brute ground truth. One JSON line →
  * BENCH_SCALE_ANN.json.
  */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val dir = java.nio.file.Files.createTempDirectory("ann-smoke").toString
    spark.range(rows).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), j -> CAST(pmod(xxhash64(id, j), 2000) / 1000.0 - 1.0 AS FLOAT))")
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/emb")
    val corpus = spark.read.parquet(s"$dir/emb")
    val queries = corpus.where(col("vec_id") < 100)
    // 256 cells / nprobe 40: finer quantization localizes neighbors so
    // a 15.6% scan fraction reaches ~full recall (r8 sweep: 64/8 =
    // 0.82, 64/16 = 0.90, 256/40 = 1.00 at 500k). Assignment cost
    // scales with cell count — a one-time, amortized build cost; probe
    // cost tracks the scanned fraction either way.
    val numCells = 256
    val nprobe = 40
    val centroids = corpus.where(col("vec_id") < numCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // warm-up (codegen + JIT) on a slice
    graft.ops.Ann.bruteTopK(corpus.where(col("vec_id") < 10000), queries,
      "vec_id", "embedding", 10).count()

    val (truth, tBrute) = time(pairs(
      graft.ops.Ann.bruteTopK(corpus, queries, "vec_id", "embedding", 10)))
    // serving shape: one-time cell-partitioned index build...
    val (_, tBuild) = time(graft.streaming.AnnIngest.processBatch(
      corpus, centroids, "vec_id", "embedding", s"$dir/ivf", "smoke", 0L))
    // ...then partition-pruned probes per query batch
    val (got, tProbe) = time(pairs(graft.streaming.AnnIngest.probe(
      spark, s"$dir/ivf", centroids, queries, "vec_id", "embedding",
      k = 10, nprobe = nprobe)))
    val recall = got.intersect(truth).size.toDouble / truth.size

    // semantic dedup at scale: inject 1% near-copies (source vector
    // + 0.0005 per component ⇒ cosine ≈ 1) and drop them with the
    // production xxhash bucket path. 16 planes ⇒ 65k buckets bound
    // within-bucket pair generation; a near-copy can still miss its
    // source's bucket when a hyperplane dot sits within ε of zero
    // (sign flip), so survivors land between rows and rows + nDup —
    // blocking recall is part of what this measures.
    val nDup = rows / 100
    val dups = spark.range(nDup).select((col("id") + rows).as("vec_id"),
      expr("transform(sequence(0, 63), j -> CAST(pmod(xxhash64(id, j), 2000) / 1000.0 - 1.0 + 0.0005 AS FLOAT))")
        .as("embedding"))
    val withDups = corpus.union(dups)
    val (nSurv, tSem) = time(graft.ops.Ann.semanticSurvivors(
      withDups, "vec_id", "embedding",
      threshold = 0.999, numPlanes = 16).count())
    require(nSurv >= rows && nSurv < rows + nDup,
      s"expected survivors in [$rows, ${rows + nDup}), got $nSurv")
    val dedupRecall = (rows + nDup - nSurv).toDouble / nDup

    // Locale.ROOT: a comma-decimal default locale would break the JSON
    def fmt(p: String, d: Double) = p.formatLocal(java.util.Locale.ROOT, d)
    val json =
      s"""{"metric":"ann_scale","rows":$rows,"dim":64,"queries":100,"k":10,""" +
      s""""brute_sec":${fmt("%.2f", tBrute)},"index_build_sec":${fmt("%.2f", tBuild)},""" +
      s""""probe_sec":${fmt("%.2f", tProbe)},"probe_recall":${fmt("%.3f", recall)},""" +
      s""""cells":$numCells,"nprobe":$nprobe,"semantic_dedup":{"corpus":${rows + nDup},""" +
      s""""injected_dups":$nDup,"survivors":$nSurv,""" +
      s""""dedup_recall":${fmt("%.3f", dedupRecall)},"sec":${fmt("%.2f", tSem)},""" +
      s""""planes":16,"threshold":0.999}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALE_ANN.json"), json)
    spark.stop()
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }
}
