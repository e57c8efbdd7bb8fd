package graft

import org.apache.spark.sql.SparkSession

/** Streaming end-to-end scale probe: the reference's full ETL loop
  * (file lands → validate → route valid/error,
  * DM_bankfile_validate_pipeline.py run_full_etl_pipeline shape) as
  * EventStreams.validateAndRoute over 1 M-row file-drop batches.
  * Measures per-micro-batch latency from the engine's own progress
  * metrics — the claim under test is that per-batch cost is STABLE
  * across batches (no state growth, no lineage growth: each batch
  * validates in one codegen'd projection and lands via dynamic-
  * partition overwrite) so the pipeline runs indefinitely at any
  * rate × batch count. One JSON line → BENCH_SCALE_STREAM.json.
  */
object StreamScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = if (args.nonEmpty) args(0).toLong else 1000000L
    val nBatches = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    val root = java.nio.file.Files.createTempDirectory("stream-scale").toString
    val drop = s"$root/drop"
    // three 1 M-row file drops, each FILES_PER_BATCH part files so
    // maxFilesPerTrigger carves exactly one drop per micro-batch;
    // ~1% of rows get an enum-invalid RecordOperation so the error
    // route actually carries traffic (the generator's defaults are
    // all-valid)
    val filesPerBatch = 4
    (0 until nBatches).foreach { i =>
      import org.apache.spark.sql.functions.{col, lit, pmod, when}
      graft.bank.BankDataGen.generate(spark, rowsPerBatch, seed = 100 + i)
        .withColumn("RecordOperation",
          when(pmod(col("id"), lit(100)) === 0, lit("X"))
            .otherwise(col("RecordOperation")))
        .coalesce(filesPerBatch)
        .write.mode("append").parquet(drop)
    }
    val schema = spark.read.parquet(drop).schema

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerBatch.toString)
      .parquet(drop)
    val q = graft.streaming.EventStreams.validateAndRoute(
      stream, graft.bank.BankRules.all, "PayeeID",
      s"$root/valid", s"$root/errors", s"$root/ckpt")
    q.awaitTermination()

    val progress = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
    val batchSecs = progress.map(_.durationMs.get("triggerExecution").toLong / 1000.0)
    val rowsPerSec = progress.map(p =>
      p.numInputRows / (p.durationMs.get("triggerExecution").toLong / 1000.0))
    require(batchSecs.size == nBatches,
      s"expected $nBatches non-empty micro-batches, saw ${batchSecs.size}")
    val validRows = spark.read.parquet(s"$root/valid").count()
    val errorRows = spark.read.parquet(s"$root/errors").count()
    require(validRows + errorRows == rowsPerBatch * nBatches,
      s"routed ${validRows + errorRows} of ${rowsPerBatch * nBatches} rows")

    val flat = batchSecs.max / batchSecs.min
    println(s"STREAM batches=${batchSecs.map(fmt).mkString(", ")} s " +
      s"(max/min ${fmt(flat)}); valid=$validRows error=$errorRows")
    val json =
      s"""{"metric":"stream_scale","rows_per_batch":$rowsPerBatch,""" +
      s""""batches":$nBatches,"batch_secs":[${batchSecs.map(fmt).mkString(",")}],""" +
      s""""rows_per_sec":[${rowsPerSec.map(v => fmt(v)).mkString(",")}],""" +
      s""""batch_max_over_min":${fmt(flat)},"valid_rows":$validRows,"error_rows":$errorRows}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SCALE_STREAM.json"), json)
    spark.stop()
    // 3M generated rows + routed copies + checkpoint — clean up /tmp
    new scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
  }
}
