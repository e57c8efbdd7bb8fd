package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftMonitorSpec extends SparkSpec {

  private def pop(shift: Int, aFrac: Int) =
    spark.range(2000).select(
      (col("id") % 100 + shift).cast("double").as("x"),
      when(col("id") % 4 < aFrac, "a").otherwise("b").as("cat"))

  test("per-batch drift metrics flag shifted batches only") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val metrics = s"$dir/metrics"
    val baseline = pop(0, 1)

    // batch 0: same population → no drift
    DriftMonitor.processBatch(pop(0, 1), baseline, Seq("x"), Seq("cat"),
      metrics, "run1", 0L, 10)
    // batch 1: shifted numeric + flipped category mix → drift on both
    DriftMonitor.processBatch(pop(60, 3), baseline, Seq("x"), Seq("cat"),
      metrics, "run1", 1L, 10)

    val m = spark.read.parquet(metrics)
      .select("batch_id", "col_name", "metric", "drifted").collect()
      .map(r => (r.get(0).toString.toLong, r.getString(1)) -> (r.getString(2), r.getBoolean(3)))
      .toMap
    assert(m.size === 4)
    assert(m((0L, "x")) === ("psi", false))
    assert(m((0L, "cat")) === ("tvd", false))
    assert(m((1L, "x")) === ("psi", true))
    assert(m((1L, "cat")) === ("tvd", true))

    // retry of batch 1 is idempotent
    DriftMonitor.processBatch(pop(60, 3), baseline, Seq("x"), Seq("cat"),
      metrics, "run1", 1L, 10)
    assert(spark.read.parquet(metrics).count() === 4)
  }

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    pop(60, 1).write.mode("append").parquet(drop)

    val stream = spark.readStream.schema("x DOUBLE, cat STRING").parquet(drop)
    val q = DriftMonitor.start(stream, pop(0, 1), Seq("x"), Seq("cat"),
      s"$dir/metrics", s"$dir/ckpt")
    try q.awaitTermination(60000) finally q.stop()

    val rows = spark.read.parquet(s"$dir/metrics")
    assert(rows.where(col("col_name") === "x" && col("drifted")).count() === 1)
    assert(rows.where(col("col_name") === "cat" && !col("drifted")).count() === 1)
  }
}
