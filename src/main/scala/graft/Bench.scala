package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query steady-state seconds.
  *
  * Each query runs once untimed (JIT + whole-stage-codegen compile,
  * shuffle file warmup) and once timed — the steady-state number is
  * what a resident cluster service would see; first-run plan compile
  * is a per-plan constant independent of data size. Set
  * SPARK_GRAFT_BENCH_COLD=1 to time single cold runs instead.
  */
object Bench {
  /** Artifact path: a name-filtered (local-iteration) run writes to a
    * side file by default so it never replaces the audited full-run
    * artifact; SPARK_GRAFT_BENCH_OUT overrides both. */
  def outPath(only: Set[String], env: String => Option[String]): String =
    env("SPARK_GRAFT_BENCH_OUT").getOrElse(
      if (only.isEmpty) "BENCH_LAST.json" else "BENCH_SUBSET.json")

  /** One-line JSON artifact. Millisecond precision keeps the stdout
    * line ~2.2 KB for 73 queries — the driver's stdout tail capture
    * truncated the r2/r3 full-precision line (~2.9 KB), leaving the
    * artifact unparseable. Locale.ROOT pins the decimal separator to
    * '.': the JVM-default locale can be comma-decimal (de_DE), which
    * would emit invalid JSON. */
  def jsonLine(results: Map[String, Double], sfDir: String): String = {
    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cold = sys.env.get("SPARK_GRAFT_BENCH_COLD").exists(v => v == "1" || v == "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args: bench only the named queries (local iteration)
    val only: Set[String] = args.toSet
    // benchOnlyQueries: production (xxhash-native) dedup paths — no
    // DuckDB oracle can replay them, but the bench must measure what
    // users run, not only the md5 oracle variants
    val results = (SparkEntry.queries ++ SparkEntry.benchOnlyQueries)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val r = try {
        if (!cold) {
          fn(spark, sfDir).count() // warm-up: codegen + JIT
          // min of two timed runs: single-shot numbers on a shared box
          // carry ±50% scheduler noise; the min is the reproducible
          // steady-state cost
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          name -> times.min
        } else {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        }
      } catch { case _: Throwable => name -> -1.0 }
      // queries that cache intermediates (minhash/simhash sigs) would
      // otherwise pin executor storage for the remaining ~70 queries —
      // the r3 artifact showed 3-5x "regressions" on late-running
      // queries that vanish when run in isolation. Evict between
      // queries so each is measured against an empty store.
      spark.catalog.clearCache()
      r
    }
    val json = jsonLine(results, sfDir)
    println(json)
    // the r2 artifact captured a truncated stdout line — persist the
    // full JSON so the recorded numbers are always auditable
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath(only, sys.env.get)), json)
    spark.stop()
  }
}
