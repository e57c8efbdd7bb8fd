package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named queries to files — the
  * plans/r20 before/after evidence. Usage:
  *   tools/java_main.sh graft.tools.PlanDump <sfDir> <outDir> <suffix> q1 q2 ...
  * Writes <outDir>/<query>_<suffix>.txt. Planning only — no jobs
  * beyond what query CONSTRUCTION itself runs (driver-fold probes,
  * scratch-table builds).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnlyQueries
    names.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query: $name"))
      val plan = try fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      System.err.println(s"wrote $name")
    }
    spark.stop()
  }
}
