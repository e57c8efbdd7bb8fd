package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for the named
  * queries (or all of them) so shuffle/broadcast/pushdown shape can be
  * reviewed per round. Usage:
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    // the tuned front-door session — audited plans must be the plans
    // the engine actually produces (AQE, skew handling, extensions)
    val spark = GraftSession.local(8, "graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      println(s"===== $q =====")
      SparkEntry.queries.get(q) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query '$q' — known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      }
    }
    spark.stop()
  }
}
