package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders for the driver-generated parquet at
  * /root/testdata/sf*. See TESTDATA.md.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries INT64 TIMESTAMP(NANOS) which Spark's vectorized
    * parquet reader rejects; read it as raw long ns
    * (spark.sql.legacy.parquet.nanosAsLong) and expose both the raw
    * `ts` (ns since epoch) and a proper `ts_us` TimestampType column.
    * Integer `div` avoids the double-precision loss a `/ 1000` cast
    * would introduce on 1.7e18-scale nanos. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
  }
}
