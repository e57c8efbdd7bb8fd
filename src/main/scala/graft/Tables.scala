package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders for the driver-generated parquet at
  * /root/testdata/sf*. See TESTDATA.md.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark's vectorized
    * parquet reader only surfaces as raw long ns via
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP_MICROS (which
    * Spark reads as TimestampType or, when isAdjustedToUTC=false,
    * TimestampNTZType). Normalize either encoding to the contract every
    * downstream query and oracle assumes:
    *   - `ts`    LongType, exact nanoseconds since epoch (matches
    *             DuckDB's `epoch_ns(ts)` on either encoding)
    *   - `ts_us` TimestampType, microsecond instant
    * Integer `div` avoids the double-precision loss a `/ 1000` cast
    * would introduce on 1.7e18-scale nanos; the NTZ→TIMESTAMP cast is
    * exact because every graft session pins session.timeZone=UTC,
    * mirroring DuckDB's naive-timestamp-as-UTC reading of the file. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        raw
          .withColumn("ts_us", col("ts").cast("timestamp"))
          .withColumn("ts", expr("unix_micros(CAST(ts_us AS TIMESTAMP)) * 1000L"))
      case other =>
        sys.error(s"events.ts: unsupported parquet type $other")
    }
  }
}
