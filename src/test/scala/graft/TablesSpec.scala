package graft

import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration: the round driver
  * rewrites /root/testdata between rounds and physical parquet types
  * have changed across regenerations (events.ts shipped as INT64
  * TIMESTAMP(NANOS) through r8, TIMESTAMP_MICROS from r9 — the r9
  * regression that took down 15 queries). These tests pin the LOADER
  * CONTRACT against the live files, so the next silent re-encode
  * fails here with a readable message instead of failing 15 oracle
  * queries at verify time. */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("events loader normalizes the live testdata to ts=long-nanos + ts_us=timestamp") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val ev = Tables.events(spark, sfDir)
    val types = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ts") == LongType,
      s"events.ts must normalize to long nanos; got ${types("ts")} — " +
        "did the driver re-encode events.parquet again? Extend Tables.events.")
    assert(types("ts_us") == TimestampType)
    // value sanity: ts is nanos (2020s epochs are ~1.7e18) and agrees
    // with ts_us to the microsecond
    val row = ev.selectExpr(
      "min(ts)", "max(abs(ts - unix_micros(ts_us) * 1000))").head()
    assert(row.getLong(0) > 1500000000L * 1000000000L,
      s"events.ts magnitude ${row.getLong(0)} is not nanoseconds-since-epoch")
    assert(row.getLong(1) == 0L, "ts and ts_us disagree")
  }

  test("all testdata tables load with their TESTDATA.md column sets") {
    assume(new java.io.File(sfDir).exists())
    val expected = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    expected.foreach { case (name, cols) =>
      val df = if (name == "events") Tables.events(spark, sfDir)
        else Tables.load(spark, sfDir, name)
      assert(cols.subsetOf(df.columns.toSet),
        s"$name: missing ${cols -- df.columns.toSet} — testdata schema drifted")
      assert(df.limit(1).count() == 1, s"$name: empty or unreadable")
    }
  }
}
