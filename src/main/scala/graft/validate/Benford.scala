package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benford's-law first-digit audit (Newcomb 1881 / Benford 1938; the
  * forensic-accounting staple, Nigrini 1996) — naturally-occurring
  * multiplicative quantities (amounts, populations, file sizes) lead
  * with digit d at frequency log₁₀(1+1/d); fabricated, capped,
  * assigned, or truncated columns don't. The distribution-level fraud/
  * synthetic-data smell test beside the row-level rule engine.
  *
  * Engine-reproducible: the first digit comes from the DECIMAL STRING
  * of a positive BIGINT (both engines print integers identically —
  * never from float formatting), shares close as exact-int ratios
  * floored to 10⁻⁶, and the expected shares are pinned
  * floor(log₁₀(1+1/d)·10⁶)/10⁶ doubles of literal digits. Deviation
  * subtracts two already-quantized grid doubles — same operands, same
  * result anywhere.
  *
  * Scale shape: one narrow projection + one 9-group aggregate. */
object Benford {

  /** First significant digit (1-9) of a positive integral column;
    * NULL for values < 1. */
  def firstDigit(v: Column): Column =
    when(v >= 1, substring(v.cast("long").cast("string"), 1, 1).cast("int"))

  /** Per-digit audit of `valueCol` (positive integral — quantize
    * amounts to cents upstream): 9 rows
    * (digit, n, share, expected_share, abs_dev). MAD (mean abs_dev,
    * Nigrini's conformity stat: < 0.006 close, > 0.015 nonconform)
    * is one `avg(abs_dev)` away. */
  def audit(df: DataFrame, valueCol: String): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val digits = (1 to 9).map(d =>
      (d, math.floor(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6))
    val expected = digits.map { case (d, e) =>
      when(col("digit") === d, e)
    }.reduceRight((a, b) => a.otherwise(b))
    df.select(firstDigit(col(valueCol)).as("digit"))
      .where(col("digit").isNotNull)
      .groupBy("digit")
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        (floor(col("n").cast("double") / sum("n").over(tot) * 1000000)
          / 1000000).as("share"))
      .select(col("digit"), col("n"), col("share"),
        expected.as("expected_share"))
      .select(col("digit"), col("n"), col("share"), col("expected_share"),
        abs(col("share") - col("expected_share")).as("abs_dev"))
  }
}
