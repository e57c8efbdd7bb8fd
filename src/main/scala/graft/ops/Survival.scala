package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event analysis — Kaplan-Meier survival and the
  * Nelson-Aalen cumulative hazard, the right tool for every
  * "how long until users convert / churn / documents get re-crawled"
  * question where some subjects haven't converted YET (censoring —
  * the thing a naive mean-of-converted-durations silently gets
  * wrong).
  *
  * Engine-reproducible: the life table (at-risk counts, events,
  * censorings per distinct duration) is exact integer arithmetic over
  * a duration histogram (never a per-subject sort), and the
  * Nelson-Aalen hazard is reported as an EXACT integer —
  * `Σ round(d/n·10⁹)` — in 10⁻⁹ units. The KM curve itself needs a
  * running product, computed as exp of the cumulative sum of
  * integer-quantized log terms: the only cross-engine exposure is
  * ln/exp's last ulp against a 10⁻⁶ floor (the same accepted band as
  * the Zipf/Adamic-Adar logs).
  *
  * Scale shape: one histogram aggregate + one ordered window over
  * DISTINCT durations (bounded by the duration domain, not subjects).
  */
object Survival {

  /** Life table per distinct duration. Input: `durationCol` (integral
    * time units), `eventCol` (true = event observed, false = censored
    * at that duration). Output per duration t, ascending:
    * `(t, n_risk, d, c, na_h9, km6)` — n_risk = subjects with
    * duration >= t; d/c = events/censorings at t; na_h9 = exact
    * Nelson-Aalen hazard in 1e-9 units; km6 = KM survival floored to
    * 1e-6. */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String): DataFrame = {
    val hist = df.select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("e"))
      .where(col("t").isNotNull && col("e").isNotNull)
      .groupBy("t")
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("e"), 0L).otherwise(1L)).as("c"))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risky = hist
      .withColumn("_gone", sum(col("d") + col("c")).over(w))
      .withColumn("_tot", sum(col("d") + col("c")).over(
        Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n_risk", col("_tot") - col("_gone") + col("d") + col("c"))
    risky
      .withColumn("na_h9", sum(when(col("d") > 0,
        round(col("d").cast("double") / col("n_risk").cast("double")
          * 1000000000L).cast("long")).otherwise(0L)).over(w))
      // n_risk == d would be ln(0) = -inf (ANSI cast explosion): a
      // finite -100 in ln units already underflows exp to 0 exactly
      .withColumn("_ln9", sum(
        when(col("d") > 0 && col("n_risk") === col("d"),
          lit(-100000000000L))
        .when(col("d") > 0,
          round(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * 1000000000L).cast("long"))
        .otherwise(0L)).over(w))
      .select(col("t"), col("n_risk"), col("d"), col("c"), col("na_h9"),
        (floor(exp(col("_ln9").cast("double") / 1000000000.0) * 1000000)
          / 1000000).as("km6"))
  }
}
