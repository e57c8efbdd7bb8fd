package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column type inference over string-typed feeds — the schema-
  * suggestion pass a CSV/fixed-width ingestion runs before declaring
  * a schema (the reference's feeds arrive untyped; [[SchemaCheck]]
  * then validates against the DECLARED schema, this suggests one):
  * per column, count values parseable as bigint / double / date /
  * boolean via `try_cast` (ANSI-safe, never throws), and suggest the
  * narrowest type every non-null value fits.
  *
  * Scale shape: one pass, one narrow projection per column feeding a
  * single global aggregate (map-side partials) — column count scales
  * the projection width, never the pass count. Output is
  * columns-sized. */
object SchemaInfer {

  /** (column, n_rows, n_null, n_bigint, n_double, n_date, n_boolean,
    * suggested) for every string column of `df` (non-string columns
    * are ignored — they are already typed). */
  def inferColumnTypes(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name)
    require(cols.nonEmpty, "no string columns to infer")
    val aggs = cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(v.isNull || trim(v) === "", 1L).otherwise(0L)).as(s"${c}__null"),
        sum(when(expr(s"try_cast(`$c` AS BIGINT)").isNotNull, 1L).otherwise(0L))
          .as(s"${c}__long"),
        sum(when(expr(s"try_cast(`$c` AS DOUBLE)").isNotNull, 1L).otherwise(0L))
          .as(s"${c}__double"),
        // full y-m-d shape required ON TOP of the cast: Spark's
        // lenient stringToDate accepts bare 4-digit years, which would
        // claim every column of 4-digit integers as a date column
        sum(when(expr(s"try_cast(`$c` AS DATE)").isNotNull &&
            trim(v).rlike("^[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}$"), 1L)
          .otherwise(0L)).as(s"${c}__date"),
        sum(when(lower(trim(v)).isin("true", "false"), 1L).otherwise(0L))
          .as(s"${c}__bool"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      wide.select(lit(c).as("column"),
        col(s"${c}__n").as("n_rows"), col(s"${c}__null").as("n_null"),
        col(s"${c}__long").as("n_bigint"), col(s"${c}__double").as("n_double"),
        col(s"${c}__date").as("n_date"), col(s"${c}__bool").as("n_boolean"))
    }.reduce(_ unionAll _)
    val nonNull = col("n_rows") - col("n_null")
    stacked.withColumn("suggested",
      when(nonNull === 0, "string")
        .when(col("n_boolean") === nonNull, "boolean")
        .when(col("n_bigint") === nonNull, "bigint")
        .when(col("n_double") === nonNull, "double")
        .when(col("n_date") === nonNull, "date")
        .otherwise("string"))
  }
}
