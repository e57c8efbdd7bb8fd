package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Cross-document line/paragraph deduplication (the CCNet move:
  * Wenzek et al. 2020 dedup repeated paragraphs across the crawl
  * before any model-based filter; C4 similarly drops repeated lines).
  * Web boilerplate — cookie banners, nav menus, footers — is the bulk
  * of a crawl's duplicated text and lives INSIDE documents, where
  * whole-doc dedup cannot see it.
  *
  * [[dedupLines]] splits every doc on `sep`, counts each distinct
  * trimmed line's document frequency across the WHOLE corpus, drops
  * lines with df ≥ `minDf` (every occurrence, or all-but-first with
  * `keepFirst`), and reassembles each doc's surviving lines in their
  * original order.
  *
  * Scale shape: three shuffles, all narrow in payload — (1) the df
  * count groups on the line's md5, shuffling (key, id) pairs only;
  * (2) the verdict join shuffles lines once on the same key (the
  * stats side carries 16-byte digests + counts, no line text);
  * (3) reassembly groups by doc id. Line text crosses the wire twice,
  * the unavoidable minimum for an order-preserving rewrite. No
  * driver-side state, no windows over the whole corpus.
  */
object LineDedup {

  /** @param minDf     a line occurring in at least this many DISTINCT
    *                   docs is boilerplate; ≥ 2 = any cross-doc dup
    * @param keepFirst  keep the single occurrence with the smallest
    *                   (id, position) instead of dropping all
    * @return input columns with `textCol` rewritten to the surviving
    *         lines (empty string when none survive) plus
    *         `n_lines_kept` / `n_lines_dropped` */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n", minDf: Int = 2,
                 keepFirst: Boolean = false): DataFrame = {
    require(minDf >= 2, "minDf < 2 would drop every line")
    val lines = df
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), sep)).as(Seq("_pos", "_line")))
      .withColumn("_key", md5(trim(col("_line"))))
    val stats = lines.groupBy("_key").agg(
      countDistinct(col("_id")).as("_df"),
      min(struct(col("_id").as("id"), col("_pos").as("pos"))).as("_first"))
    val verdict: Column =
      if (keepFirst)
        col("_df") < minDf ||
          (col("_first.id") === col("_id") && col("_first.pos") === col("_pos"))
      else col("_df") < minDf
    val kept = lines.join(stats, "_key").where(verdict)
    val reassembled = kept.groupBy("_id").agg(
      concat_ws(sep, expr(
        "transform(array_sort(collect_list(struct(_pos, _line))), x -> x._line)"))
        .as("_newtext"),
      count(lit(1)).as("n_lines_kept"))
    val total = df.select(col(idCol).as("_id"),
      size(split(col(textCol), sep)).as("_n_total"))
    df.join(reassembled.withColumnRenamed("_id", idCol), Seq(idCol), "left")
      .join(total.withColumnRenamed("_id", idCol), Seq(idCol))
      .withColumn(textCol, coalesce(col("_newtext"), lit("")))
      .withColumn("n_lines_kept", coalesce(col("n_lines_kept"), lit(0L)))
      .withColumn("n_lines_dropped", col("_n_total") - col("n_lines_kept"))
      .drop("_newtext", "_n_total")
  }
}
