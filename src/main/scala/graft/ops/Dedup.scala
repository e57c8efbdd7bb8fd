package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Reference scenarios: full-row duplicate
  * (DM_bankfile_validate_pipeline.py:2636 run_duplicate_row_scenario)
  * and duplicate business key (:2696 run_duplicate_payee_id_scenario).
  * Generalized here to scale-ready groupBy/window forms: one hash
  * shuffle on the dedup key, partial-aggregated map-side; no driver
  * materialization, no cross joins.
  */
object Dedup {

  /** Exact content dedup groups: one row per distinct content hash with
    * the surviving (minimum) id and the duplicate count. Keep-min is
    * deterministic under retries — at 100 TB this is a single
    * partial-aggregable groupBy on a 128-bit hash (collision odds
    * negligible; no need to shuffle full payloads). */
  def exactGroups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol).cast("string")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Input rows minus exact duplicates (keeps the min-id row of each
    * content group). Implemented as a window rank rather than a
    * self-join: one shuffle, no second scan. */
  def dropExact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(contentCol).cast("string")))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Exact dedup keeping the BEST copy per content group instead of
    * the min-id copy — the curation knob real pipelines want once a
    * quality signal exists (duplicates differ in extraction quality:
    * keep the cleanest, not the first-crawled). Survivor = max
    * `scoreCol`, ties broken by MIN `idCol` so the choice is
    * deterministic and engine-replayable.
    *
    * Shape: one groupBy on the content hash with a min(struct) — the
    * payload rides the aggregate, so map-side partials collapse
    * duplicate-heavy partitions before the shuffle (strictly better
    * than the row_number window under heavy duplication, same
    * otherwise). Null scores lose to every non-null score. */
  def dropExactPreferring(df: DataFrame, contentCol: String, idCol: String,
                          scoreCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    // min over (−score, id): smallest −score = largest score, then
    // smallest id; null score → +Infinity, losing to any real score
    val ranked = struct(
      (-coalesce(col(scoreCol).cast("double"),
        lit(Double.NegativeInfinity))).as("ns"),
      col(idCol).as("i"), payload.as("p"))
    df.groupBy(md5(col(contentCol).cast("string")).as("__h"))
      .agg(min(ranked).as("b"))
      .select(col("b.p.*"))
  }

  /** Keep exactly the min-`idCol` row per `key`, in ONE pass: a
    * codegen'd `min(struct(id, payload))` aggregate — the k=1 form of
    * [[dropExactPreferring]]'s shape. The alternatives both pay more:
    * the groupBy+semi-join form executes the input SUBTREE twice (in
    * a composed pipeline each dedup level doubles every upstream
    * operator — stripHtml/fingerprint ran up to 4× in the crawl
    * pipeline), and the window form sorts whole partitions with no
    * map-side reduction. Here map-side partials collapse duplicate-
    * heavy partitions before the shuffle, which carries one struct per
    * (key × task). `idCol` must be unique (the struct comparison then
    * never reaches the payload) and payload column types orderable. */
  def keepFirstPerKey(df: DataFrame, key: org.apache.spark.sql.Column,
                      idCol: String): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(key.as("__k"))
      .agg(min(struct(col(idCol).as("i"), payload.as("p"))).as("b"))
      .select(col("b.p.*"))
  }

  /** Keys appearing more than once — the duplicate-PayeeID check. */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .where(col("dup_count") > 1)

  /** Fully-duplicated rows (every column identical) with multiplicity —
    * the duplicate-row scenario. Hashes the whole row so the shuffle
    * carries (hash, count), not payloads. */
  def duplicateRows(df: DataFrame): DataFrame = {
    // JSON-encode (field names + explicit nulls) before hashing: an
    // unambiguous encoding, unlike concat_ws, whose null-skipping makes
    // ("a",null) and (null,"a") collide.
    val rowJson = to_json(struct(df.columns.map(col): _*),
      Map("ignoreNullFields" -> "false"))
    df.groupBy(md5(rowJson).as("row_hash"))
      .agg(count(lit(1)).as("dup_count"))
      .where(col("dup_count") > 1)
  }
}
