package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus repeated-span removal — the C4 "any three-sentence
  * span occurring more than once in the corpus" rule and RefinedWeb's
  * line-level corpus dedup, re-expressed over fixed W-word windows so
  * the unit of dedup is segmentation-independent (the synthetic corpus
  * has no sentence punctuation; real corpora vary in it). Boilerplate
  * — navigation chrome, license headers, templated paragraphs — shows
  * up as the SAME span in MANY documents, and removing it document-
  * locally (not dropping whole docs) is what distinguishes this from
  * document-level dedup (ops/Dedup, ops/Similarity).
  *
  * Scale shape: the span table is ~|corpus|/W rows and aggregates by
  * span content with map-side partials; the hot-span set (distinct-doc
  * count ≥ minDocs) follows a Zipf tail and is orders of magnitude
  * smaller than the corpus, so the removal join is an AQE-broadcast
  * anti join at 100 TB — never corpus × corpus. Reassembly groups by
  * doc only (collect surviving spans, sort by position in-array). No
  * driver collects; nothing quadratic anywhere.
  *
  * Reference behavior: the duplicate-row / duplicate-business-key
  * scenarios of the validation reference (DM_bankfile_validate_pipeline
  * .py:2636,:2696) target whole records; this is the corpus-text
  * analogue used by LLM data pipelines (C4 §2.3, RefinedWeb §3.1.3).
  */
object SpanDedup {

  /** Tokens of `textCol`: case-preserving whitespace split, empty
    * tokens filtered (tab/newline edges survive Spark's space-only
    * trim — same guard as TextAnalysis.repetitionRatio). */
  private def toks(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** Explode `df` into non-overlapping `w`-word spans:
    * `(id, span_idx, span)`, span text joined with single spaces.
    * Short tails (< w words) form their own final span. */
  def spans(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    require(w > 0, s"span width $w must be positive")
    val tk = toks(col(textCol))
    // ceil(n/w) spans; empty docs produce one empty span, filtered below
    val nSpans = greatest(ceil(size(tk) / lit(w.toDouble)).cast("int"), lit(1))
    val arr = transform(sequence(lit(0), nSpans - 1),
      i => concat_ws(" ", slice(tk, i * w + 1, lit(w))))
    df.select(col(idCol).as("doc_id"),
        posexplode(arr).as(Seq("span_idx", "span")))
      .where(length(col("span")) > 0)
  }

  /** Remove every span whose DISTINCT-document count is ≥ `minDocs`
    * and reassemble the survivors in document order. `keepOne = true`
    * spares the single occurrence at (min doc_id, min span_idx) — the
    * C4 variant that keeps one copy of the repeated text; the default
    * removes all occurrences (RefinedWeb). Documents whose every span
    * was boilerplate drop out entirely (they carry no novel text).
    *
    * Output: `(doc_id, n_spans, cleaned)` — surviving span count and
    * the reassembled text.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int, minDocs: Long, keepOne: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    val sp = spans(df, idCol, textCol, w)
    // hot set: tiny vs the corpus (Zipf tail) → AQE broadcasts the join
    val hot = sp.groupBy("span")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("span_idx"))).as("keeper"))
      .where(col("n_docs") >= minDocs)
      .select(col("span"), col("keeper"))
    val kept =
      if (keepOne)
        sp.join(hot, Seq("span"), "left")
          .where(col("keeper").isNull ||
            (col("keeper.doc_id") === col("doc_id") &&
              col("keeper.span_idx") === col("span_idx")))
          .drop("keeper")
      else sp.join(hot, Seq("span"), "left_anti")
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span"))).as("cleaned"))
  }
}
