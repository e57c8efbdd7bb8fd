package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROUGE-N (Lin 2004) — clipped word-n-gram overlap between a
  * reference and a candidate text: the standard summarization /
  * generation eval metric, and in a data pipeline the pairwise
  * diagnostic that quantifies HOW MUCH two near-duplicate documents
  * share (MinHash/SimHash say "probably similar"; ROUGE counts the
  * actual overlapping n-grams on candidate pairs they emit).
  *
  * `n_match = Σ_g min(cnt_ref(g), cnt_cand(g))` (clipped counts, the
  * ROUGE/BLEU convention — a gram repeated 5× in the candidate but
  * 2× in the reference matches twice). Recall = n_match/n_ref is
  * ROUGE-N proper; precision and F1 derive from the same three
  * integers, so the operator returns the INTEGER counts and leaves
  * the division to the caller — exact cross-engine replay, no float
  * accumulation anywhere.
  *
  * Scale shape: n-gram generation is a narrow explode; per-side gram
  * counts combine map-side on (pair, gram); the clipped sum is one
  * join on (pair, gram) + one groupBy on pair. Cost is linear in
  * total text length — nothing is pairwise beyond the input pairs.
  */
object Rouge {

  /** Word n-grams of `textCol` (lowercased, whitespace-tokenized) as
    * an array column; docs shorter than `n` words yield an empty
    * array. Built by folding zip_with over n shifted slices — NOT
    * transform(sequence(...), i => element_at(toks, i)): a lambda
    * referencing the derived `toks` re-evaluates the tokenization per
    * ELEMENT after CollapseProject inlines it (O(len²) per doc);
    * slice arguments evaluate it O(n) times per row. */
  private[text] def wordNgrams(textCol: Column, n: Int): Column = {
    val toks = filter(split(lower(trim(textCol)), "\\s+"), t => length(t) > 0)
    if (n == 1) toks
    else {
      val len = greatest(size(toks) - (n - 1), lit(0))
      (1 until n).foldLeft(slice(toks, lit(1), len)) { (acc, j) =>
        zip_with(acc, slice(toks, lit(j + 1), len),
          (a, b) => concat_ws(" ", a, b))
      }
    }
  }

  /** Per-pair clipped n-gram overlap counts:
    * (idCol, n_ref, n_cand, n_match) — all longs.
    * ROUGE-N recall = n_match/n_ref, precision = n_match/n_cand,
    * F1 = 2·m/(n_ref+n_cand). Pairs whose reference AND candidate
    * both have fewer than `n` words report 0/0/0, not absence. */
  def rougeN(pairs: DataFrame, idCol: String, refCol: String,
      candCol: String, n: Int): DataFrame = {
    require(n > 0, s"n $n must be positive")
    val base = pairs.select(col(idCol), wordNgrams(col(refCol), n).as("_rg"),
      wordNgrams(col(candCol), n).as("_cg"))
    def sideCounts(gramsCol: String, cntName: String) =
      base.select(col(idCol), explode(col(gramsCol)).as("gram"))
        .groupBy(idCol, "gram").agg(count(lit(1)).as(cntName))
    val refCnt = sideCounts("_rg", "c_ref")
    val candCnt = sideCounts("_cg", "c_cand")
    val matched = refCnt.join(candCnt, Seq(idCol, "gram"))
      .groupBy(idCol)
      .agg(sum(least(col("c_ref"), col("c_cand"))).as("n_match"))
    base.select(col(idCol), size(col("_rg")).cast("long").as("n_ref"),
        size(col("_cg")).cast("long").as("n_cand"))
      .join(matched, Seq(idCol), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
  }
}
