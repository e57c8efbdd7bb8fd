package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-scale byte-pair statistics — the counting core of BPE
  * tokenizer induction (Sennrich et al. 2016): the first merge step
  * ranks adjacent symbol pairs by corpus frequency, and at 100 TB that
  * count is the expensive part (each merge round's re-count is the
  * same shape over a rewritten vocabulary).
  *
  * Scale shape: the corpus collapses to its DISTINCT word frequency
  * table first (Zipf: |vocab| ≪ |tokens|, typically 10⁵–10⁷ rows for
  * any corpus size), so the per-character pair explosion runs over the
  * vocabulary, not the corpus — the trick every BPE trainer uses, here
  * as a two-stage mergeable aggregation. Pair counts weight by word
  * frequency; everything is string equality + integer sums, so any
  * engine replays it exactly. Top-k via orderBy+limit = TakeOrdered
  * (map-side partial top-k, no global sort).
  */
object Bpe {

  /** Word-frequency table `(word, freq)` of the case-folded,
    * whitespace-split corpus. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The `topK` most frequent adjacent character pairs across the
    * corpus, occurrences weighted by word frequency (a word containing
    * a pair twice contributes twice its frequency). Deterministic
    * order: count desc, then pair asc. Output `(pair, n_pairs)`. */
  def topPairs(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    val wf = wordFreq(docs, textCol)
    val pairs = wf
      .where(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
    pairs.groupBy("pair").agg(sum("freq").as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("pair").asc)
      .limit(topK)
  }
}
