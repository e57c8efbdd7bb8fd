package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT thresholded all-pairs cosine similarity over hashed TF-IDF
  * vectors — the third leg of the near-dup stool: n-gram indexes give
  * exact set overlap, MinHash/SimHash give approximate pairs at any
  * scale, and this gives exact WEIGHTED cosine ≥ t without comparing
  * corpus² — the prefix-filtering principle of Bayardo, Ma & Srikant,
  * "Scaling Up All Pairs Similarity Search" (WWW 2007).
  *
  * The pruning: order features canonically (ascending corpus max
  * normalized weight, then bucket id). For each doc, walk its features
  * in that order accumulating b = Σ nw(f)·maxw(f); features seen while
  * b < t CANNOT on their own witness a ≥ t pair (the sum bounds any
  * partner's contribution), so only features from the point b reaches
  * t onward are indexed. A valid pair must share an INDEXED feature of
  * each side, so candidates = index(a) ⋈ full(b) — typically orders of
  * magnitude fewer than all shared-feature pairs. Pruning is
  * RESULT-TRANSPARENT: candidates are verified with the exact dot
  * product, so output pairs are exactly {(a,b) : cos(a,b) ≥ t} — which
  * is why the DuckDB oracle can be a brute-force replay.
  *
  * Scale shape: per-doc prefix selection is one window over the doc's
  * own ≤dim features (partitioned by doc — no global sort); the
  * candidate join keys on feature buckets where at least one side is
  * prefix-thinned; verification joins only candidate pairs. Weights
  * are the integer 1e-4 TF-IDF partials (TfIdf.hashedTfIdf), so dot
  * products are exact integer sums and the quantized cosine compares
  * identically in any engine.
  */
object AllPairs {

  /** Pairs `(id1, id2, cos_q)` with quantized cosine
    * `cos_q = floor(10⁴ · dot/(‖a‖·‖b‖)) ≥ floor(10⁴·threshold)`,
    * id1 < id2. `replayable` picks the md5 bucket hash (oracle) vs
    * xxhash64 (production) in the underlying TF-IDF.
    *
    * Boundary caveat: the dot product is an exact integer sum, but
    * the final norm division runs in doubles — a cosine landing
    * EXACTLY on a 1e-4 quantization edge can floor to either side by
    * one ulp across engines. The candidate-pruning bound is epsilon-
    * padded below so pruning never loses such a pair; only its cos_q
    * value carries the 1-ulp caveat.
    *
    * @param maxDf skew escape hatch: buckets held by more than this
    *   many docs are excluded from CANDIDATE GENERATION (the bound
    *   walk and the index), though surfaced pairs are still verified
    *   with the full exact dot product. With the cap on, a pair whose
    *   similarity rests mostly on a capped hot feature can be missed —
    *   the same documented recall trade as the inverted-index caps in
    *   [[Similarity]]. 0 (default) disables the cap: results are
    *   exactly {(a,b) : cos(a,b) ≥ t}. The cap exists because one
    *   near-universal high-weight feature (a spam token that dominates
    *   even a single doc pushes its corpus-max normalized weight to
    *   ~1, sorting it LAST — i.e. indexed in every doc) turns the
    *   candidate join quadratic; threshold pruning alone cannot bound
    *   that (AllPairsSpec pins the capped behavior). */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
      dim: Int, threshold: Double, replayable: Boolean = false,
      maxDf: Long = 0L): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold outside (0,1]")
    val tf = graft.text.TfIdf.hashedTfIdf(docs, idCol, textCol, dim, replayable)
    val norms = tf.groupBy("doc_id")
      .agg(sum(col("w_q") * col("w_q")).as("n2"))
    // candidate-generation feature set: full tf, minus hot buckets
    // when the cap is on (broadcast anti join on the tiny hot list —
    // the same shape as Similarity's maxDf cap)
    val tfCand = if (maxDf > 0) {
      val hot = tf.groupBy("bucket").agg(count(lit(1)).as("df"))
        .where(col("df") > maxDf).select("bucket")
      tf.join(broadcast(hot), Seq("bucket"), "left_anti")
    } else tf
    // normalized weights drive the bound only — exactness never
    // depends on them (norms stay full-vector even under the cap)
    val nw = tfCand.join(norms, "doc_id")
      .select(col("doc_id"), col("bucket"), col("w_q"),
        (col("w_q") / sqrt(col("n2"))).as("nw"))
    val maxw = nw.groupBy("bucket").agg(max("nw").as("mw"))
    val ordered = nw.join(maxw, "bucket")
    // inclusive running bound in canonical (mw asc, bucket asc) order;
    // indexed ⇔ bound has reached the threshold
    val wnd = Window.partitionBy("doc_id").orderBy(col("mw").asc, col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = ordered.withColumn("b", sum(col("nw") * col("mw")).over(wnd))
    // the bound is evaluated in floating point: back the pruning
    // threshold off by an epsilon so a pair sitting exactly on the
    // boundary can never be lost to a 1-ulp rounding difference —
    // candidates only GROW (result-transparent); the exact integer
    // dot product downstream still decides membership
    val idx = flagged.where(col("b") >= threshold - 1e-9).select("doc_id", "bucket")
    // index ⋈ index, not index ⋈ full postings: for any pair with
    // cos ≥ t, its GLOBALLY-LAST shared feature f* must be indexed on
    // BOTH sides — if f* fell before doc x's cut, every shared feature
    // would sit in x's unindexed head and the head bound Σ nw·mw < t
    // would cap the whole dot product below t. (The standard
    // prefix-filtering completeness argument, cf. PPJoin.) Joining the
    // two prefix-thinned sides is therefore still result-transparent
    // while generating strictly fewer candidates than idx ⋈ full.
    val cand = idx.as("a")
      .join(idx.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    // exact integer dot product over the candidates only
    val dot = cand
      .join(tf.select(col("doc_id").as("id1"), col("bucket"),
        col("w_q").as("w1")), Seq("id1"))
      .join(tf.select(col("doc_id").as("id2"), col("bucket"),
        col("w_q").as("w2")), Seq("id2", "bucket"))
      .groupBy("id1", "id2").agg(sum(col("w1") * col("w2")).as("dot"))
    dot
      .join(norms.select(col("doc_id").as("id1"), col("n2").as("n21")), "id1")
      .join(norms.select(col("doc_id").as("id2"), col("n2").as("n22")), "id2")
      .select(col("id1"), col("id2"),
        floor(col("dot") / (sqrt(col("n21")) * sqrt(col("n22"))) * 10000)
          .cast("long").as("cos_q"))
      .where(col("cos_q") >= math.floor(threshold * 10000).toLong)
  }
}
