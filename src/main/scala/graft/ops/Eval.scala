package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classifier evaluation over a scored frame — the measurement
  * half of the quality-filter loop (train a filter [graft.text.LogReg] /
  * [graft.text.NbClassifier], SCORE the corpus, then decide the
  * threshold from these curves before gating ingest on it). The
  * reference's pipeline stops at pass/fail error counts
  * (DM_bankfile_validate_pipeline.py error-compare region); a
  * training-data pipeline additionally needs ranking metrics, because a
  * corpus filter is a THRESHOLD choice, not a fixed rule.
  *
  * Scale shape: every metric here reduces the corpus ONCE by
  * (score [, label]) — the shuffle carries one row per DISTINCT score,
  * not per example. The only ordered structure is a window over that
  * distinct-score frame, which is orders of magnitude smaller than the
  * corpus. `digits` bounds that frame at ~10^digits rows and DEFAULTS
  * to 6 (matching the suite's own 6-digit output quantization): a
  * genuinely continuous score column must not turn the single
  * `Window.orderBy` into a corpus-sized one-task funnel by default.
  * Pass `digits = -1` to opt out when scores are known-discrete and
  * the raw values must appear verbatim. Nothing per-example ever
  * sorts globally.
  *
  * Determinism contract (what lets DuckDB replay these bit-exactly):
  * every cumulative/aggregate runs in EXACT integer arithmetic
  * (counts, doubled counts for the tie term, floor-quantized score
  * sums) and division happens once, at the end, on exact operands,
  * then floor-quantizes to 6 digits. A float cumsum would differ by
  * summation order across partitions; an integer one cannot. */
object Eval {

  private def r6(c: Column): Column = floor(c * 1e6) / 1e6

  /** Exact-int ratio floor-quantized to 6 digits; NULL (not Inf/NaN —
    * Spark doubles follow Java, DuckDB follows IEEE, and the engines
    * disagree on rendering them) when the denominator is zero:
    * single-class corpora, thresholds above every score. */
  private def ratio6(num: Column, den: Column): Column =
    when(den =!= 0, r6(num.cast("double") / den))

  /** Per-distinct-score grouped counts: (score, pos, neg). The
    * digits-bound uses round(), NOT floor(score·10^d)/10^d: round is
    * an exact IDENTITY on scores already quantized to <= digits
    * decimals (the suite contract — upstream scores are 4-6 digit),
    * while the floor form drops a half-ulp below ~1% of exact decimal
    * inputs (0.0007·10⁶ = 699.999…), silently desyncing the reported
    * score from an oracle that groups raw values. */
  private def grouped(df: DataFrame, scoreCol: String, labelCol: String,
                      digits: Int): DataFrame = {
    val s = if (digits >= 0) round(col(scoreCol), digits)
            else col(scoreCol)
    df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(s.as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
           (count(lit(1)) - sum(col(labelCol).cast("long"))).as("neg"))
  }

  /** ROC + PR points, one row per distinct score, descending-threshold
    * semantics: a row's tp/fp are the example counts with
    * score >= that row's score (predict-positive at that cut). tpr,
    * fpr, precision, recall are exact-int ratios floor-quantized to 6
    * digits. */
  def rocPoints(df: DataFrame, scoreCol: String, labelCol: String,
                digits: Int = 6): DataFrame = {
    val g = grouped(df, scoreCol, labelCol, digits)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("score"),
        sum("pos").over(w).as("tp"), sum("neg").over(w).as("fp"),
        sum("pos").over(tot).as("np"), sum("neg").over(tot).as("nn"))
      .select(col("score"), col("tp"), col("fp"),
        ratio6(col("tp"), col("np")).as("tpr"),
        ratio6(col("fp"), col("nn")).as("fpr"),
        ratio6(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio6(col("tp"), col("np")).as("recall"))
  }

  /** Tie-corrected AUC (Mann-Whitney), exact until the final division:
    * ascending over distinct scores, each score's positives earn
    * (negatives strictly below) + (ties at the score)/2 — doubled to
    * stay integral, so the BIGINT cumsum is order-independent. Returns
    * one row: (auc, n_pos, n_neg). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
          digits: Int = 6): DataFrame = {
    val g = grouped(df, scoreCol, labelCol, digits)
    val below = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    g.select(col("pos"), col("neg"),
        coalesce(sum("neg").over(below), lit(0L)).as("negBelow"))
      .agg(sum(col("pos") * (col("negBelow") * 2 + col("neg"))).as("num2"),
           sum("pos").as("np"), sum("neg").as("nn"))
      .select(ratio6(col("num2"), col("np") * col("nn") * 2).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** Reliability bins over [0,1] scores: bin b covers
    * [b/bins, (b+1)/bins) with score 1.0 folded into the top bin.
    * mean_score runs on floor(score·10^6) BIGINT partials (exact in
    * any sum order), pos_rate on counts; both floor-quantized to 6.
    * One groupBy — rows out = bins. */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val b = least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("long")
    df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
           sum(col(labelCol).cast("long")).as("n_pos"),
           sum(floor(col(scoreCol) * 1e6).cast("long")).as("sq"))
      .select(col("bin"), col("n"), col("n_pos"),
        ratio6(col("n_pos"), col("n")).as("pos_rate"),
        r6(col("sq").cast("double") / col("n") / 1e6).as("mean_score"))
  }

  /** Brier score with Murphy's (1973) three-way decomposition over
    * the calibration bins: brier = reliability − resolution +
    * uncertainty (up to binning/quantization granularity) — the
    * single frame that says whether a bad probability score is
    * MISCALIBRATED (high reliability term: fix with [[isotonicCalibration]])
    * or UNDISCRIMINATING (low resolution: fix the model). Scores are
    * floor-quantized to 1e-6 BEFORE squaring/summing, per-bin terms
    * to 1e-9 — every sum is integer-exact in any order; cross
    * products ride DECIMAL(38,0). One row:
    * (n, brier, uncertainty, resolution, reliability). */
  def brierDecomposition(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val dec = "decimal(38,0)"
    val b = least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("long")
    val lab = col(labelCol).cast("long")
    val q = floor(col(scoreCol) * 1e6).cast("long")
    val binned = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(b.as("bin"))
      .agg(count(lit(1)).as("nk"), sum(lab).as("npk"),
        sum(q).as("sqk"),
        sum(((q - lab * 1000000L) * (q - lab * 1000000L)).cast(dec))
          .as("se2"))
    val tot = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val dRel = col("sqk").cast(dec) - col("npk").cast(dec) * 1000000L
    val dRes = col("npk").cast(dec) * col("n") -
      col("np").cast(dec) * col("nk")
    binned
      .select(col("nk"), col("npk"), col("sqk"), col("se2"),
        sum("nk").over(tot).as("n"), sum("npk").over(tot).as("np"))
      .select(col("n"), col("np"),
        col("se2"),
        // reliability term: (sq_k − np_k·1e6)² / (n_k · 1e12)
        floor((dRel * dRel).cast("double")
          / col("nk") / 1e12 * 1e9).cast("long").as("rel9"),
        // resolution term: (np_k·n − np·n_k)² / (n_k · n²)
        floor((dRes * dRes).cast("double")
          / col("nk") / col("n") / col("n") * 1e9).cast("long").as("res9"))
      .groupBy("n", "np")
      .agg(sum("se2").as("se2"), sum("rel9").as("srel9"),
        sum("res9").as("sres9"))
      .select(col("n"),
        r6(col("se2").cast("double") / col("n") / 1e12).as("brier"),
        r6(col("np").cast("double") * (col("n") - col("np")) /
          (col("n").cast("double") * col("n"))).as("uncertainty"),
        r6(col("sres9").cast("double") / col("n") / 1e9).as("resolution"),
        r6(col("srel9").cast("double") / col("n") / 1e9).as("reliability"))
  }

  /** Isotonic calibration by pool-adjacent-violators — the score →
    * probability map every threshold decision actually wants: the
    * empirical positive rate, made monotone in the score. The corpus
    * reduces ONCE to the distinct-score frame (the [[Eval]] scale
    * contract: <= 10^digits rows), PAV then pools adjacent violators
    * on the DRIVER — the classic sequential algorithm over a bounded
    * frame, exact rational pooling via (pos, n) integer pairs so the
    * fitted rates are engine-independent. Returns the step function
    * as (score_lo, score_hi, n, n_pos, rate) segments; calibrate a
    * score by range lookup (broadcast-join the segments).
    *
    * No SQL oracle (PAV is inherently sequential); EvalSpec pins the
    * pooling against hand-computed fits. */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      labelCol: String, digits: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = grouped(df, scoreCol, labelCol, digits)
      .select(col("score"), (col("pos") + col("neg")).as("n"),
        col("pos").as("np"))
      .orderBy("score")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    // PAV: pool while a block's rate exceeds its successor's
    final case class Block(lo: Double, hi: Double, n: Long, np: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    for ((sc, n, np) <- g) {
      var b = Block(sc, sc, n, np)
      // violation test on exact integers: np1/n1 > np2/n2  <=>
      // np1*n2 > np2*n1
      while (stack.nonEmpty &&
          stack.last.np * b.n > b.np * stack.last.n) {
        val p = stack.remove(stack.size - 1)
        b = Block(p.lo, b.hi, p.n + b.n, p.np + b.np)
      }
      stack += b
    }
    stack.toSeq.map(b => (b.lo, b.hi, b.n, b.np,
        math.floor(b.np.toDouble / b.n.toDouble * 1e6) / 1e6))
      .toDF("score_lo", "score_hi", "n", "n_pos", "rate")
  }

  /** Per-group tie-corrected AUC — the corpus-audit form ("does the
    * quality score rank English docs well in EVERY language/source
    * slice, or only on average?"). Same exact-integer construction as
    * [[auc]] with every window PARTITIONED by the group column, so
    * groups rank in parallel; one row per group:
    * (group, auc, n_pos, n_neg). */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String, digits: Int = 6): DataFrame = {
    val s = if (digits >= 0) round(col(scoreCol), digits)
            else col(scoreCol)
    val g = df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(groupCol), s.as("score"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
           (count(lit(1)) - sum(col(labelCol).cast("long"))).as("neg"))
    val below = Window.partitionBy(groupCol).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    g.select(col(groupCol), col("pos"), col("neg"),
        coalesce(sum("neg").over(below), lit(0L)).as("negBelow"))
      .groupBy(groupCol)
      .agg(sum(col("pos") * (col("negBelow") * 2 + col("neg"))).as("num2"),
           sum("pos").as("np"), sum("neg").as("nn"))
      .select(col(groupCol),
        ratio6(col("num2"), col("np") * col("nn") * 2).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** The operating point: the threshold (a score actually present in
    * the data) maximizing F1, lowest such score on ties —
    * deterministic, replayable. One row:
    * (threshold, tp, fp, fn, f1). Reduces by distinct score like
    * every metric here; the pick is a TakeOrdered over the
    * distinct-score frame (f1 desc, score asc — a total order, score
    * is unique). */
  def bestThresholdByF1(df: DataFrame, scoreCol: String, labelCol: String,
                        digits: Int = 6): DataFrame = {
    val g = grouped(df, scoreCol, labelCol, digits)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("score"),
        sum("pos").over(w).as("tp"), sum("neg").over(w).as("fp"),
        sum("pos").over(tot).as("np"))
      .select(col("score").as("threshold"), col("tp"), col("fp"),
        (col("np") - col("tp")).as("fn"),
        ratio6(col("tp") * 2,
          col("tp") * 2 + col("fp") + (col("np") - col("tp"))).as("f1"))
      .orderBy(col("f1").desc, col("threshold"))
      .limit(1)
  }

  /** Confusion counts + derived metrics at one threshold
    * (predict positive when score >= threshold). Single full-reduce
    * row; ratios exact-int then floor-quantized to 6. */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
                  threshold: Double): DataFrame = {
    val pred = (col(scoreCol) >= threshold).cast("long")
    val lab = col(labelCol).cast("long")
    df.where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(sum(pred * lab).as("tp"),
           sum(pred * (lit(1L) - lab)).as("fp"),
           sum((lit(1L) - pred) * lab).as("fn"),
           sum((lit(1L) - pred) * (lit(1L) - lab)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio6(col("tp") + col("tn"),
           col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
        ratio6(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio6(col("tp"), col("tp") + col("fn")).as("recall"),
        // f1 from exact counts in one expression (2tp / (2tp+fp+fn)) —
        // composing the rounded precision/recall would double-round
        ratio6(col("tp") * 2,
           col("tp") * 2 + col("fp") + col("fn")).as("f1"))
  }

  /** Average precision (PR-AUC in its standard step form):
    * AP = Σ_cuts ΔRecall·Precision = (1/n_pos)·Σ_s pos_s·tp_s/cum_s
    * over descending-threshold cuts at each distinct score. A float
    * sum of the per-cut terms would be partition-order-dependent, so
    * each term is floor-quantized to an integer at 10⁻⁹ (one pinned
    * double chain per row — identical on any engine) and the BIGINT
    * sum is exact; the single closing division then quantizes to 6
    * digits. One row: (ap, n_pos, n_neg). */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
                       digits: Int = 6): DataFrame = {
    val g = grouped(df, scoreCol, labelCol, digits)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("pos"),
        sum("pos").over(w).as("tp"),
        (sum("pos").over(w) + sum("neg").over(w)).as("cum"),
        sum("pos").over(tot).as("np"), sum("neg").over(tot).as("nn"))
      .where(col("pos") > 0)
      .select(floor(col("pos").cast("double") * col("tp") / col("cum")
        * 1e9).cast("long").as("term9"),
        col("np"), col("nn"))
      .agg(sum("term9").as("s9"), max("np").as("np"), max("nn").as("nn"))
      .select(
        when(col("np") > 0,
          r6(col("s9").cast("double") / col("np") / 1e9)).as("ap"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** Kolmogorov-Smirnov separation: max over thresholds of
    * |TPR − FPR|, with the threshold (lowest score on ties, like
    * [[bestThresholdByF1]]) that attains it. The max runs on the
    * EXACT integer |tp·nn − fp·np| (DECIMAL(38,0) cross products —
    * corpus-scale counts overflow BIGINT); the one division closes
    * it. One row: (threshold, ks, n_pos, n_neg). */
  def ksStatistic(df: DataFrame, scoreCol: String, labelCol: String,
                  digits: Int = 6): DataFrame = {
    val dec = "decimal(38,0)"
    val g = grouped(df, scoreCol, labelCol, digits)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("score"),
        sum("pos").over(w).as("tp"), sum("neg").over(w).as("fp"),
        sum("pos").over(tot).as("np"), sum("neg").over(tot).as("nn"))
      .select(col("score"), col("np"), col("nn"),
        abs(col("tp").cast(dec) * col("nn") -
          col("fp").cast(dec) * col("np")).as("d"))
      .orderBy(col("d").desc, col("score"))
      .limit(1)
      .select(col("score").as("threshold"),
        when(col("np") > 0 && col("nn") > 0,
          r6(col("d").cast("double") /
            (col("np").cast("double") * col("nn").cast("double"))))
          .as("ks"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  /** Decile lift/gains table: examples ranked by score descending are
    * cut into `buckets` equal-population bands; each band reports its
    * positive rate, lift over the base rate, and cumulative gain
    * (share of all positives captured through that band). Tied scores
    * NEVER split: a distinct-score group lands in the bucket of its
    * last example (deterministic; bucket populations flex by the tie
    * mass). Reduces by distinct score like every metric here; the
    * bucket regroup is `buckets` rows. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                buckets: Int = 10, digits: Int = 6): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val g = grouped(df, scoreCol, labelCol, digits)
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val banded = g.select(col("pos"), col("neg"),
        (sum("pos").over(w) + sum("neg").over(w)).as("cum"),
        sum("pos").over(tot).as("np"),
        (sum("pos").over(tot) + sum("neg").over(tot)).as("n_all"))
      .select(col("pos"), col("neg"), col("np"), col("n_all"),
        least(floor((col("cum") - 1) * buckets / col("n_all")),
          lit(buckets - 1).cast("long")).as("bucket"))
      .groupBy("bucket")
      .agg((sum("pos") + sum("neg")).as("n"), sum("pos").as("n_pos"),
        max("np").as("np"), max("n_all").as("n_all"))
    val cumw = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded
      .select(col("bucket"), col("n"), col("n_pos"),
        ratio6(col("n_pos"), col("n")).as("pos_rate"),
        when(col("np") > 0,
          r6(col("n_pos").cast("double") * col("n_all") /
            (col("n").cast("double") * col("np")))).as("lift"),
        when(col("np") > 0,
          r6(sum("n_pos").over(cumw).cast("double") / col("np")))
          .as("cum_gain"))
  }
}
