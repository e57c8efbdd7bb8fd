package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // scores 0.9,0.8(x2 tied: one pos one neg),0.4,0.2 — hand AUC:
  // pairs = 3 pos * 2 neg = 6; pos 0.9 beats both negs (2), pos 0.8
  // beats neg 0.2 (1) ties neg 0.8 (0.5), pos 0.4 beats 0.2 (1) loses
  // to 0.8 (0) → (2 + 1.5 + 1) / 6 = 0.75
  private def tiny = Seq(
    (0.9, 1), (0.8, 1), (0.8, 0), (0.4, 1), (0.2, 0)
  ).toDF("score", "label")

  test("auc matches the hand-computed tie-corrected value") {
    val r = Eval.auc(tiny, "score", "label").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("auc") == 0.75)
    assert(r(0).getAs[Long]("n_pos") == 3 && r(0).getAs[Long]("n_neg") == 2)
  }

  test("auc is 1.0 under perfect separation and 0.0 when inverted") {
    val sep = Seq((0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)).toDF("score", "label")
    assert(Eval.auc(sep, "score", "label").collect()(0).getAs[Double]("auc") == 1.0)
    val inv = Seq((0.9, 0), (0.8, 0), (0.3, 1), (0.1, 1)).toDF("score", "label")
    assert(Eval.auc(inv, "score", "label").collect()(0).getAs[Double]("auc") == 0.0)
  }

  test("auc of a single-class frame is NULL, not a crash") {
    val one = Seq((0.9, 1), (0.1, 1)).toDF("score", "label")
    val r = Eval.auc(one, "score", "label").collect()(0)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rocPoints cumulates predict-positive-at-cut counts") {
    val rows = Eval.rocPoints(tiny, "score", "label")
      .orderBy($"score".desc)
      .select("score", "tp", "fp", "precision", "recall").collect()
    assert(rows.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0.9, 1L, 0L), (0.8, 2L, 1L), (0.4, 3L, 1L), (0.2, 3L, 2L)))
    // precision at the 0.8 cut = 2/3 floor-quantized
    assert(rows(1).getDouble(3) == 0.666666)
    assert(rows(3).getDouble(4) == 1.0)
  }

  test("null scores and labels are excluded before any counting") {
    val withNulls = Seq(
      (Some(0.9), Some(1)), (None, Some(0)), (Some(0.5), None), (Some(0.1), Some(0))
    ).toDF("score", "label")
    val r = Eval.auc(withNulls, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") == 1 && r.getAs[Long]("n_neg") == 1)
    assert(r.getAs[Double]("auc") == 1.0)
  }

  test("calibrationBins folds 1.0 into the top bin and keeps exact means") {
    val df = Seq((0.05, 0), (0.08, 1), (1.0, 1), (0.95, 1)).toDF("score", "label")
    val bins = Eval.calibrationBins(df, "score", "label", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getLong(0)).toSeq == Seq(0L, 9L))
    val b0 = bins(0)
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Long]("n_pos") == 1)
    assert(b0.getAs[Double]("pos_rate") == 0.5)
    // mean of 0.05, 0.08 = 0.065 — exact via the integer-partial path
    assert(b0.getAs[Double]("mean_score") == 0.065)
    assert(bins(1).getAs[Long]("n") == 2 && bins(1).getAs[Long]("n_pos") == 2)
  }

  test("confusionAt counts and f1 from exact counts") {
    val r = Eval.confusionAt(tiny, "score", "label", threshold = 0.5).collect()(0)
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
            r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((2L, 1L, 1L, 1L)))
    assert(r.getAs[Double]("accuracy") == 0.6)
    assert(r.getAs[Double]("precision") == 0.666666)
    assert(r.getAs[Double]("recall") == 0.666666)
    // f1 = 2*2 / (2*2 + 1 + 1) = 4/6 from raw counts, not from the
    // already-quantized precision/recall
    assert(r.getAs[Double]("f1") == 0.666666)
  }

  test("threshold above every score yields NULL precision, zero tp") {
    val r = Eval.confusionAt(tiny, "score", "label", threshold = 0.99).collect()(0)
    assert(r.getAs[Long]("tp") == 0 && r.getAs[Long]("fp") == 0)
    assert(r.isNullAt(r.fieldIndex("precision")))
    assert(r.getAs[Double]("recall") == 0.0)
  }

  test("aucByGroup ranks each slice independently, degenerate slices NULL") {
    val df = Seq(
      // slice a = the tiny corpus (auc 0.75)
      ("a", 0.9, 1), ("a", 0.8, 1), ("a", 0.8, 0), ("a", 0.4, 1), ("a", 0.2, 0),
      // slice b = perfect separation
      ("b", 0.9, 1), ("b", 0.2, 0),
      // slice c = single class
      ("c", 0.5, 1), ("c", 0.4, 1)
    ).toDF("src", "score", "label")
    val rows = Eval.aucByGroup(df, "src", "score", "label")
      .orderBy("src").collect()
    assert(rows(0).getAs[Double]("auc") == 0.75)
    assert(rows(1).getAs[Double]("auc") == 1.0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("auc")))
  }

  test("bestThresholdByF1 picks the max-F1 cut, lowest score on ties") {
    val r = Eval.bestThresholdByF1(tiny, "score", "label").collect()(0)
    // cuts: 0.9→f1 0.5, 0.8→0.666…, 0.4→6/7, 0.2→0.75
    assert(r.getAs[Double]("threshold") == 0.4)
    assert(r.getAs[Double]("f1") == 0.857142)
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn")) ==
      ((3L, 1L, 0L)))
    val tied = Seq((0.9, 1), (0.7, 0), (0.5, 0), (0.3, 1)).toDF("score", "label")
    // cuts: 0.9 → 2/3, 0.7 → 1/2, 0.5 → 2/5, 0.3 → 2/3: a tie at the
    // max — the lower threshold wins
    val t = Eval.bestThresholdByF1(tied, "score", "label").collect()(0)
    assert(t.getAs[Double]("threshold") == 0.3)
    assert(t.getAs[Double]("f1") == 0.666666)
  }

  test("continuous scores are bounded by the digits=6 default") {
    // a genuinely continuous score column (every value distinct) must
    // NOT reach the ranking window at per-example cardinality: the
    // default 6-digit quantization caps the distinct-score frame, so
    // the single-task Window.orderBy stays sketch-sized at any corpus
    // size. 10k distinct raw values land on far fewer grid points
    // here because the range is [0,1e-2) — the point is the cap is
    // structural, not data-dependent.
    val continuous = spark.range(10000)
      .selectExpr("id / 1048576.0 AS score", "CAST(id % 2 AS INT) AS label")
    val r = Eval.auc(continuous, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == 10000)
    // the quantized frame: distinct round(score, 6) values
    val frame = continuous
      .selectExpr("round(score, 6) AS q").distinct().count()
    assert(frame < 10000, s"quantization must collapse the frame: $frame")
    // digits=6 quantization is value-identity for the ≤4-digit scores
    // every repo query feeds (so oracle outputs are unchanged)
    val dflt = Eval.auc(tiny, "score", "label").collect()(0)
    val raw = Eval.auc(tiny, "score", "label", digits = -1).collect()(0)
    assert(dflt == raw)
  }

  test("digits bound is an exact identity on already-quantized scores") {
    import spark.implicits._
    // 0.0157 is one of the 115 four-digit values where
    // floor(score*1e6)/1e6 drops a half-ulp (0.0157e6 = 1569.999…);
    // the round()-based bound must pass it through verbatim so the
    // reported threshold matches an oracle grouping raw values
    val rows = Seq((0.0157, 1), (0.0157, 1), (0.0007, 0), (0.9, 0))
      .toDF("score", "label")
    val roc = Eval.rocPoints(rows, "score", "label")
      .orderBy("score").collect().map(_.getDouble(0))
    assert(roc.toSeq == Seq(0.0007, 0.0157, 0.9), roc.mkString(","))
  }

  test("metric shuffles reduce by distinct score, not per example") {
    // the distinct-score frame: 1000 rows with only 3 distinct scores
    // must aggregate before the ranking window sees them
    val big = spark.range(1000)
      .selectExpr("(id % 3) / 10.0 AS score", "CAST(id % 2 AS INT) AS label")
    val plan = Eval.auc(big, "score", "label").queryExecution.executedPlan.toString
    // one aggregate below the window: groupBy(score) runs first
    assert(plan.contains("Window"))
    val r = Eval.auc(big, "score", "label").collect()(0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == 1000)
  }

  test("average precision matches the hand-computed step sum") {
    // desc cuts: 0.9 (tp=1, cum=1, P=1) and 0.7 (tp=2, cum=3, P=2/3);
    // AP = (1·1 + 1·2/3) / 2 = 0.833333 after the 1e-9 term floor
    val rows = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0))
      .toDF("score", "label")
    val r = Eval.averagePrecision(rows, "score", "label").collect()(0)
    assert(r.getAs[Double]("ap") == 0.833333, r.toString)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
  }

  test("average precision is 1.0 under perfect separation") {
    val sep = Seq((0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)).toDF("score", "label")
    assert(Eval.averagePrecision(sep, "score", "label")
      .collect()(0).getAs[Double]("ap") == 1.0)
  }

  test("ks statistic picks the max separation and the lowest tied threshold") {
    // d=|tp·nn − fp·np| over desc cuts: 0.9→2, 0.8→0, 0.7→2, 0.6→0;
    // max 2 attained at 0.9 and 0.7 → lowest threshold 0.7, ks=2/4
    val rows = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0))
      .toDF("score", "label")
    val r = Eval.ksStatistic(rows, "score", "label").collect()(0)
    assert(r.getAs[Double]("threshold") == 0.7)
    assert(r.getAs[Double]("ks") == 0.5)
  }

  test("ks is 1.0 under perfect separation") {
    val sep = Seq((0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)).toDF("score", "label")
    val r = Eval.ksStatistic(sep, "score", "label").collect()(0)
    assert(r.getAs[Double]("ks") == 1.0 && r.getAs[Double]("threshold") == 0.8)
  }

  test("lift table: per-band rates, lift over base, cumulative gain") {
    // top half all positive, bottom half all negative, 2 buckets:
    // band 0 lift = (2·4)/(2·2) = 2, band 1 lift = 0, gains 1.0, 1.0
    val rows = Seq((0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0))
      .toDF("score", "label")
    val r = Eval.liftTable(rows, "score", "label", buckets = 2)
      .orderBy("bucket").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n") == 2 && r(0).getAs[Double]("lift") == 2.0)
    assert(r(0).getAs[Double]("cum_gain") == 1.0)
    assert(r(1).getAs[Double]("lift") == 0.0)
    assert(r(1).getAs[Double]("cum_gain") == 1.0)
  }

  test("lift table: tied scores never split across buckets") {
    val rows = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.5, 0))
      .toDF("score", "label")
    val r = Eval.liftTable(rows, "score", "label", buckets = 2)
      .orderBy("bucket").collect()
    // the 0.5 tie group (3 rows) lands wholly in the bucket of its
    // last example
    assert(r(0).getAs[Long]("n") == 1 && r(1).getAs[Long]("n") == 3)
  }

  test("isotonic calibration: textbook PAV pooling") {
    import spark.implicits._
    // scores .1/.2/.3/.4 with rates 0.0, 1.0, 0.5, 1.0:
    // (.2: 1.0) > (.3: 0.5) violates -> pool to 3/4 = 0.75 over [.2,.3]
    val rows =
      Seq((0.1, 0), (0.1, 0),
        (0.2, 1), (0.2, 1),
        (0.3, 1), (0.3, 0),
        (0.4, 1), (0.4, 1)).toDF("score", "label")
    val segs = Eval.isotonicCalibration(rows, "score", "label")
      .orderBy("score_lo")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(segs.length == 3, segs.mkString(";"))
    assert(segs(0) == ((0.1, 0.1, 2L, 0L, 0.0)))
    assert(segs(1) == ((0.2, 0.3, 4L, 3L, 0.75)))
    assert(segs(2) == ((0.4, 0.4, 2L, 2L, 1.0)))
  }

  test("isotonic calibration: already-monotone input is untouched; rates never decrease") {
    import spark.implicits._
    val rows = (1 to 100).map(i =>
      (i / 100.0, if (i % 100 < i) 1 else 0)).toDF("score", "label")
    val segs = Eval.isotonicCalibration(rows, "score", "label")
      .orderBy("score_lo").collect().map(_.getDouble(4))
    assert(segs.zip(segs.tail).forall { case (a, b) => a <= b })
  }

  test("isotonic calibration: cascading pools collapse to the global rate") {
    import spark.implicits._
    // strictly DECREASING rates: everything pools into one block
    val rows = Seq((0.1, 1), (0.1, 1), (0.2, 1), (0.2, 0),
      (0.3, 0), (0.3, 0)).toDF("score", "label")
    val segs = Eval.isotonicCalibration(rows, "score", "label").collect()
    assert(segs.length == 1)
    assert(segs(0).getLong(2) == 6L && segs(0).getLong(3) == 3L)
    assert(segs(0).getDouble(4) == 0.5)
  }

  test("brier decomposition: hand case where the identity is exact") {
    import spark.implicits._
    // bins 2 and 8: brier 0.1675, uncertainty 0.1875 (p̄=0.75),
    // reliability 0.0425, resolution 0.0625 — rel − res + unc = brier
    val rows = Seq((0.25, 0), (0.25, 1), (0.85, 1), (0.85, 1))
      .toDF("score", "label")
    val r = Eval.brierDecomposition(rows, "score", "label").collect()(0)
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Double]("brier") == 0.1675)
    assert(r.getAs[Double]("uncertainty") == 0.1875)
    assert(r.getAs[Double]("reliability") == 0.0425)
    assert(r.getAs[Double]("resolution") == 0.0625)
  }

  test("brier: perfectly calibrated bins have ~zero reliability") {
    import spark.implicits._
    // within each bin the mean score equals the positive rate
    val rows = (Seq.fill(3)((0.25, 0)) ++ Seq((0.25, 1)) ++
      Seq.fill(3)((0.75, 1)) ++ Seq((0.75, 0))).toDF("score", "label")
    val r = Eval.brierDecomposition(rows, "score", "label").collect()(0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("resolution") > 0.0)
  }
}
