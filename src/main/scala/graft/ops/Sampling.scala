package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset mixing — the "recipe" step of a
  * training-data pipeline: given per-source target proportions, derive
  * per-source keep-rates and apply them with a content-hash threshold.
  *
  * Hash-threshold sampling (keep iff xxhash64(id) maps below rate) is
  * the only sampling that survives distribution: deterministic across
  * runs, retries and executor placement (no RNG state), stable under
  * repartitioning, and reproducible by any engine with the same hash —
  * df.sample() guarantees none of these.
  */
object Sampling {

  /** Keep-decision column: true for ~`rate` of rows, keyed on idCol's
    * content. Different `salt`s give independent samples. */
  def keep(idCol: Column, rate: Double, salt: Long = 0L): Column = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    // xxhash64 → [0, 2^63): compare against rate * 2^63
    (pmod(xxhash64(idCol, lit(salt)), lit(Long.MaxValue)).cast("double")
      < lit(rate * Long.MaxValue.toDouble))
  }

  /** Bernoulli sample of ~`rate` keyed on `idCol`. */
  def sample(df: DataFrame, idCol: String, rate: Double, salt: Long = 0L): DataFrame =
    df.where(keep(col(idCol), rate, salt))

  /** Deterministic train/val/test split: adds `splitCol` naming the
    * partition each row falls into, by content hash — membership is a
    * pure function of (id, salt), so re-running the pipeline, adding
    * rows, or re-partitioning never moves an existing row between
    * splits (the property random splits lose and the reason eval
    * contamination sneaks into retrained models). Weights normalize;
    * cumulative thresholds over the md5 2^40 fold make every engine
    * agree on the assignment. Pure narrow map — no shuffle, no state.
    */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], splitCol: String = "split",
      salt: Long = 0L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights: $splits")
    val total = splits.map(_._2).sum
    val h = md5Hash40(col(idCol), salt)
    // cumulative upper bounds in hash space; last split takes the rest
    // exactly (no float-boundary gap at 2^40)
    val cuts = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), cut), acc) =>
        when(h < lit(math.floor(cut * 1099511627776.0)), lit(name))
          .otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Deterministic EXACT-k-per-group sample — the reservoir-sampling
    * shape (uniform k rows per group) with none of the randomness:
    * rows rank inside each group by a seeded content hash and the k
    * smallest win, so the same input always yields the same sample
    * and any engine with md5 replays it.
    *
    * Scale shape: the per-group selection is the mergeable bounded-
    * heap aggregate (graft.expr.TopKByScore) — each map task keeps at
    * most k candidates per group, so the shuffle carries k·tasks rows
    * per group instead of the full table a `row_number()` window
    * would move; winners then join back to the source rows on the
    * (group, id) pair. The hash is the md5 prefix folded into 2^40
    * (< 2^53, so the double-typed heap score is exact — no cross-
    * engine tie drift).
    *
    * Precondition: `idCol` must be long-castable AND unique per group
    * — a non-numeric id casts to NULL and silently drops from the
    * sample; duplicate (group, id) rows would multiply through the
    * winner join-back and break exact-k.
    */
  def kPerGroup(df: DataFrame, groupCol: String, idCol: String,
                k: Int, salt: Long = 0L): DataFrame = {
    // md5-derived rank in [0, 2^40): exact as double, replayable
    val rank = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":"), lit(salt))), 1, 15), 16, 10).cast("long")
      % lit(1099511627776L)).cast("double")
    // underscore-prefixed internals: a caller column named "g"/"i"
    // would make the join ambiguous or be silently dropped
    val winners = df
      .select(col(groupCol).as("_g"), col(idCol).cast("long").as("_i"), rank.as("_r"))
      .groupBy("_g")
      // TopKByScore keeps HIGHEST scores: negate so the smallest
      // hashes (the canonical "first k of the shuffled order") win
      .agg(graft.expr.TopKByScore.topKBy(-col("_r"), col("_i"), k).as("_top"))
      .select(col("_g"), explode(col("_top")).as("_e"))
      .select(col("_g"), col("_e.id").as("_i"))
    df.join(winners,
      col(groupCol) === col("_g") && col(idCol).cast("long") === col("_i"), "inner")
      .drop("_g", "_i")
  }

  /** Deterministic WEIGHTED k-per-group sample (Efraimidis–Spirakis
    * weighted reservoir, derandomized): each row draws u from its
    * content hash (uniform in (0,1)) and ranks by the E-S key
    * -ln(u)/w — the classic weighted-sampling-without-replacement
    * transform, so a row with twice the weight is (asymptotically)
    * twice as likely to make the sample. Quality-weighted corpus
    * subsampling ("prefer high-quality docs, keep k per source") in
    * one pass.
    *
    * Scale shape: same as [[kPerGroup]] — the bounded-heap aggregate
    * keeps k candidates per (group × task), so the shuffle carries
    * k·tasks rows per group, never the table. The key is quantized to
    * integer 1e-6 (ties → smaller id) so selection is deterministic
    * and engine-replayable; `weightCol` must be >= 1e-8 (below
    * ~3.1e-9 the quantized key would exceed 2^53 and the
    * double-exactness guarantee — and with it engine replayability —
    * would drift; 1e-8 keeps a 3x margin).
    *
    * Precondition (shared with [[kPerGroup]]): `idCol` must be
    * long-castable AND unique per group — a non-numeric id casts to
    * NULL and silently drops from the sample; duplicate (group, id)
    * rows would multiply through the winner join-back and break
    * exact-k.
    */
  def weightedKPerGroup(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, salt: Long = 0L): DataFrame = {
    // u in (0,1]: (h+1) / 2^40 over h in [0, 2^40) — never 0, so ln is
    // finite; -ln(u)/w >= 0 with larger = better for high weights
    val u = (md5Hash40(col(idCol), salt) + 1.0) / 1099511627776.0
    // floor yields a long; cast back to double for the heap score —
    // exact, since -ln(u) <= ln(2^40) ≈ 27.73 caps the quantized key
    // at 27.73e6/w, which stays under 2^53 exactly when w > 3.1e-9;
    // the documented contract (weights >= 1e-8) keeps a 3x margin
    val key = floor(-log(u) / col(weightCol).cast("double") * 1000000.0)
      .cast("double")
    val winners = df
      .select(col(groupCol).as("_g"), col(idCol).cast("long").as("_i"), key.as("_k"))
      .groupBy("_g")
      // E-S keeps the SMALLEST keys… with -ln(u)/w as "arrival time";
      // negate so the heap (which keeps highest) retains them. Heap
      // ties break toward smaller id (TopKByScore's (score, id asc)).
      .agg(graft.expr.TopKByScore.topKBy(-col("_k"), col("_i"), k).as("_top"))
      .select(col("_g"), explode(col("_top")).as("_e"))
      .select(col("_g"), col("_e.id").as("_i"))
    df.join(winners,
      col(groupCol) === col("_g") && col(idCol).cast("long") === col("_i"), "inner")
      .drop("_g", "_i")
  }

  /** Cap each group at a TOKEN budget instead of a row count: rows are
    * taken in deterministic content-hash order (a canonical shuffle)
    * and kept while the group's running token total stays within
    * `budget` — the "sample N tokens per source/language" recipe step
    * of a training-data mix, where doc lengths vary too much for row
    * counts to bound the actual data volume.
    *
    * Scale shape: one window per group (partition-parallel, the
    * canonical Spark form for budgeted selection); the hash order
    * makes the selection deterministic across runs, retries and
    * repartitioning, and — via the md5 fold — replayable by an
    * external engine. A doc straddling the boundary is dropped
    * (inclusive running total must fit), so the budget is a hard cap.
    */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budget: Long, salt: Long = 0L): DataFrame = {
    require(budget >= 0, s"budget $budget must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5Hash40(col(idCol), salt), col(idCol))
    df.withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .where(col("_cum") <= budget)
      .drop("_cum")
  }

  /** md5-derived content hash in [0, 2^40): exact as a double
    * (< 2^53) and replayable by any engine with md5 — the same fold
    * [[kPerGroup]] uses for its rank. */
  private[graft] def md5Hash40(idCol: Column, salt: Long): Column =
    (conv(substring(md5(concat(idCol.cast("string"), lit(":"), lit(salt))),
      1, 15), 16, 10).cast("long") % lit(1099511627776L)).cast("double")

  /** Downsample each stratum so the OUTPUT mix matches `targetWeights`
    * (normalized internally). Keep-rates are solved from the observed
    * stratum sizes (one tiny count aggregate): the largest feasible
    * output keeps every stratum's rate <= 1, i.e. the binding stratum
    * (largest target/size ratio) passes through whole and everything
    * else downsamples around it. Strata absent from `targetWeights`
    * are dropped. Narrow apart from the size aggregate.
    *
    * `replayable = true` swaps the xxhash64 threshold for the md5 fold
    * above so an external engine can replay the exact keep decision
    * (the oracle path); the default xxhash64 is the cheaper production
    * hash. Both are content-keyed: deterministic across runs, retries
    * and repartitioning.
    */
  def mix(df: DataFrame, stratumCol: String, idCol: String,
          targetWeights: Map[String, Double], salt: Long = 0L,
          replayable: Boolean = false): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "weights must be positive")
    val total = targetWeights.values.sum
    val target = targetWeights.map { case (k, w) => k -> w / total }

    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val present = target.filter { case (k, _) => sizes.getOrElse(k, 0L) > 0L }
    require(present.nonEmpty, "no targeted stratum present in the data")

    // output scale N: rate_k = target_k * N / size_k <= 1 for all k
    val n = present.map { case (k, t) => sizes(k) / t }.min
    val rates = present.map { case (k, t) => k -> math.min(1.0, t * n / sizes(k)) }
    applyRates(df, stratumCol, idCol, rates, salt, replayable)
  }

  /** Temperature-flattened mixture: keep-rates solved so the OUTPUT
    * stratum sizes are proportional to `size^alpha` — the standard
    * multilingual-corpus rebalancing move (alpha 1 = natural
    * distribution, alpha → 0 = uniform; 0.5-0.7 is the usual band
    * that keeps head languages from drowning the tail). The smallest
    * effective stratum passes through whole and everything larger
    * downsamples around it.
    *
    * Weights stay UNNORMALIZED (the normalizing sum cancels in the
    * rate formula, and skipping it keeps every arithmetic step
    * element-wise — no iteration-order-dependent float sum, so an
    * external engine replays the rates exactly). alpha = 0.5 uses
    * `sqrt`, which is IEEE-exact in any engine; other alphas go
    * through `pow` (correctly rounded to ~1 ulp — replay across
    * engines is near-exact but not guaranteed at quantization
    * boundaries). Same narrow shape as [[mix]]: one tiny size
    * aggregate, then a pure filter. */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
      alpha: Double, salt: Long = 0L, replayable: Boolean = false): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha must be in (0, 1]")
    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    require(sizes.nonEmpty, "no rows to mix")
    def w(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val nn = sizes.values.map(n => n.toDouble / w(n)).min
    val rates = sizes.map { case (k, n) => k -> math.min(1.0, w(n) * nn / n) }
    applyRates(df, stratumCol, idCol, rates, salt, replayable)
  }

  /** Epoch-style per-stratum UPSAMPLING — the direction [[mix]] can't
    * go (mix only downsamples around the binding stratum): replicate
    * each stratum's rows by a possibly-fractional factor (the
    * "high-quality source × N epochs" move of pretraining mixtures —
    * e.g. books/wiki repeated 2-3×, crawl at 1×). factor f ⇒ floor(f)
    * full copies plus one more with probability frac(f), decided by
    * the content-keyed hash (deterministic under retries; `replayable`
    * uses the md5 fold so an external engine reproduces the decision).
    * Output adds `epoch` (1-based copy index) so downstream shuffles,
    * packing, and dedup can tell copies apart. Strata without a
    * factor pass through at 1×. Pure narrow explode — no shuffle. */
  def upsample(df: DataFrame, stratumCol: String, idCol: String,
               factors: Map[String, Double], salt: Long = 0L,
               replayable: Boolean = false): DataFrame = {
    require(factors.nonEmpty && factors.values.forall(_ > 0),
      "factors must be positive")
    val fCol = factors.foldLeft(lit(1.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    val frac = col("_f") - floor(col("_f"))
    val extraHit =
      if (replayable) md5Hash40(col(idCol), salt) < frac * 1099511627776.0
      else pmod(xxhash64(col(idCol), lit(salt)), lit(Long.MaxValue))
        .cast("double") < frac * Long.MaxValue.toDouble
    val copies = (floor(col("_f")).cast("int") +
      when(extraHit, 1).otherwise(0)).as("_copies")
    // sequence(1, 0) runs DESCENDING in Spark — mask the 0-copy case
    // (f < 1 whose extra-copy draw missed) to an empty array
    df.withColumn("_f", fCol)
      .withColumn("_copies", copies)
      .withColumn("epoch", explode(
        when(col("_copies") < 1, array().cast("array<int>"))
          .otherwise(sequence(lit(1), col("_copies")))))
      .drop("_f", "_copies")
  }

  /** Shared per-stratum keep filter: rate literals folded into one
    * when-chain, content-keyed hash threshold (md5 fold when
    * `replayable`, xxhash64 otherwise); strata without a rate drop. */
  private def applyRates(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], salt: Long, replayable: Boolean): DataFrame = {
    val rateCol = rates.foldLeft(lit(-1.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    val keepRow =
      if (replayable)
        md5Hash40(col(idCol), salt) < col("_rate") * 1099511627776.0
      else
        pmod(xxhash64(col(idCol), lit(salt)), lit(Long.MaxValue)).cast("double") <
          col("_rate") * Long.MaxValue.toDouble
    df.withColumn("_rate", rateCol)
      .where(col("_rate") >= 0 && keepRow)
      .drop("_rate")
  }
}
