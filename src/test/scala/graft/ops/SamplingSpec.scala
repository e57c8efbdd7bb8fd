package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("hash sampling is deterministic, rate-accurate and salt-independent") {
    val n = docs.count()
    val a = Sampling.sample(docs, "doc_id", 0.3)
    val b = Sampling.sample(docs, "doc_id", 0.3)
    assert(a.count() === b.count()) // bit-for-bit repeatable
    assert(math.abs(a.count().toDouble / n - 0.3) < 0.08)
    // different salts draw (nearly) independent samples
    val c = Sampling.sample(docs, "doc_id", 0.3, salt = 1)
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val cIds = c.select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = aIds.intersect(cIds).size.toDouble / aIds.size
    assert(overlap < 0.5, s"salted samples overlap $overlap")
  }

  test("mix hits target source proportions with the binding stratum intact") {
    val mixed = Sampling.mix(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25))
    val counts = mixed.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("en", "de", "fr")) // others dropped
    val total = counts.values.sum.toDouble
    assert(math.abs(counts("en") / total - 0.5) < 0.1)
    assert(math.abs(counts("de") / total - 0.25) < 0.07)
    assert(math.abs(counts("fr") / total - 0.25) < 0.07)
    // the binding stratum passes through whole: at least one source
    // keeps (close to) all its rows
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Seq("en", "de", "fr").exists(l => counts(l) === sizes(l)))
  }

  test("temperatureMix flattens toward size^alpha; smallest stratum intact") {
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet === sizes.keySet) // nothing dropped entirely
    // expected kept_k ≈ sqrt(n_k) * min_j(n_j / sqrt(n_j))
    val nn = sizes.values.map(n => n.toDouble / math.sqrt(n.toDouble)).min
    sizes.foreach { case (l, n) =>
      val expect = math.min(n.toDouble, math.sqrt(n.toDouble) * nn)
      assert(math.abs(kept(l) - expect) / math.max(expect, 1.0) < 0.3,
        s"$l kept ${kept(l)} vs ~$expect")
    }
    // the binding (smallest-effective) stratum passes through whole
    assert(sizes.exists { case (l, n) => kept(l) == n })
    // alpha=1 keeps everything (natural distribution)
    val natural = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 1.0)
    assert(natural.count() == docs.count())
    // determinism of the replayable path
    val a = Sampling.temperatureMix(docs, "lang", "doc_id", 0.5, replayable = true)
    val b = Sampling.temperatureMix(docs, "lang", "doc_id", 0.5, replayable = true)
    assert(a.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      b.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("upsample: fractional epoch replication per stratum, copies distinguishable") {
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val up = Sampling.upsample(docs, "lang", "doc_id",
      Map("en" -> 2.5, "de" -> 2.0), replayable = true).cache()
    val rows = up.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // de exactly doubles; en lands between x2 and x3 (~x2.5)
    assert(rows("de") == 2 * sizes("de"))
    assert(rows("en") >= 2 * sizes("en") && rows("en") <= 3 * sizes("en"))
    assert(math.abs(rows("en") - 2.5 * sizes("en")) < 0.35 * sizes("en"))
    // untargeted strata pass at exactly 1x
    assert(rows("fr") == sizes("fr") && rows("zh") == sizes("zh"))
    // every en doc has 2 or 3 copies, epochs numbered 1..copies
    val perDoc = up.where(col("lang") === "en").groupBy("doc_id")
      .agg(count(lit(1)).as("c"), max("epoch").as("m"), min("epoch").as("lo"))
      .collect()
    assert(perDoc.forall(r => (r.getLong(1) == 2 || r.getLong(1) == 3) &&
      r.getInt(2).toLong == r.getLong(1) && r.getInt(3) == 1))
    // deterministic: identical output on re-run
    val again = Sampling.upsample(docs, "lang", "doc_id",
      Map("en" -> 2.5, "de" -> 2.0), replayable = true)
    assert(up.select("doc_id", "epoch").except(again.select("doc_id", "epoch")).isEmpty)
    up.unpersist()
  }

  test("kPerGroup: exactly k rows per group, deterministic, salt-varied") {
    val df = spark.range(1000).selectExpr("id", "CAST(id % 7 AS STRING) AS grp",
      "id * 2 AS payload")
    val s1 = Sampling.kPerGroup(df, "grp", "id", k = 10)
    val sizes = s1.groupBy("grp").count().collect().map(_.getLong(1))
    assert(sizes.length == 7 && sizes.forall(_ == 10L))
    // source columns survive the join-back
    assert(s1.columns.toSeq == Seq("id", "grp", "payload"))
    // deterministic: same call → identical sample
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.kPerGroup(df, "grp", "id", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // different salt → a different (but equally sized) sample
    val ids3 = Sampling.kPerGroup(df, "grp", "id", k = 10, salt = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids3 != ids1 && ids3.size == 70)
    // a group smaller than k passes through whole
    val tiny = Sampling.kPerGroup(df.where(col("id") < 3), "grp", "id", k = 10)
    assert(tiny.count() == 3)
  }

  test("kPerGroup selects via the bounded-heap aggregate, not a window sort") {
    val df = spark.range(100).selectExpr("id", "CAST(id % 3 AS STRING) AS grp")
    val plan = Sampling.kPerGroup(df, "grp", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_by") || plan.contains("topk_by"),
      s"expected topk_by aggregate in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("mix replayable path: same proportions, md5-keyed, deterministic") {
    val w = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val a = Sampling.mix(docs, "lang", "doc_id", w, replayable = true)
    val b = Sampling.mix(docs, "lang", "doc_id", w, replayable = true)
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(aIds == b.select("doc_id").collect().map(_.getLong(0)).toSet)
    val counts = a.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    assert(math.abs(counts("en") / total - 0.5) < 0.1)
    // md5 and xxhash paths draw different—but similarly sized—samples
    val x = Sampling.mix(docs, "lang", "doc_id", w)
    assert(math.abs(x.count() - a.count()).toDouble / a.count() < 0.25)
  }

  test("tokenBudget: hard per-group cap in deterministic hash order") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 100), ("a", 2L, 100), ("a", 3L, 100),
      ("b", 4L, 500)).toDF("grp", "id", "toks")
    val kept = Sampling.tokenBudget(df, "grp", "id", "toks", budget = 250)
    // group a: exactly 2 of 3 docs fit (3rd pushes the total to 300)
    assert(kept.where(col("grp") === "a").count() == 2)
    // group b: its only doc exceeds the budget outright → dropped
    assert(kept.where(col("grp") === "b").count() == 0)
    // deterministic across runs
    val ids1 = kept.select("id").as[Long].collect().toSet
    val ids2 = Sampling.tokenBudget(df, "grp", "id", "toks", 250)
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // budget large enough keeps everything
    assert(Sampling.tokenBudget(df, "grp", "id", "toks", 1000).count() == 4)
  }

  test("weightedKPerGroup: exact k, deterministic, weight-dominant row always in") {
    import spark.implicits._
    val df = spark.range(200).selectExpr("id",
      "CAST(id % 2 AS STRING) AS grp",
      // id 42 carries overwhelming weight; everything else is tiny
      "CASE WHEN id = 42 THEN 1e9 ELSE 0.001 END AS w")
    val s1 = Sampling.weightedKPerGroup(df, "grp", "id", "w", k = 5)
    val sizes = s1.groupBy("grp").count().collect().map(_.getLong(1))
    assert(sizes.length == 2 && sizes.forall(_ == 5L))
    // E-S key of the 1e9-weight row is ~0 — it must be selected
    assert(s1.where(col("id") === 42).count() == 1)
    // deterministic
    val a = s1.select("id").as[Long].collect().toSet
    val b = Sampling.weightedKPerGroup(df, "grp", "id", "w", k = 5)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // a different salt draws a different light-weight tail
    val c = Sampling.weightedKPerGroup(df, "grp", "id", "w", k = 5, salt = 7L)
      .select("id").as[Long].collect().toSet
    assert(c != a && c.contains(42L))
  }

  test("mix rejects impossible inputs") {
    intercept[IllegalArgumentException] {
      Sampling.mix(docs, "lang", "doc_id", Map("klingon" -> 1.0)).count()
    }
    intercept[IllegalArgumentException] {
      Sampling.sample(docs, "doc_id", 1.5).count()
    }
  }

  test("assignSplit: proportional, exhaustive, and stable under growth") {
    import spark.implicits._
    val df = spark.range(20000).toDF("id")
    val out = Sampling.assignSplit(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test")) // every row lands
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.015)
    // membership is content-keyed: restricting the input to a subset
    // never moves a surviving row between splits
    val subset = Sampling.assignSplit(df.where(col("id") < 5000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val joined = out.where(col("id") < 5000)
      .withColumnRenamed("split", "full")
      .join(subset.withColumnRenamed("split", "sub"), "id")
    assert(joined.where(col("full") =!= col("sub")).count() === 0)
    // weights normalize: (8, 1, 1) is the same split as (.8, .1, .1)
    val scaled = Sampling.assignSplit(df, "id",
      Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
      .withColumnRenamed("split", "s2")
    assert(out.join(scaled, "id").where(col("split") =!= col("s2")).count() === 0)
    out.unpersist()
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq("a" -> -1.0))
    }
  }
}
