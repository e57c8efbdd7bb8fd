package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecipeIngestSpec extends SparkSpec {
  import spark.implicits._

  /** 36 distinct 6-letter alpha words — passes every Gopher rule.
    * Base-26 digits of i keep words distinct (a mod-26 arithmetic
    * generator would repeat word i at i+26 and trip the dup-bigram
    * gate); distinct seeds give distinct texts (and fingerprints). */
  private def mkDoc(seed: Int): String =
    (0 until 36).map(i =>
      s"w${('a' + (i + seed) % 26).toChar}${('a' + (i / 26 + seed * 7) % 26).toChar}ord")
      .mkString(" ")

  private val weights = Map("en" -> 0.5, "de" -> 0.5)

  test("recipe ingest: gate rejects, dedup within batch and vs index, mix stamps tokens") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe").toString
    val (acc, rej, idx) = (s"$dir/accepted", s"$dir/rejected", s"$dir/index")

    // batch 0: two good docs, a gate-failing short doc, and an exact
    // in-batch copy of doc 1 under a later id
    RecipeIngest.processBatch(
      Seq((1L, mkDoc(1), "en"), (2L, mkDoc(2), "de"),
          (3L, "too short", "en"), (4L, mkDoc(1), "en"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "run1", 0L, weights, 0L)

    // equal strata (1 en, 1 de) at equal weights ⇒ rates are 1.0 and
    // the mix deterministically keeps everything that survived dedup
    val a0 = spark.read.parquet(acc)
    assert(a0.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(a0.select(col("n_tokens").cast("int")).as[Int].collect().forall(_ == 36))
    assert(spark.read.parquet(rej).select("doc_id").as[Long].collect().toSet == Set(3L))
    assert(spark.read.parquet(idx).count() == 2)

    // batch 1: re-drop of doc 1's text (vs-index dedup) + one novel doc
    RecipeIngest.processBatch(
      Seq((10L, mkDoc(1), "en"), (11L, mkDoc(3), "de"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "run1", 1L, weights, 0L)
    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 11L))
    assert(spark.read.parquet(idx).count() == 3)

    // replaying batch 1 (same run identity) is idempotent
    RecipeIngest.processBatch(
      Seq((10L, mkDoc(1), "en"), (11L, mkDoc(3), "de"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "run1", 1L, weights, 0L)
    assert(spark.read.parquet(acc).count() == 3)
    assert(spark.read.parquet(idx).count() == 3)
  }

  test("an all-rejected batch lands empty without killing the stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-e").toString
    RecipeIngest.processBatch(
      Seq((1L, "way too short", "en")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", s"$dir/acc", s"$dir/rej", s"$dir/idx",
      "run1", 0L, weights, 0L)
    assert(spark.read.parquet(s"$dir/rej").count() == 1)
    // accepted sink is empty: zero rows if the write left a readable
    // footer, or no files at all — both mean "nothing accepted"
    val accCount =
      try spark.read.parquet(s"$dir/acc").count()
      catch { case _: Exception => 0L }
    assert(accCount == 0)
  }

  test("corpus-level remix corrects a drifted feed that per-batch mixing cannot") {
    // mkDoc repeats at seed+26; widen with two extra base-26 letters
    // per word so every seed in 0..675 yields a distinct document
    def doc(seed: Int): String =
      (0 until 36).map(i =>
        s"w${('a' + (i + seed) % 26).toChar}${('a' + (i / 26 + seed * 7) % 26).toChar}" +
          s"${('a' + seed % 26).toChar}${('a' + (seed / 26) % 26).toChar}rd")
        .mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-remix").toString
    val (acc, rej, idx) = (s"$dir/accepted", s"$dir/rejected", s"$dir/index")

    // batch 0: 100% en — the only present stratum is binding, so the
    // per-batch mix keeps ALL 40 en docs (this IS the drift failure)
    RecipeIngest.processBatch(
      (0 until 40).map(i => (i.toLong, doc(i), "en")).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "runR", 0L, weights, 0L)
    // batch 1: balanced
    RecipeIngest.processBatch(
      ((100 until 110).map(i => (i.toLong, doc(i), "en")) ++
       (200 until 210).map(i => (i.toLong, doc(i), "de"))).toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "runR", 1L, weights, 0L)

    // accepted corpus is drifted: 50 en vs 10 de at a 50/50 target
    val byLang = spark.read.parquet(acc).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 50 && byLang("de") == 10)

    // corpus-level remix re-solves rates over everything landed:
    // de binds (rate 1.0, all 10 kept), en downsamples to ~10
    RecipeIngest.remix(spark, acc, s"$dir/remixed", "lang", "doc_id", weights, 0L)
    val remixed = spark.read.parquet(s"$dir/remixed").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(remixed("de") == 10) // binding stratum passes through whole
    // en: hash-thresholded at rate 0.2 over 50 docs — proportions
    // corrected to within sampling noise of 50/50
    assert(remixed("en") >= 4 && remixed("en") <= 18,
      s"en after remix = ${remixed("en")}")

    // idempotent: a re-run of the same epoch rewrites byte-identical rows
    val first = spark.read.parquet(s"$dir/remixed")
      .select("doc_id").as[Long].collect().toSet
    RecipeIngest.remix(spark, acc, s"$dir/remixed", "lang", "doc_id", weights, 0L)
    val second = spark.read.parquet(s"$dir/remixed")
      .select("doc_id").as[Long].collect().toSet
    assert(first == second)
  }

  test("url dedup stage drops variants within batch and re-crawls across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-urlidx").toString
    val idx = s"$dir/urlidx"
    // batch 0: two variants of one page + one distinct page
    val b0 = Seq(
      (1L, mkDoc(1), "en", "https://example.com/a?utm_source=x"),
      (2L, mkDoc(2), "en", "HTTPS://EXAMPLE.COM:443/a"),
      (3L, mkDoc(3), "de", "https://example.com/b"))
      .toDF("doc_id", "text", "lang", "url")
    val s0 = RecipeIngest.urlDedupBatch(b0, "doc_id", "url", idx)
    assert(s0.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // commit the batch's hashes the way the stream does
    s0.select("_uh").withColumn("run_id", lit("r")).withColumn("batch_id", lit(0L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id", "batch_id").parquet(idx)
    s0.unpersist()

    // batch 1: a re-crawl of page /a under yet another variant + novel
    val b1 = Seq(
      (10L, mkDoc(4), "en", "https://example.com/a/"),
      (11L, mkDoc(5), "de", "https://example.com/c"))
      .toDF("doc_id", "text", "lang", "url")
    val s1 = RecipeIngest.urlDedupBatch(b1, "doc_id", "url", idx)
    assert(s1.select("doc_id").as[Long].collect().toSet == Set(11L))
    s1.unpersist()
  }

  test("streaming end-to-end with the url stage enabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-u").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    Seq(
      (20L, mkDoc(20), "en", "https://example.com/x?utm_source=a"),
      (21L, mkDoc(21), "en", "https://example.com/x"), // url-dup of 20
      (22L, mkDoc(22), "de", "https://example.com/y"))
      .toDF("doc_id", "text", "lang", "url").write.mode("append").parquet(drop)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, url STRING").parquet(drop)
    val q = RecipeIngest.start(stream, "doc_id", "text", "lang",
      s"$dir/accepted", s"$dir/rejected", s"$dir/index", s"$dir/ckpt", weights,
      urlCol = "url", urlIndexPath = s"$dir/urlidx")
    try q.awaitTermination(60000) finally q.stop()

    // doc 21 fell to the url stage; 20 and 22 flow through the recipe
    assert(spark.read.parquet(s"$dir/accepted").select("doc_id")
      .as[Long].collect().toSet == Set(20L, 22L))
    assert(spark.read.parquet(s"$dir/urlidx").count() == 2)
  }

  test("hot-line stage strips a banner planted across batches once its run-df crosses the bar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lineidx").toString
    val idx = s"$dir/lineidx"
    val banner = "COPYRIGHT ACME CORP all rights reserved"
    def doc(seed: Int) = banner + "\n" + mkDoc(seed)
    def commit(stats: org.apache.spark.sql.DataFrame, b: Long): Unit =
      stats.withColumn("run_id", lit("r")).withColumn("batch_id", lit(b))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_id", "batch_id").parquet(idx)

    // batch 0: banner in 2 docs — below minDf=3, NOT stripped yet
    val b0 = Seq((1L, doc(1), "en"), (2L, doc(2), "en"))
      .toDF("doc_id", "text", "lang")
    val (s0, stats0) = RecipeIngest.stripHotLinesBatch(b0, "doc_id", "text", idx, 3)
    assert(s0.select("text").as[String].collect().forall(_.contains(banner)))
    commit(stats0, 0L); s0.unpersist()

    // batch 1: 2 more banner docs — cumulative df 4 >= 3, banner goes;
    // body lines (df 1 each) survive untouched
    val b1 = Seq((10L, doc(10), "en"), (11L, doc(11), "de"))
      .toDF("doc_id", "text", "lang")
    val (s1, stats1) = RecipeIngest.stripHotLinesBatch(b1, "doc_id", "text", idx, 3)
    val texts = s1.orderBy("doc_id").select("text").as[String].collect()
    assert(texts.forall(!_.contains(banner)))
    assert(texts(0) == mkDoc(10) && texts(1) == mkDoc(11))
    commit(stats1, 1L); s1.unpersist()
  }

  test("streaming end-to-end with the line stage enabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-l").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    val banner = "SUBSCRIBE TO OUR NEWSLETTER today please"
    // banner in 3 docs of one batch: within-batch df 3 >= 3 strips it
    // from every doc before the gate/fingerprint stages. Languages
    // balanced 2:2 so the per-batch mix keeps every doc.
    Seq(
      (30L, banner + "\n" + mkDoc(30), "en"),
      (31L, banner + "\n" + mkDoc(31), "en"),
      (32L, banner + "\n" + mkDoc(32), "de"),
      (33L, mkDoc(33), "de"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(drop)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING").parquet(drop)
    val q = RecipeIngest.start(stream, "doc_id", "text", "lang",
      s"$dir/accepted", s"$dir/rejected", s"$dir/index", s"$dir/ckpt", weights,
      lineIndexPath = s"$dir/lineidx", lineMinDf = 3)
    try q.awaitTermination(60000) finally q.stop()

    val accepted = spark.read.parquet(s"$dir/accepted")
    assert(accepted.select("doc_id").as[Long].collect().toSet == Set(30L, 31L, 32L, 33L))
    assert(accepted.select("text").as[String].collect().forall(!_.contains(banner)))
    // the line index persisted this batch's stats for the next run
    assert(spark.read.parquet(s"$dir/lineidx").where(col("_df") === 3L).count() == 1)
  }

  test("c4 stage: junk lines vanish pre-gate, poisoned pages route to rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-c4").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    // three sentences: the C4 page gate wants >= 3 terminal marks
    def prose(seed: Int) = mkDoc(seed) + ". It is true. Yes indeed it is."
    // 40: prose + junk lines (button label, js banner) — junk must be
    // stripped, doc accepted; 41: lorem-ipsum page — C4 page gate
    // empties it, the rule gate rejects it through the normal sink
    Seq(
      (40L, "Click here\n" + prose(40) + "\nPlease enable JavaScript now.", "en"),
      (41L, prose(41) + "\nthis page is lorem ipsum filler text.\n" +
        prose(141) + "\n" + prose(241), "de"),
      // survivors balanced 2 en : 2 de so the per-batch mix keeps all
      (42L, prose(42), "de"), (43L, prose(43), "en"),
      (44L, prose(44), "de"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(drop)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING").parquet(drop)
    val q = RecipeIngest.start(stream, "doc_id", "text", "lang",
      s"$dir/accepted", s"$dir/rejected", s"$dir/index", s"$dir/ckpt", weights,
      c4Clean = true)
    try q.awaitTermination(60000) finally q.stop()

    val accepted = spark.read.parquet(s"$dir/accepted")
    val acceptedIds = accepted.select("doc_id").as[Long].collect().toSet
    assert(acceptedIds == Set(40L, 42L, 43L, 44L), acceptedIds.toString)
    val t40 = accepted.where(col("doc_id") === 40L)
      .select("text").as[String].head()
    assert(t40 == prose(40)) // junk lines gone, prose intact
    assert(spark.read.parquet(s"$dir/rejected")
      .select("doc_id").as[Long].collect().toSet == Set(41L))
  }

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    Seq((20L, mkDoc(20), "en"), (21L, mkDoc(21), "de"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(drop)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING").parquet(drop)
    val q = RecipeIngest.start(stream, "doc_id", "text", "lang",
      s"$dir/accepted", s"$dir/rejected", s"$dir/index", s"$dir/ckpt", weights,
      remixEvery = 1, remixedPath = s"$dir/remixed")
    try q.awaitTermination(60000) finally q.stop()

    assert(spark.read.parquet(s"$dir/accepted").count() == 2)
    assert(spark.read.parquet(s"$dir/index").count() == 2)
    // remixEvery=1 → the periodic corpus remix ran after the batch
    assert(spark.read.parquet(s"$dir/remixed").count() == 2)
  }

  test("classifier stage: fluent off-distribution docs passing the rule gate are cut") {
    // two 60-word family vocabularies; each doc is a seed-offset
    // stride-11 window of 36 distinct words — every doc passes the
    // Gopher rules (6-char alpha words, no dup bigrams) and docs of a
    // family share vocabulary without sharing fingerprints
    val goodV = (0 until 60).map(k =>
      s"go${('a' + k % 26).toChar}${('a' + k / 26 % 26).toChar}od")
    val spamV = (0 until 60).map(k =>
      s"sp${('a' + k % 26).toChar}${('a' + k / 26 % 26).toChar}am")
    def doc(v: IndexedSeq[String], seed: Int): String =
      (0 until 36).map(i => v((seed * 7 + i * 11) % 60)).mkString(" ")

    val dir = java.nio.file.Files.createTempDirectory("graft-clf").toString
    val (acc, rej, idx) = (s"$dir/accepted", s"$dir/rejected", s"$dir/index")

    // offline fit on a labeled seed set (good = positive class)
    val seedSet = ((0 until 8).map(i => (i.toLong, doc(goodV, i), true)) ++
      (0 until 8).map(i => (100L + i, doc(spamV, i), false)))
      .toDF("doc_id", "text", "y")
    graft.text.NbClassifier.trainAndSave(seedSet, "doc_id", "text", "y", s"$dir/clf")

    // ingest batch: NOVEL seeds from both families + a gate failure
    RecipeIngest.processBatch(
      Seq((1L, doc(goodV, 20), "en"), (2L, doc(spamV, 20), "en"),
          (3L, doc(goodV, 21), "de"), (4L, "too short", "en"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", acc, rej, idx, "runC", 0L, weights, 0L,
      clfModelPath = s"$dir/clf", clfThreshold = 0.0)

    assert(spark.read.parquet(acc).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))
    // both reject classes land in the same sink: the rule-gate
    // failure AND the classifier cut
    assert(spark.read.parquet(rej).select("doc_id").as[Long].collect().toSet
      == Set(2L, 4L))
    // only classifier survivors enter the fingerprint index
    assert(spark.read.parquet(idx).count() == 2)

    // without the model path the same batch keeps the spam doc —
    // the stage is genuinely the thing doing the cutting
    val dir2 = java.nio.file.Files.createTempDirectory("graft-clf2").toString
    RecipeIngest.processBatch(
      Seq((1L, doc(goodV, 20), "en"), (2L, doc(spamV, 20), "en"))
        .toDF("doc_id", "text", "lang"),
      "doc_id", "text", "lang", s"$dir2/a", s"$dir2/r", s"$dir2/i",
      "runC", 0L, Map("en" -> 1.0), 0L)
    assert(spark.read.parquet(s"$dir2/a").select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L))
  }
}
