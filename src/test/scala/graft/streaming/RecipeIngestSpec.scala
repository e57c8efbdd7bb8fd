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

  test("streaming end-to-end over file drops") {
    val dir = java.nio.file.Files.createTempDirectory("graft-recipe-s").toString
    val drop = s"$dir/drop"; new java.io.File(drop).mkdirs()
    Seq((20L, mkDoc(20), "en"), (21L, mkDoc(21), "de"))
      .toDF("doc_id", "text", "lang").write.mode("append").parquet(drop)

    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING").parquet(drop)
    val q = RecipeIngest.start(stream, "doc_id", "text", "lang",
      s"$dir/accepted", s"$dir/rejected", s"$dir/index", s"$dir/ckpt", weights)
    try q.awaitTermination(60000) finally q.stop()

    assert(spark.read.parquet(s"$dir/accepted").count() == 2)
    assert(spark.read.parquet(s"$dir/index").count() == 2)
  }
}
