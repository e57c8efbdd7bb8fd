package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllPairsSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .where(col("doc_id") < 80)

  /** Brute-force reference: exact quantized cosine for EVERY pair
    * from the same TF-IDF vectors the operator uses. */
  private def brute(threshold: Double): Map[(Long, Long), Long] = {
    val tf = graft.text.TfIdf.hashedTfIdf(docs, "doc_id", "text", 64,
        replayable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = tf.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map(r => r._2 -> r._3).toMap }
    val ids = vecs.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- 0 until i
      (a, b) = (ids(j), ids(i))
      va = vecs(a); vb = vecs(b)
      dot = va.keySet.intersect(vb.keySet).toSeq
        .map(k => va(k) * vb(k)).sum if dot > 0
      cosQ = math.floor(dot / (math.sqrt(va.values.map(w => (w * w).toDouble).sum)
        * math.sqrt(vb.values.map(w => (w * w).toDouble).sum)) * 10000).toLong
      if cosQ >= math.floor(threshold * 10000).toLong
    } yield (a, b) -> cosQ).toMap
  }

  test("prefix filtering is result-transparent: pairs == brute force") {
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val got = AllPairs.cosinePairs(docs, "doc_id", "text", 64, t,
          replayable = true)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = brute(t)
      assert(got === want, s"threshold $t: got ${got.size}, want ${want.size}")
      assert(want.nonEmpty || t > 0.85, s"degenerate fixture at $t")
    }
  }

  test("the prefix index is a strict subset of the full feature index") {
    // pruning must actually happen, not just be harmless: re-derive
    // the indexed feature count the operator builds internally and
    // compare with the full postings size
    val tf = graft.text.TfIdf.hashedTfIdf(docs, "doc_id", "text", 64,
      replayable = true)
    val norms = tf.groupBy("doc_id").agg(sum(col("w_q") * col("w_q")).as("n2"))
    val nw = tf.join(norms, "doc_id").select(col("doc_id"), col("bucket"),
      (col("w_q") / sqrt(col("n2"))).as("nw"))
    val maxw = nw.groupBy("bucket").agg(max("nw").as("mw"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("mw").asc, col("bucket").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val idxCount = nw.join(maxw, "bucket")
      .withColumn("b", sum(col("nw") * col("mw")).over(wnd))
      .where(col("b") >= 0.7).count()
    val full = tf.count()
    assert(idxCount < full, s"prefix $idxCount vs full $full")
    assert(idxCount > 0)
  }

  test("adversarial near-universal feature: maxDf cap bounds candidates, keeps true pairs") {
    import spark.implicits._
    // every doc carries the token "spam"; one doc is ONLY "spam",
    // driving that bucket's corpus-max normalized weight to 1.0 so it
    // sorts LAST in the canonical order — i.e. it lands in every doc's
    // prefix index and, uncapped, welds the corpus into one candidate
    // clique. Unique filler keeps true cross-doc similarity near zero;
    // two planted near-dup pairs share their filler.
    val n = 120
    val fill = (i: Int) => (0 until 8).map(j => s"tok_${i}_$j").mkString(" ")
    val docs =
      ((1 to n).map(i => (i.toLong, s"${fill(i)} spam")) :+
        (900L, "spam spam spam spam") :+
        (901L, fill(1) + " extra spam") :+          // near-dup of doc 1
        (902L, fill(2) + " other spam")             // near-dup of doc 2
      ).toDF("doc_id", "text")
    // dim large enough that filler-token bucket collisions stay rare
    // (≈970 tokens into 2048 buckets); the hot spam bucket still holds
    // every doc, so df(hot) = n + 3 ≫ the cap
    val dim = 2048

    def candidates(maxDf: Long): Long = {
      val tf0 = graft.text.TfIdf.hashedTfIdf(docs, "doc_id", "text", dim,
        replayable = true)
      val tf = if (maxDf > 0) {
        val hot = tf0.groupBy("bucket").agg(count(lit(1)).as("df"))
          .where(col("df") > maxDf).select("bucket")
        tf0.join(broadcast(hot), Seq("bucket"), "left_anti")
      } else tf0
      val norms = tf0.groupBy("doc_id").agg(sum(col("w_q") * col("w_q")).as("n2"))
      val nw = tf.join(norms, "doc_id").select(col("doc_id"), col("bucket"),
        (col("w_q") / sqrt(col("n2"))).as("nw"))
      val maxw = nw.groupBy("bucket").agg(max("nw").as("mw"))
      val wnd = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("mw").asc, col("bucket").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val idx = nw.join(maxw, "bucket")
        .withColumn("b", sum(col("nw") * col("mw")).over(wnd))
        .where(col("b") >= 0.5 - 1e-9).select("doc_id", "bucket")
      idx.as("a").join(idx.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    val uncapped = candidates(0L)
    val capped = candidates(50L)
    // uncapped: the hot bucket alone contributes ~n²/2 candidates
    assert(uncapped > (n.toLong * n / 4),
      s"fixture not adversarial enough: $uncapped candidates")
    // capped: candidate generation is bounded by genuine filler overlap
    assert(capped < 4L * n, s"cap failed to bound candidates: $capped")

    // capped results: both planted pairs surface with exact cos_q;
    // no unrelated cross-doc pair sneaks in
    val got = AllPairs.cosinePairs(docs, "doc_id", "text", dim, 0.5,
        replayable = true, maxDf = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((1L, 901L)) && got.contains((2L, 902L)),
      s"planted near-dup pairs missing: ${got.keys}")
    assert(got.keySet.forall { case (a, b) =>
      Set((1L, 901L), (2L, 902L)).contains((a, b)) || a == 900L || b == 900L },
      s"unexpected pairs: ${got.keys}")
  }

  test("rejects silly thresholds") {
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "doc_id", "text", 64, 0.0)
    }
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "doc_id", "text", 64, 1.5)
    }
  }
}
