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

  test("rejects silly thresholds") {
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "doc_id", "text", 64, 0.0)
    }
    intercept[IllegalArgumentException] {
      AllPairs.cosinePairs(docs, "doc_id", "text", 64, 1.5)
    }
  }
}
