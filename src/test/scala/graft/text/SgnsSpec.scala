package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SgnsSpec extends SparkSpec {
  import spark.implicits._

  /** Three disjoint 6-word clusters; docs only ever mix words WITHIN
    * a cluster, so co-occurrence structure = cluster structure and a
    * working SGNS must embed clusters as cosine neighborhoods. Docs
    * are deterministic index arithmetic — no RNG. */
  private def clusterDocs = {
    val docs = for {
      c <- 0 until 3
      d <- 0 until 40
    } yield {
      // consecutive cyclic windows: every cluster word appears with
      // uniform frequency and co-occurs with every other eventually
      val words = (0 until 8).map(p => s"c${c}w${(d + p) % 6}")
      (c.toLong * 100 + d, words.mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.sqrt(na * nb + 1e-30)
  }

  test("planted clusters: intra-cluster cosine beats inter-cluster; ANN top-1 is intra") {
    val pairs = SkipGram.pairs(clusterDocs, "doc_id", "text", window = 2)
    val m = Sgns.train(pairs, dim = 16, epochs = 120, lr = 3.0,
      negatives = 5, topV = 100, seed = "spec")
    assert(m.vocab.length == 18, m.vocab.mkString(","))
    val emb = m.vocab.zipWithIndex.map { case (w, wi) =>
      w -> (0 until m.dim).map(i => (m.inQ(wi * m.dim + i) / 1e9).toFloat).toArray
    }.toMap
    def cluster(w: String) = w.charAt(1)
    val ws = m.vocab.toSeq
    val (intra, inter) = (for {
      a <- ws; b <- ws if a < b
    } yield (cluster(a) == cluster(b), cosine(emb(a), emb(b))))
      .partition(_._1)
    val intraMean = intra.map(_._2).sum / intra.size
    val interMean = inter.map(_._2).sum / inter.size
    assert(intraMean > interMean + 0.3,
      s"clusters not separated: intra=$intraMean inter=$interMean")
    // the embeddings feed the ANN family directly: brute kNN over the
    // embeddingsDf frame must rank an intra-cluster word top-1 for
    // every word
    val knn = graft.ops.Ann.knnGraph(
        m.embeddingsDf(spark).select("word_id", "embedding"),
        "word_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(knn.length == 18)
    knn.foreach { case (q, n) =>
      val (qw, nw) = (m.vocab(q.toInt), m.vocab(n.toInt))
      assert(cluster(qw) == cluster(nw), s"top-1 of $qw is cross-cluster $nw")
    }
  }

  test("training is bit-reproducible across partitionings") {
    val pairs = SkipGram.pairs(clusterDocs, "doc_id", "text", window = 2)
    val a = Sgns.train(pairs, dim = 8, epochs = 5, lr = 1.0,
      negatives = 2, topV = 100, seed = "repro")
    val b = Sgns.train(pairs.repartition(7), dim = 8, epochs = 5, lr = 1.0,
      negatives = 2, topV = 100, seed = "repro")
    assert(a.vocab.toSeq == b.vocab.toSeq)
    assert(a.inQ.toSeq == b.inQ.toSeq, "input matrix differs across partitionings")
    assert(a.outQ.toSeq == b.outQ.toSeq, "output matrix differs across partitionings")
  }

  test("loss curve decreases; save/load round-trips bit-identically") {
    val pairs = SkipGram.pairs(clusterDocs, "doc_id", "text", window = 2)
    val m = Sgns.train(pairs, dim = 8, epochs = 10, lr = 2.0,
      negatives = 3, topV = 100, seed = "loss")
    assert(m.lossQ.length == 10)
    assert(m.lossQ.last < m.lossQ.head,
      s"loss did not decrease: ${m.lossQ.toSeq}")
    val path = java.nio.file.Files.createTempDirectory("sgns-model").toString + "/m"
    Sgns.saveModel(spark, m, path)
    val back = Sgns.loadModel(spark, path)
    assert(back.dim == m.dim && back.vocab.toSeq == m.vocab.toSeq)
    assert(back.inQ.toSeq == m.inQ.toSeq && back.outQ.toSeq == m.outQ.toSeq)
    assert(back.lossQ.toSeq == m.lossQ.toSeq)
  }

  test("deepwalk closes walks -> pairs -> embeddings: two communities separate") {
    // two 6-cliques bridged by ONE edge: walks stay mostly inside
    // their community, so node embeddings must cluster by community
    def clique(tag: String) = for {
      i <- 0 until 6; j <- 0 until 6 if i != j
    } yield (s"$tag$i", s"$tag$j")
    val edges = (clique("a") ++ clique("b") ++ Seq(("a0", "b0"), ("b0", "a0")))
      .toDF("src", "dst")
    val m = Sgns.deepwalk(edges, walksPerNode = 8, walkLen = 6,
      window = 2, dim = 8, epochs = 40, lr = 2.0, negatives = 3,
      seed = "dw")
    assert(m.vocab.length == 12)
    val emb = m.vocab.zipWithIndex.map { case (w, wi) =>
      w -> (0 until m.dim).map(i => (m.inQ(wi * m.dim + i) / 1e9).toFloat).toArray
    }.toMap
    val ws = m.vocab.toSeq
    val (intra, inter) = (for {
      a <- ws; b <- ws if a < b
    } yield (a.charAt(0) == b.charAt(0), cosine(emb(a), emb(b))))
      .partition(_._1)
    val intraMean = intra.map(_._2).sum / intra.size
    val interMean = inter.map(_._2).sum / inter.size
    assert(intraMean > interMean + 0.2,
      s"communities not separated: intra=$intraMean inter=$interMean")
  }
}
