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

  test("continued training is bit-identical to one long run; vocab growth carries vectors") {
    val pairs = SkipGram.pairs(clusterDocs, "doc_id", "text", window = 2)
    val full = Sgns.train(pairs, dim = 8, epochs = 5, lr = 1.0,
      negatives = 2, topV = 100, seed = "resume")
    val part = Sgns.train(pairs, dim = 8, epochs = 2, lr = 1.0,
      negatives = 2, topV = 100, seed = "resume")
    val resumed = Sgns.train(pairs, dim = 8, epochs = 3, lr = 1.0,
      negatives = 2, topV = 100, seed = "resume", init = Some(part))
    assert(resumed.inQ.toSeq == full.inQ.toSeq &&
      resumed.outQ.toSeq == full.outQ.toSeq,
      "resume from a 2-epoch checkpoint diverged from the 5-epoch run")
    // vocabulary growth: new docs add new words; carried words resume
    // their trained vectors, new words initialize fresh
    val grown = clusterDocs.unionAll(
      Seq((900L, "newword0 newword1 newword0 newword1 newword2 newword0"))
        .toDF("doc_id", "text"))
    val g = Sgns.train(SkipGram.pairs(grown, "doc_id", "text", window = 2),
      dim = 8, epochs = 1, lr = 1e-9, negatives = 2, topV = 100,
      seed = "resume", init = Some(part))
    assert(g.vocab.length == 21, g.vocab.mkString(","))
    // at a vanishing lr the carried words' vectors are (nearly) the
    // checkpoint's: gradients round to 0 under 1e-9 units
    val gIdx = g.vocab.iterator.zipWithIndex.toMap
    val pIdx = part.vocab.iterator.zipWithIndex.toMap
    part.vocab.foreach { w =>
      val (gi, pi) = (gIdx(w), pIdx(w))
      assert((0 until 8).forall(i =>
        g.inQ(gi * 8 + i) == part.inQ(pi * 8 + i)), s"carried $w moved")
    }
  }

  test("docEmbeddings: idf-weighted means cluster docs by topic and feed semantic dedup") {
    val pairs = SkipGram.pairs(clusterDocs, "doc_id", "text", window = 2)
    val m = Sgns.train(pairs, dim = 16, epochs = 120, lr = 3.0,
      negatives = 5, topV = 100, seed = "spec")
    val docEmb = Sgns.docEmbeddings(clusterDocs, "doc_id", "text",
      m.embeddingsDf(spark))
    val got = docEmb.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap
    assert(got.size == 120) // every doc has in-vocab tokens
    // doc cluster = doc_id / 100; intra-cluster doc cosine beats inter
    val ids = got.keys.toSeq.sorted
    val sample = ids.filter(_ % 7 == 0) // keep the pair loop small
    val (intra, inter) = (for {
      a <- sample; b <- sample if a < b
    } yield ((a / 100) == (b / 100), cosine(got(a), got(b))))
      .partition(_._1)
    val intraMean = intra.map(_._2).sum / intra.size
    val interMean = inter.map(_._2).sum / inter.size
    assert(intraMean > interMean + 0.3,
      s"docs not clustered: intra=$intraMean inter=$interMean")
    // feeds the ANN family: mutual-kNN clustering recovers the 3 doc
    // clusters exactly (k must span most of a
    // 40-doc cluster: the cyclic fixture creates identical-embedding
    // residue groups that mutual links must bridge)
    val clusters = graft.ops.Ann.mutualKnnClusters(
        docEmb, "doc_id", "embedding", k = 30, minCosine = 0.6)
      .as[(Long, Long)].collect().toMap
    val byComponent = clusters.groupBy(_._2).values.map(_.keys.toSet)
    assert(byComponent.size == 3, s"${byComponent.size} components")
    byComponent.foreach { members =>
      assert(members.map(_ / 100).size == 1, s"mixed component: $members")
    }
    // quantize-before-sum: the embeddings are bit-identical under a
    // different partitioning
    val again = Sgns.docEmbeddings(clusterDocs.repartition(7), "doc_id",
        "text", m.embeddingsDf(spark))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.toSeq }.toMap
    assert(again == got.map { case (id, v) => id -> v.toSeq })
  }

  test("subword SGNS: morphological clusters separate; OOV words embed near their root's cluster") {
    // three clusters whose words share a morphological ROOT — the
    // structure subword buckets exist to exploit
    val roots = Seq("payment", "transfer", "ledgerx")
    val docs = (for {
      (root, c) <- roots.zipWithIndex
      d <- 0 until 40
    } yield {
      val words = (0 until 8).map(p => f"$root${(d + p) % 6}%02d")
      (c.toLong * 100 + d, words.mkString(" "))
    }).toDF("doc_id", "text")
    val pairs = SkipGram.pairs(docs, "doc_id", "text", window = 2)
    val m = Sgns.trainSubword(pairs, dim = 16, epochs = 100, lr = 3.0,
      negatives = 5, topV = 100, buckets = 4096, minn = 3, maxn = 5,
      seed = "sub")
    assert(m.vocab.length == 18)
    def embC(w: String) = m.embeddingOf(w)
    // in-vocab separation through the COMPOSED embeddings
    val ws = m.vocab.toSeq
    def clusterOf(w: String) = roots.indexWhere(w.startsWith)
    val (intra, inter) = (for {
      a <- ws; b <- ws if a < b
    } yield (clusterOf(a) == clusterOf(b), cosine(embC(a), embC(b))))
      .partition(_._1)
    val intraMean = intra.map(_._2).sum / intra.size
    val interMean = inter.map(_._2).sum / inter.size
    assert(intraMean > interMean + 0.15,
      s"clusters not separated: intra=$intraMean inter=$interMean")
    // the fastText property: an OOV word (never in any document)
    // embeds through its ngram buckets alone, nearest its root's
    // cluster
    for ((root, c) <- roots.zipWithIndex) {
      val oov = embC(root + "99")
      val byCluster = roots.indices.map { cc =>
        val members = ws.filter(clusterOf(_) == cc)
        cc -> members.map(w => cosine(oov, embC(w))).sum / members.size
      }
      val best = byCluster.maxBy(_._2)._1
      assert(best == c, s"OOV $root" + s"99 lands in cluster $best: $byCluster")
    }
    // same fold discipline => same bit-reproducibility
    val a = Sgns.trainSubword(pairs, dim = 8, epochs = 3, lr = 1.0,
      negatives = 2, topV = 100, buckets = 512, seed = "subr")
    val b = Sgns.trainSubword(pairs.repartition(7), dim = 8, epochs = 3,
      lr = 1.0, negatives = 2, topV = 100, buckets = 512, seed = "subr")
    assert(a.inQ.toSeq == b.inQ.toSeq && a.bucketQ.toSeq == b.bucketQ.toSeq &&
      a.outQ.toSeq == b.outQ.toSeq)
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
