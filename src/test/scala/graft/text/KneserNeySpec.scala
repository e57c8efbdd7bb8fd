package graft.text

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: same tokenization, counts, probability
    * tree (same association order), and 1e-4 floor quantization. */
  private def refScores(docs: Seq[(Long, String)], d: Double = 0.75)
      : Map[Long, (Long, Double)] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tokd = docs.map { case (id, t) => id -> toks(t) }
    def ngrams(n: Int) = tokd.flatMap { case (id, ts) =>
      ts.sliding(n).filter(_.size == n).map(g => (id, g))
    }
    val tri = ngrams(3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bi = ngrams(2).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n12dot = tri.keys.groupBy(g => (g(0), g(1))).view.mapValues(_.size.toLong).toMap
    val nDot23 = tri.keys.groupBy(g => (g(1), g(2))).view.mapValues(_.size.toLong).toMap
    val nDot2dot = tri.keys.groupBy(_(1)).view.mapValues(_.size.toLong).toMap
    val n2dot = bi.keys.groupBy(_(0)).view.mapValues(_.size.toLong).toMap
    val nDot3 = bi.keys.groupBy(_(1)).view.mapValues(_.size.toLong).toMap
    val n1pp = bi.size.toLong
    def lpq(g: Seq[String]): Long = {
      val (w1, w2, w3) = (g(0), g(1), g(2))
      val pCont = (nDot3(w3) + 1).toDouble / (n1pp + 1).toDouble
      val pBi = math.max(nDot23((w2, w3)) - d, 0.0) / nDot2dot(w2) +
        (d * n2dot(w2) / nDot2dot(w2)) * pCont
      val pTri = math.max(tri(g) - d, 0.0) / bi(Seq(w1, w2)) +
        (d * n12dot((w1, w2)) / bi(Seq(w1, w2))) * pBi
      math.floor(math.log(pTri) * 10000.0).toLong
    }
    ngrams(3).groupBy(_._1).map { case (id, gs) =>
      val qs = gs.map(g => lpq(g._2))
      id -> (qs.size.toLong, qs.sum.toDouble / qs.size / 10000)
    }
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the dog sat on the mat"),
    (4L, "a cat and a dog and a bird"),
    (5L, "colorless green ideas sleep furiously tonight"))

  test("scoreSelf matches the sequential reference bit-for-bit") {
    val got = KneserNey.scoreSelf(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == refScores(corpus))
  }

  test("result is invariant to input partitioning") {
    val df = corpus.toDF("doc_id", "text")
    val a = KneserNey.scoreSelf(df.repartition(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = KneserNey.scoreSelf(df.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("docs with fewer than 3 tokens are omitted") {
    val df = (corpus :+ (9L -> "two words") :+ (10L -> "one")).toDF("doc_id", "text")
    val ids = KneserNey.scoreSelf(df, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9L) && !ids.contains(10L) && ids.contains(1L))
  }

  test("trigram probabilities over the vocabulary nearly normalize for a seen context") {
    // interior context "sat on": sum_w3 p(w3 | sat on) should be ~1
    // (exactly 1 up to the +1/(n1pp+1) backstop inflation)
    val docs = corpus.toDF("doc_id", "text")
    val model = KneserNey.train(docs, "doc_id", "text")
    val vocab = corpus.flatMap(_._2.toLowerCase.split("\\s+")).distinct
    val probes = vocab.zipWithIndex.map { case (w, i) =>
      (100L + i, s"sat on $w")
    }
    val scored = KneserNey.score(probes.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect()
    val mass = scored.map(r => math.exp(r.getDouble(2))).sum
    // exact KN normalizes to 1; the +1/(n1pp+1) unseen-word backstop
    // inflates the continuation distribution by V/(n1pp+1), which at
    // this toy scale (V=16 vocab, 19 bigram types) admits ~0.14 extra
    // mass through the two backoff weights — negligible at corpus
    // scale where V ≪ distinct bigram types
    assert(mass > 0.95 && mass < 1.15, s"mass $mass")
  }

  test("continuation counts implement the Francisco property") {
    // "francisco" occurs 4 times but ALWAYS after "san"; "mixed"
    // occurs 4 times after 4 distinct predecessors. Same unigram
    // frequency, opposite continuation counts.
    val docs = Seq(
      (1L, "san francisco x san francisco y san francisco z san francisco"),
      (2L, "a mixed b mixed c mixed d mixed")
    ).toDF("doc_id", "text")
    val cont = KneserNey.train(docs, "doc_id", "text").cont
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cont("francisco") == 1L)
    assert(cont("mixed") == 4L)
  }

  test("gibberish scores below prose under a prose-trained model") {
    val prose = (1L to 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    val model = KneserNey.train(prose.toDF("doc_id", "text"), "doc_id", "text")
    val probe = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "dog the brown lazy river jumps quick the fox")
    ).toDF("doc_id", "text")
    val s = KneserNey.score(probe, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) > s(101L))
  }
}
