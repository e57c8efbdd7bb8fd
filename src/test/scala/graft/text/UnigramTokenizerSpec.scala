package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  // a corpus where "ab" is overwhelmingly a unit: the unigram model
  // must keep piece "ab" through pruning and Viterbi must prefer it
  // over ["a","b"]
  private def corpus = Seq(
    (1L, Seq.fill(20)("ab").mkString(" ")),
    (2L, Seq.fill(20)("abab").mkString(" ")),
    (3L, "cd cd cd"),
    (4L, "a b c d"))
    .toDF("doc_id", "text")

  test("dominant multi-char piece survives pruning and wins Viterbi") {
    val m = UnigramTokenizer.train(corpus, "text", vocabSize = 8,
      maxPieceLen = 4)
    assert(m.pieces.contains("ab"), m.pieces.toSeq)
    // singles always retained: the coverage floor
    for (c <- Seq("a", "b", "c", "d")) assert(m.pieces.contains(c), c)
    // one likely piece beats two: "abab" (a frequent whole word) stays
    // a unit; "ababab" (never a word) decomposes into two pieces, not
    // three — and the equal-likelihood split ties break on the longer
    // LAST piece, so ["ab","abab"] beats ["abab","ab"]
    val segs = UnigramTokenizer.segment(
      Seq((1L, "ab abab ababab")).toDF("doc_id", "text"), "text", m)
      .select("tokens").as[Seq[String]].head()
    assert(segs == Seq("ab", "abab", "ab", "abab"), segs)
  }

  test("training is bit-deterministic across partitionings") {
    val m1 = UnigramTokenizer.train(corpus.repartition(1), "text",
      vocabSize = 8, maxPieceLen = 4)
    val m2 = UnigramTokenizer.train(corpus.repartition(7), "text",
      vocabSize = 8, maxPieceLen = 4)
    assert(m1.pieces.toSeq == m2.pieces.toSeq)
    assert(m1.lpQ.toSeq == m2.lpQ.toSeq)
  }

  test("vocab size honored: multi-char pieces pruned down, singles kept") {
    val m = UnigramTokenizer.train(corpus, "text", vocabSize = 6,
      maxPieceLen = 4, seedFactor = 8)
    assert(m.size <= math.max(6, m.pieces.count(_.length == 1)), m.pieces.toSeq)
    assert(m.pieces.filter(_.length == 1).toSet == Set("a", "b", "c", "d"))
  }

  test("unseen characters segment as themselves at the UNK floor") {
    val m = UnigramTokenizer.train(corpus, "text", vocabSize = 8,
      maxPieceLen = 4)
    val toks = UnigramTokenizer.segment(
      Seq((1L, "abxq")).toDF("doc_id", "text"), "text", m)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("ab", "x", "q"), toks)
  }

  test("null text yields null tokens; token count column is exact") {
    val df = Seq((1L, "ab cd"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = UnigramTokenizer.train(corpus, "text", vocabSize = 8,
      maxPieceLen = 4)
    val rows = UnigramTokenizer.segment(df, "text", m)
      .select("doc_id", "n_unigram_tokens").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(2L).isEmpty)
    assert(rows(1L).contains(2L)) // "ab" + "cd"
  }

  test("model round-trips through parquet with identical segmentation") {
    val m = UnigramTokenizer.train(corpus, "text", vocabSize = 8,
      maxPieceLen = 4)
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString
    UnigramTokenizer.saveModel(spark, m, s"$dir/model")
    val m2 = UnigramTokenizer.loadModel(spark, s"$dir/model")
    val docs = Seq((1L, "abab cd a")).toDF("doc_id", "text")
    val t1 = UnigramTokenizer.segment(docs, "text", m)
      .select("tokens").as[Seq[String]].head()
    val t2 = UnigramTokenizer.segment(docs, "text", m2)
      .select("tokens").as[Seq[String]].head()
    assert(t1 == t2)
  }

  test("viterbi tie-break: fewer pieces, then longer last piece") {
    // equal log-probs for all pieces: "abc" as one piece beats any
    // split; with only 2-char pieces, ["ab","c"] vs ["a","bc"] —
    // equal count — longer LAST piece prefers ["a","bc"]
    val m = UnigramTokenizer.UnigramModel(
      Array("a", "b", "c", "ab", "bc", "abc"), Array.fill(6)(-1000000L))
    assert(UnigramTokenizer.viterbi("abc", m).toSeq == Seq("abc"))
    val m2 = UnigramTokenizer.UnigramModel(
      Array("a", "b", "c", "ab", "bc"), Array.fill(5)(-1000000L))
    assert(UnigramTokenizer.viterbi("abc", m2).toSeq == Seq("a", "bc"))
  }

  test("segmentation likelihood beats greedy-longest-match where they differ") {
    // "abcd": longest-first greedy grabs "abc"+"d"; Viterbi with a
    // strong "cd" piece prefers "ab"+"cd" when its total prob is higher
    val m = UnigramTokenizer.UnigramModel(
      Array("a", "b", "c", "d", "ab", "cd", "abc"),
      Array(-9000000L, -9000000L, -9000000L, -5000000L,
        -1000000L, -1000000L, -4000000L))
    // abc+d = -4e6 + -5e6 = -9e6; ab+cd = -1e6 + -1e6 = -2e6 → wins
    assert(UnigramTokenizer.viterbi("abcd", m).toSeq == Seq("ab", "cd"))
  }
}
