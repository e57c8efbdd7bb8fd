package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def md5h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hand case: window minima with rightmost tie-break, deduped by position") {
    // k=1, w=2 over "aba": grams a(1) b(2) a(3); windows {1,2},{2,3}.
    // Whichever of h(a),h(b) is smaller decides the selection — the
    // test computes the same md5-derived hashes and predicts exactly.
    val out = Winnowing.fingerprints(
        Seq((1L, "aba")).toDF("doc_id", "text"), "doc_id", "text",
        k = 1, w = 2)
      .select("pos", "fp").as[(Long, Long)].collect().toSet
    val (ha, hb) = (md5h60("a"), md5h60("b"))
    val expected =
      if (ha < hb) Set((1L, ha), (3L, ha)) // a wins both windows; rightmost a in win2 is pos 3
      else Set((2L, hb))                   // b wins both windows; same position dedupes
    assert(out == expected, s"ha=$ha hb=$hb got $out")
  }

  test("documents shorter than k + w - 1 yield no fingerprints") {
    val out = Winnowing.fingerprints(
      Seq((1L, "abcdefg")).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, w = 4)
    assert(out.count() == 0) // needs >= 8 chars
    assert(Winnowing.fingerprints(
      Seq((1L, "abcdefgh")).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, w = 4).count() >= 1)
  }

  test("the winnowing guarantee: a shared >= k+w-1 substring forces a shared fingerprint") {
    val core = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, "PREFIX AAA " + core + " SUFFIX one"),
      (2L, "totally different opening here " + core),
      (3L, "unrelated text with nothing in common whatsoever qqq zzz"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.sharedPairs(docs, "doc_id", "text",
        k = 5, w = 4, minShared = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), pairs)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), pairs)
  }

  test("density: roughly 1/w of grams selected, never more than window count") {
    val text = (1 to 80).map(i => f"tok$i%03d").mkString(" ")
    val nGrams = text.length - 5 + 1
    val n = Winnowing.fingerprints(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      k = 5, w = 8).count()
    assert(n >= nGrams / (2 * 8), s"$n too sparse for $nGrams grams")
    assert(n <= nGrams / 2, s"$n too dense for $nGrams grams")
  }

  test("production xxhash path selects valid positions with same density shape") {
    val text = (1 to 60).map(i => f"w$i%03d").mkString(" ")
    val md5n = Winnowing.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = 5, w = 4, replayable = true).count()
    val xxn = Winnowing.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = 5, w = 4, replayable = false).count()
    // different hash functions select different minima but the same
    // ~2/(w+1) expected density
    assert(math.abs(md5n - xxn) <= math.max(md5n, xxn) / 2, (md5n, xxn))
  }

  test("native deque selection matches the HOF executable spec exactly") {
    // varied texts incl. heavy repetition (tie-break stress) and the
    // shortest legal length
    val docs = ((1 to 30).map(i =>
      (i.toLong, s"document $i " + ("ab" * (i % 7 + 1)) + s" tail ${i * 37}")) :+
      (99L, "aaaaaaaaaa") :+ (100L, "abcdefgh"))
      .toDF("doc_id", "text")
    val native = Winnowing.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .as[(Long, Long, Long)].collect().toSet
    val hof = docs
      .select(col("doc_id").as("id"), lower(col("text")).as("s"))
      .where(length(col("s")) >= 8)
      .select(col("id"), graft.expr.CharGrams.charGrams(col("s"), 5, distinct = false).as("g"))
      .select(col("id"), expr("transform(g, x -> CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT))").as("h"))
      .repartition(col("id"))
      .select(col("id"), Winnowing.winnowSelectHof(4).as("sel"))
      .select(col("id"), explode_outer(col("sel")).as("x"))
      .where(col("x").isNotNull)
      .select(col("id"), col("x.pos"), col("x.fp"))
      .as[(Long, Long, Long)].collect().toSet
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("duplicateSpans localizes a cross-doc boilerplate; strip removes its core") {
    val boiler = "THIS SOFTWARE IS PROVIDED AS IS WITHOUT WARRANTY OF ANY KIND EXPRESS OR IMPLIED"
    val (k, w) = (20, 8)
    // 12 docs share the boilerplate mid-text at a KNOWN position;
    // 3 docs carry none; unique filler everywhere else
    def filler(i: Long, n: Int) = (0 until n).map(p =>
      java.lang.Long.toHexString(i * 131 + p * 17 + 3)).mkString(" ")
    val insertAfter = 60
    // 20 filler words guarantee >= 60 chars, so the prefix is UNIQUE
    // right up to the boundary (a shared pad would itself be a real
    // cross-doc duplicate and widen the span - by design)
    def prefix(i: Long) = filler(i, 20).take(insertAfter)
    val docs = ((1L to 12L).map { i =>
      (i, prefix(i) + boiler + " " + filler(i + 100, 15))
    } ++ (13L to 15L).map(i => (i, filler(i, 25)))).toDF("doc_id", "text")
    val spans = Winnowing.duplicateSpans(docs, "doc_id", "text",
      k = k, w = w, minDf = 10)
      .as[(Long, Long, Long)].collect()
    val byDoc = spans.groupBy(_._1)
    assert((1L to 12L).forall(byDoc.contains), s"missing docs: ${byDoc.keySet}")
    assert((13L to 15L).forall(i => !byDoc.contains(i)))
    val regionStart = insertAfter + 1 // 1-based
    // the shared region includes the space APPENDED after the boiler
    // (it too is identical across the 12 docs - by design)
    val regionEnd = regionStart + boiler.length + 1 // exclusive
    byDoc.filterKeys(_ <= 12L).foreach { case (id, ss) =>
      assert(ss.length == 1, s"doc $id spans: ${ss.toSeq}")
      val (_, start, len) = ss.head
      assert(start >= regionStart && start <= regionStart + w - 1,
        s"doc $id span starts at $start, region at $regionStart")
      assert(start + len <= regionEnd, s"doc $id span ends past the region")
      // at most w-1 leading + w-2 trailing chars of the region survive
      assert(len >= boiler.length - (w - 1) - (w - 2), s"doc $id len $len")
    }
    // strip: the boilerplate CORE is gone, everything else survives
    val cleaned = Winnowing.stripDuplicateSpans(docs, "doc_id", "text",
      k = k, w = w, minDf = 10)
      .select("id", "cleaned", "n_spans", "removed_chars")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val core = boiler.substring(w, boiler.length - w)
    (1L to 12L).foreach { i =>
      val (_, c, n, rem) = cleaned(i)
      assert(!c.contains(core), s"doc $i still contains the core")
      assert(n == 1 && rem >= boiler.length - (w - 1) - (w - 2))
      // the doc's own filler survives around the removed span
      assert(c.startsWith(prefix(i).take(40)))
      assert(c.contains(filler(i + 100, 15).takeRight(30)))
    }
    (13L to 15L).foreach { i =>
      val (_, c, n, rem) = cleaned(i)
      assert(c == filler(i, 25) && n == 0 && rem == 0)
    }
    // partitioning determinism
    val again = Winnowing.stripDuplicateSpans(docs.repartition(7), "doc_id",
        "text", k = k, w = w, minDf = 10)
      .select("id", "cleaned", "n_spans", "removed_chars")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == cleaned)
  }

  test("topDuplicateSubstrings reports the planted boilerplate with exact doc counts") {
    val boiler = "STANDARD FOOTER APPEARING IN MOST DOCUMENTS HERE"
    def filler(i: Long, n: Int) = (0 until n).map(p =>
      java.lang.Long.toHexString(i * 131 + p * 17 + 3)).mkString(" ")
    val docs = ((1L to 12L).map(i => (i, filler(i, 15) + " " + boiler)) ++
      (13L to 15L).map(i => (i, filler(i, 25)))).toDF("doc_id", "text")
    val top = Winnowing.topDuplicateSubstrings(docs, "doc_id", "text",
        k = 20, w = 8, minDf = 10, topK = 5)
      .as[(Long, String)].collect()
    assert(top.nonEmpty && top.forall(_._1 == 12L), top.toSeq.toString)
    // every reported snippet is a verbatim substring of the boilerplate
    // region (" " + boiler); snippets are k = 20 chars
    top.foreach { case (_, snip) =>
      assert(snip.length == 20 && (" " + boiler).contains(snip), s"'$snip'")
    }
  }

  test("sharedPairs maxDf drops boilerplate fingerprints") {
    val banner = "standard footer text appearing everywhere in the corpus now"
    val docs = (1L to 6L).map(i => (i, s"document body $i distinct words $i " + banner))
      .toDF("doc_id", "text")
    val all = Winnowing.sharedPairs(docs, "doc_id", "text", k = 5, w = 4,
      minShared = 1).count()
    val capped = Winnowing.sharedPairs(docs, "doc_id", "text", k = 5, w = 4,
      minShared = 1, maxDf = 3).count()
    assert(all == 15, s"banner links all 6 docs: $all") // 6 choose 2
    assert(capped < all, s"capped=$capped all=$all")
  }
}
