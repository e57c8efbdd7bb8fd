package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different content about spark engines and scale"),
    (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG")   // case-variant
  ).toDF("doc_id", "text")

  test("exactGroups keeps min id per content hash") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .where(col("dup_count") > 1).as[(String, Long, Long)].collect()
    assert(g.length == 1 && g.head._2 == 1L && g.head._3 == 2L)
  }

  test("dropExact removes later duplicates only") {
    val kept = Dedup.dropExact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("dropExactPreferring keeps the highest-scored copy, min id on ties") {
    val scored = Seq(
      (1L, "same content", 0.4), (2L, "same content", 0.9),
      (3L, "same content", 0.9), (4L, "other", 0.1)
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.dropExactPreferring(scored, "text", "doc_id", "q")
      .select("doc_id").as[Long].collect().sorted
    // 2 beats 1 on score; 2 beats 3 on the id tie; 4 survives alone
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("dropExactPreferring: null scores lose to any real score") {
    val scored = Seq(
      (1L, "x", Some(0.1)), (2L, "x", None), (3L, "y", None)
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.dropExactPreferring(scored, "text", "doc_id", "q")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("duplicateKeys flags repeated business keys") {
    val df = Seq(("A", 1), ("A", 2), ("B", 1)).toDF("k", "v")
    val d = Dedup.duplicateKeys(df, Seq("k")).as[(String, Long)].collect()
    assert(d.toSeq == Seq(("A", 2L)))
  }

  test("duplicateRows does not collide distinct rows (boundary/null ambiguity)") {
    // concat-style encodings collide on all of these; the JSON encoding
    // must report zero duplicates
    val distinctRows = Seq(
      (Some("ab"), Some("c")), (Some("a"), Some("bc")),   // boundary shift
      (Some("a"), None), (None, Some("a")),               // null position
      (Some(""), Some("a"))                               // empty vs null
    ).toDF("x", "y")
    assert(Dedup.duplicateRows(distinctRows).count() == 0)

    val withDup = distinctRows.union(Seq((Some("a"), None: Option[String])).toDF("x", "y"))
    val dups = Dedup.duplicateRows(withDup).as[(String, Long)].collect()
    assert(dups.length == 1 && dups.head._2 == 2L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (3L, "spark streaming stateful aggregation with watermarks and windows"),
    (4L, "spark streaming stateful aggregation with watermarks and windows"),
    (5L, "zebra xylophone quartz jackdaw vexing mymph blitz fjord glyphs")
  ).toDF("doc_id", "text")

  test("ngramJaccard finds near-dups, not unrelated docs") {
    val pairs = Similarity.ngramJaccard(docs, "doc_id", "text", k = 5, threshold = 0.3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngramJaccard maxDf cap drops hot-gram pairs") {
    val pairs = Similarity.ngramJaccard(docs, "doc_id", "text", k = 5,
      threshold = 0.0, maxDf = 1L)
    assert(pairs.count() == 0) // every shared gram has df >= 2
  }

  test("ngramContainment: doc-inside-doc scores ~1 where Jaccard stays low") {
    import spark.implicits._
    val small = "the quick brown fox jumps over the lazy dog"
    val big = small + " " + ("padding words repeated many times over " * 20)
    val df = Seq((1L, small), (2L, big), (3L, "entirely unrelated content xyz"))
      .toDF("doc_id", "text")
    val c = Similarity.ngramContainment(df, "doc_id", "text", k = 5,
        threshold = 0.8)
      .as[(Long, Long, Double, Double)].collect()
    assert(c.length == 1)
    val (id1, id2, c12, c21) = c.head
    assert((id1, id2) == (1L, 2L))
    assert(c12 >= 0.95, s"small doc should be ~fully contained, got $c12")
    assert(c21 < 0.5, s"big doc is mostly NOT in the small one, got $c21")
    // symmetric Jaccard would have missed this pair at the same bar
    val j = Similarity.ngramJaccard(df, "doc_id", "text", k = 5, threshold = 0.8)
    assert(j.isEmpty)
  }

  test("ngramContainmentLsh: parity with exact containment on surfaced pairs") {
    // 10 unique base docs, each embedded verbatim in a wrapper doc with
    // a short appendix (Jaccard ≈ 0.8, containment 1.0) — high enough
    // overlap to band reliably, asymmetric enough to exercise the
    // per-direction verify. Deterministic: fixed corpus, seeded hashes.
    val base = (1L to 10L).map(i =>
      (i, s"the unique story of item $i begins with ${i * 7919} and ends after chapter ${i * 104729}"))
    val wrappers = base.map { case (i, s) => (i + 100L, s + " plus a tiny appendix") }
    val df = (base ++ wrappers).toDF("doc_id", "text")
    def asMap(rows: Array[(Long, Long, Double, Double)]) =
      rows.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val exact = asMap(Similarity.ngramContainment(df, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect())
    val lsh = asMap(Similarity.ngramContainmentLsh(df, "doc_id", "text",
      k = 5, threshold = 0.8, numHashes = 32, rowsPerBand = 4,
      estThreshold = 0.2).as[(Long, Long, Double, Double)].collect())
    // every LSH-surfaced pair carries bit-identical containment values
    lsh.foreach { case (pair, cs) =>
      assert(exact.get(pair).contains(cs),
        s"pair $pair: lsh=$cs exact=${exact.get(pair)}")
    }
    // and all 10 planted base-in-wrapper pairs are found
    (1L to 10L).foreach { i =>
      assert(lsh.contains((i, i + 100L)), s"planted pair ($i, ${i + 100L}) missed")
      assert(lsh((i, i + 100L))._1 == 1.0, "base fully contained in wrapper")
    }
  }

  test("ngramContainmentPrefix: guaranteed recall on extreme tiny-in-huge pairs the LSH path misses") {
    // Planted needle-in-haystack: tiny docs embedded verbatim inside
    // huge hosts (containment 1.0, Jaccard << 0.05) among filler docs.
    // Distinct 'chapter N' phrases keep filler texts mutually far.
    def filler(i: Long): String =
      (0 until 60).map(j => s"chapter${i}x$j narrative").mkString(" ")
    val tiny = Seq(
      (1L, "the secret launch code is alpha tango seven"),
      (2L, "meet at the old lighthouse before dawn on tuesday"))
    val huge = tiny.map { case (i, s) =>
      (i + 100L, filler(i + 50) + " " + s + " " + filler(i + 70)) }
    val docs = (tiny ++ huge ++ (10L to 29L).map(i => (i, filler(i))))
      .toDF("doc_id", "text")

    val exact = Similarity.ngramContainment(docs, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val prefix = Similarity.ngramContainmentPrefix(docs, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    // the planted pairs have Jaccard far below any band-able estimate
    tiny.foreach { case (i, _) =>
      val cs = prefix.get((i, i + 100L))
      assert(cs.nonEmpty, s"prefix path missed planted pair ($i, ${i + 100L})")
      assert(cs.get._1 == 1.0, s"tiny doc fully contained, got ${cs.get}")
    }
    // exactness: identical pair set AND identical values vs the
    // inverted index — the recall guarantee is equality, not overlap
    assert(prefix == exact, s"prefix=$prefix exact=$exact")

    // the documented LSH contract: Jaccard banding does NOT surface
    // these pairs (if this starts passing, the containment docs and
    // the prefix path's reason-to-exist need revisiting)
    val lsh = Similarity.ngramContainmentLsh(docs, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect()
    tiny.foreach { case (i, _) =>
      assert(!lsh.exists(r => r._1 == i && r._2 == i + 100L),
        "LSH unexpectedly found an extreme-asymmetry pair; docs claim it cannot")
    }
  }

  test("ngramContainmentPrefix: boundary — containment exactly at threshold, (1-t)*n integer") {
    // A = "abcdefghijklmn": 10 distinct 5-grams; the 8 inside prefix
    // "abcdefghijkl" recur verbatim in B (df=2), the 2 tail grams
    // ("ijklm","jklmn") are A-only (df=1) and therefore A's RAREST —
    // so they fill the prefix first. Containment(A→B) = 8/10 = t
    // exactly, and (1-t)*n = 2 is an exact integer: a float-floored
    // bound (floor(0.19999…96 * 10) + 1 = 2) probes with only the two
    // outside grams and silently drops the pair; the theorem's bound
    // (3) reaches a shared gram. B's own probe can't rescue it: B's
    // rarest grams are B-unique.
    val docs = Seq(
      (1L, "abcdefghijklmn"),
      (2L, "opqrstabcdefghijkluvwxyz")).toDF("doc_id", "text")
    val exact = Similarity.ngramContainment(docs, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect()
    assert(exact.length == 1 && exact.head._1 == 1L && exact.head._2 == 2L
      && exact.head._3 == 0.8, s"fixture drifted: $exact")
    val prefix = Similarity.ngramContainmentPrefix(docs, "doc_id", "text",
      k = 5, threshold = 0.8).as[(Long, Long, Double, Double)].collect()
    assert(prefix.toSeq == exact.toSeq,
      s"prefix path lost the at-threshold pair: prefix=${prefix.toSeq} exact=${exact.toSeq}")
  }

  test("ngramContainmentPrefix: maxDf caps the universe consistently") {
    // all docs share hot boilerplate; overlap beyond it is unique
    val boiler = "standard header used by every single document here "
    val docs = (1L to 8L).map(i => (i, boiler + s"unique tail ${i * 7919} content"))
      .toDF("doc_id", "text")
    // uncapped: the shared boilerplate makes every pair high-containment
    val all = Similarity.ngramContainmentPrefix(docs, "doc_id", "text",
      k = 5, threshold = 0.8)
    assert(all.count() == 8L * 7 / 2)
    // capped below corpus size: boilerplate grams leave the universe,
    // pairs must qualify on unique content alone → none do
    val capped = Similarity.ngramContainmentPrefix(docs, "doc_id", "text",
      k = 5, threshold = 0.8, maxDf = 4)
    assert(capped.isEmpty)
  }

  test("minhash identical docs share full signature; est_jaccard = 1") {
    val pairs = Similarity.minhashPairs(docs, "doc_id", "text",
      k = 5, numHashes = 16, rowsPerBand = 4, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 3L && p._2 == 4L && p._3 == 1.0))
  }

  test("dropNearDuplicates keeps one representative per near-dup group") {
    val kept = Similarity.dropNearDuplicates(docs, "doc_id", "text",
        k = 5, numHashes = 16, rowsPerBand = 4, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(3L) && !kept.contains(4L)) // 3/4 identical → keep min
    assert(kept.contains(5L))                       // unique survives
  }

  test("dropNearDuplicates handles a mega-cluster via representative linking") {
    // 60 identical boilerplate docs + 2 distinct ones; bucket cap 10
    // forces the representative-linking path for the big cluster
    val boiler = (100L until 160L).map(i => (i, "identical boilerplate text repeated everywhere"))
    val rest = Seq((1L, "a genuinely unique document about spark"),
      (2L, "another unique doc mentioning catalyst internals"))
    val df = (boiler ++ rest).toDF("doc_id", "text")
    val kept = Similarity.dropNearDuplicates(df, "doc_id", "text",
        k = 5, numHashes = 16, rowsPerBand = 4, threshold = 0.9, maxBucket = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(100L))                     // cluster representative
    assert((101L until 160L).forall(i => !kept.contains(i)))
    assert(kept.contains(1L) && kept.contains(2L))
  }

  test("dropNearDuplicates reliable-checkpoint mode keeps the same survivors") {
    val dir = java.nio.file.Files.createTempDirectory("sim-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val default = Similarity.dropNearDuplicates(docs, "doc_id", "text",
        k = 5, numHashes = 16, rowsPerBand = 4, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    val rel = Similarity.dropNearDuplicates(docs, "doc_id", "text",
        k = 5, numHashes = 16, rowsPerBand = 4, threshold = 0.9, reliable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(rel === default)
  }

  test("minhash LSH recall vs exact n-gram Jaccard on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 300)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact 5-gram Jaccard >= 0.5
    val exact = pairSet(
      Similarity.ngramJaccard(docs, "doc_id", "text", k = 5, threshold = 0.5))
    // banded minhash at the same threshold
    val approx = pairSet(
      Similarity.minhashPairs(docs, "doc_id", "text",
        k = 5, numHashes = 32, rowsPerBand = 8, threshold = 0.5))
    assert(exact.nonEmpty, "fixture must contain true near-dup pairs")
    val recall = exact.intersect(approx).size.toDouble / exact.size
    val precision =
      if (approx.isEmpty) 1.0
      else approx.count { case (a, b) =>
        exact.contains((a, b))
      }.toDouble / approx.size
    // deterministic given the seeded corpus + hash family
    assert(recall >= 0.8, s"recall $recall")
    assert(precision >= 0.6, s"precision $precision")
  }

  test("simhash of identical docs is equal; near-dups within hamming bound") {
    val h = Similarity.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(h(3L) == h(4L))
    val pairs = Similarity.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 4L)))
  }

  test("crossMatchTopK: each left doc finds its planted right counterpart, top-1 only") {
    val left = (1L to 5L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta document number $i unique words here"))
      .toDF("doc_id", "text")
    val right = left.select((col("doc_id") + 100).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
      .unionAll(Seq((999L, "totally unrelated content qqq zzz www distinct other material"))
        .toDF("doc_id", "text"))
    val m = Similarity.crossMatchTopK(left, right, "doc_id", "text",
        k = 1, rowsPerBand = 8, minJaccard = 0.2)
      .as[(Long, Long, Double, Int)].collect()
    assert(m.length == 5, m.toSeq)
    m.foreach { case (lid, rid, est, rnk) =>
      assert(rid == lid + 100 && rnk == 1 && est > 0.5, (lid, rid, est))
    }
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.95f, 0.05f, 0.0f))  // closest to 0
  ).toDF("vec_id", "embedding")

  test("bruteTopK ranks by cosine with deterministic ties") {
    val top = Ann.bruteTopK(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toMap
    assert(top == Map(4L -> 1, 1L -> 2))
  }

  test("bruteTopKFiltered draws neighbors only from the predicate slice") {
    val withMeta = vecs.withColumn("lang",
      when(col("vec_id") % 2 === 0, "en").otherwise("de"))
    val top = Ann.bruteTopKFiltered(withMeta,
        withMeta.where(col("vec_id") === 0L), "vec_id", "embedding", k = 3,
        predicate = col("lang") === "de")
      .select("neighbor_id", "rnk").as[(Long, Int)].collect().toMap
    // unfiltered top-1 is vec 4 (en) — the filter must exclude it and
    // rank only the odd (de) vectors: 1 (cos .9938) then 3 (cos -1)
    assert(top == Map(1L -> 1, 3L -> 2))
  }

  test("centroidCosines: outlier scores low against its group's center") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.9f, 0.1f), "a"),
      (3L, Array(-1.0f, 0.0f), "a"),  // opposite of the a-cluster
      (4L, Array(0.0f, 1.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val got = Ann.centroidCosines(emb, "vec_id", "embedding", "label")
      .select("vid", "cos_centroid").as[(Long, Double)].collect().toMap
    // centroid of a = (0.3, 0.0333): vectors 1,2 align, 3 opposes
    assert(got(1L) > 0.9 && got(2L) > 0.9)
    assert(got(3L) < -0.9)
    // a singleton group's vector IS its centroid (cosine 1, quantized)
    assert(got(4L) > 0.999)
    // driver-side exact check for vector 1: quantized centroid
    val c = Seq((1.0 + 0.9 - 1.0) / 3, math.floor(0.1f.toDouble * 10000) / 10000 / 3)
    val v = Seq(1.0, 0.0)
    val dot = v.zip(c).map { case (a, b) => a * b }.sum
    val ref = dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum))
    assert(math.abs(got(1L) - math.rint(ref * 1e6) / 1e6) < 2e-6)
  }

  test("knnGraph: brute form matches bruteTopK self-join; IVF form joins on cell") {
    val brute = Ann.knnGraph(vecs, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val ref = Ann.bruteTopK(vecs, vecs, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(brute == ref && brute.nonEmpty)
    // IVF path: an exact duplicate always shares its twin's cell and
    // must appear as its rank-1 neighbor
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = vecs.union(dup)
    val g = Ann.knnGraph(corpus, "vec_id", "embedding", k = 2,
      cells = 3, nprobe = 2)
    val top = g.where(col("query_id") === 10L && col("rnk") === 1)
      .select("neighbor_id").as[Long].collect()
    assert(top.sameElements(Array(0L)))
    // the scale path must meet on cell via a SHUFFLED equi-join, not
    // by broadcasting the probe side (it IS the corpus): with auto-
    // broadcast off, the only broadcasts left are the two 1-row
    // centroid arrays, and the cell join plans shuffled
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ann.knnGraph(corpus, "vec_id", "embedding", k = 2,
        cells = 3, nprobe = 2).queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cell join must shuffle, not broadcast the corpus:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("mutualKnnClusters: planted tight groups cluster, orthogonals stay apart") {
    val emb = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f)),   // cluster A
      (2L, Array(0.99f, 0.02f, 0.0f)),
      (3L, Array(0.98f, 0.0f, 0.01f)),
      (10L, Array(0.0f, 1.0f, 0.01f)),  // cluster B
      (11L, Array(0.01f, 0.99f, 0.0f)),
      (20L, Array(0.0f, 0.0f, -1.0f))   // isolated
    ).toDF("vec_id", "embedding")
    val comps = Ann.mutualKnnClusters(emb, "vec_id", "embedding",
        k = 2, minCosine = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == comps(2L) && comps(2L) == comps(3L))
    assert(comps(10L) == comps(11L))
    assert(comps(1L) != comps(10L))
    // the isolated vector clusters alone (self-edge keeps it present)
    assert(comps(20L) != comps(1L) && comps(20L) != comps(10L))
    assert(comps.size == 6)
  }

  test("mineBitext recovers a planted alignment as mutual-argmax pairs") {
    def vec(i: Int, shift: Double): Array[Float] =
      Array.tabulate(12)(j =>
        (if (j == i) 1.0 else 0.02 * ((i * 7 + j) % 5) + shift).toFloat)
    val src = (0 until 12).map(i => (i.toLong, vec(i, 0.0))).toDF("vec_id", "embedding")
    val tgt = (0 until 12).map(i => (100L + i, vec(i, 0.003))).toDF("vec_id", "embedding")
    val pairs = Ann.mineBitext(src, tgt, "vec_id", "embedding", k = 4)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    // every src aligns with its noised copy; nothing else is mutual
    assert(pairs == (0 until 12).map(i => (i.toLong, 100L + i)).toSet, pairs)
  }

  test("mineBitext margins punish hubs (a vector close to everything)") {
    // the hub is the all-ones direction: decent cosine to every
    // one-hot-ish src, so raw cosine would often pick it — the margin
    // normalizes it away and the true pairs survive
    val src = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i) 1.0f else 0.05f)))
      .toDF("vec_id", "embedding")
    val tgt = ((0 until 8).map(i =>
      (100L + i, Array.tabulate(8)(j => if (j == i) 0.97f else 0.06f))) :+
      (999L, Array.fill(8)(0.6f)))
      .toDF("vec_id", "embedding")
    val pairs = Ann.mineBitext(src, tgt, "vec_id", "embedding", k = 3)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(_._2 == 999L), s"hub survived: $pairs")
    assert(pairs == (0 until 8).map(i => (i.toLong, 100L + i)).toSet, pairs)
  }

  test("mineHardNegatives: rank-1 positive, skip band, re-based negative ranks") {
    val triplets = Ann.mineHardNegatives(vecs, vecs.where(col("vec_id") === 0L),
        "vec_id", "embedding", numNegatives = 2, skipTop = 1)
      .select("pos_id", "neg_id", "neg_rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    // ranking for query 0: 4 (.9986), 1 (.9938), 2 (0), 3 (-1)
    // positive = 4; skip band 1 ⇒ negatives are ranks 2,3 → ids 1, 2
    assert(triplets.toSeq == Seq((4L, 1L, 1), (4L, 2L, 2)))
  }

  test("cosineNeighbors thresholds correctly") {
    val n = Ann.cosineNeighbors(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", threshold = 0.99)
      .select("neighbor_id").as[Long].collect().toSet
    assert(n == Set(1L, 4L)) // cos(0,1)=0.9938, cos(0,4)=0.9986, cos(0,2)=0
  }

  test("ivfTopK finds an exact duplicate vector (shares the query's cell)") {
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = vecs.union(dup)
    val res = Ann.ivfTopK(corpus, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, numCells = 3, nprobe = 2)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    assert(res.contains(10L) && res(10L) == 1.0)
  }

  test("ivfTopK2: two-level assignment is coarse-gated and consistent; " +
      "high recall on clustered data") {
    // 8 well-separated direction clusters × 40 members in 16 dims:
    // the structured case the hierarchical quantizer exists for
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 8; m <- 0 until 40) yield {
      val v = centers(c).map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      ((c * 40 + m).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.where(col("vec_id") % 40 === 0)
    val truth = Ann.bruteTopK(corpus, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Ann.ivfTopK2(corpus, queries, "vec_id", "embedding", 5,
        numCoarse = 4, numFine = 4, nCoarseProbe = 3, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"clustered-data recall $recall")

    // assignment consistency: every vector's fine cell belongs to its
    // coarse winner's fine set (the gate the probe ranking models)
    val (coarse, fine) = Ann.twoLevelCentroids(corpus, "vec_id", "embedding", 4, 4)
    val arrs = Ann.twoLevelArrays(coarse, fine)
    val bad = corpus.crossJoin(broadcast(arrs))
      .select(Ann.bestCell(col("embedding"), col("cents")).as("c"),
        Ann.bestCell2(col("embedding"), col("cents"), col("fines")).as("cell"))
      .where(!(col("cell") >= col("c") * 4 && col("cell") < (col("c") + 1) * 4))
      .count()
    assert(bad == 0, s"$bad vectors assigned outside their coarse gate")
  }

  test("lshTopK returns only same-bucket candidates; identical vectors always co-bucket") {
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val res = Ann.lshTopK(vecs.union(dup), vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 5, numPlanes = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res.contains(10L)) // exact duplicate must share every hyperplane sign
  }

  test("semanticSurvivors keeps one representative per near-dup cluster") {
    // cluster A: 0,1,4 mutually cosine>0.99; cluster B: 2 alone; 3 is
    // 0's antipode (cosine -1, never a near-dup, and co-bucketing is
    // impossible: every hyperplane sign flips)
    val kept = Ann.semanticSurvivors(vecs, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 2, dim = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.contains(2L) && kept.contains(3L))
    assert(!kept.contains(1L) && !kept.contains(4L),
      s"near-dups of 0 must be dropped, got $kept")
    // replayable path agrees on this corpus
    val keptR = Ann.semanticSurvivors(vecs, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 2, replayable = true, dim = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(keptR == kept)
  }

  test("semanticSurvivors hot-bucket cap: star-linking keeps one of a mega-cluster") {
    import spark.implicits._
    // 50 identical vectors (one bucket, one near-dup cluster) + 2
    // distinct singletons; maxBucket = 10 forces the star path
    val mega = (0L until 50L).map(i => (i, Array(1.0f, 0.0f, 0.0f)))
    val singles = Seq((100L, Array(0.0f, 1.0f, 0.0f)), (101L, Array(0.0f, 0.0f, 1.0f)))
    val df = (mega ++ singles).toDF("vec_id", "embedding")
    val kept = Ann.semanticSurvivors(df, "vec_id", "embedding",
        threshold = 0.99, numPlanes = 2, dim = 3, maxBucket = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L), "mega-cluster representative survives")
    assert((1L until 50L).forall(!kept.contains(_)), s"mega-cluster deduped: $kept")
    assert(kept.contains(100L) && kept.contains(101L))
  }

  test("k-means-trained IVF centroids beat the hash sample at equal probe budget") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    def recallOf(res: org.apache.spark.sql.DataFrame, truth: Set[(Long, Long)]): Double = {
      val got = res.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val truth = Ann.bruteTopK(emb, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = recallOf(
      Ann.ivfTopK(emb, q, "vec_id", "embedding", 10, 16, 4), truth)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 16, iters = 5)
    assert(cents.count() == 16)
    val trained = recallOf(
      Ann.ivfTopK(emb, q, "vec_id", "embedding", 10, 16, 4, Some(cents)), truth)
    // everything is seeded and rounded → deterministic: 0.485 vs 0.54
    assert(trained >= sampled,
      s"trained recall $trained should be >= sampled recall $sampled")
    assert(trained >= 0.5)
  }

  test("kmeansCentroids: flat per-iteration cost, zero cache accumulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).cache()
    emb.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    // 25 iterations: the r6 chained-DataFrame form grew the logical
    // plan ~3x per iteration (Catalyst spun for minutes beyond ~10)
    // and leaked one cached frame per iteration; the driver-resident
    // model makes this a sequence of flat one-job iterations
    val t0 = System.nanoTime()
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 25)
    assert(cents.count() == 4)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, s"25 iterations took $secs s — plan growth is back")
    // the r6 leak was one cached frame PER ITERATION (+25 here);
    // suites share the session and run in parallel, so a couple of
    // transient caches from concurrent suites are legitimate — assert
    // well under the leak signature, not exact equality (that form
    // flaked once the suite count grew)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before < 5, s"cached RDDs grew $before -> $after")
    emb.unpersist()
  }

  test("IVF centroid model round-trips through parquet with identical probes") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf-model").toString
    Ann.saveCentroids(cents, dir)
    val loaded = Ann.loadCentroids(spark, dir)
    def probe(c: org.apache.spark.sql.DataFrame) =
      Ann.ivfTopK(emb, q, "vec_id", "embedding", 5, 8, 2, Some(c))
        .select("query_id", "neighbor_id", "rnk")
        .as[(Long, Long, Int)].collect().toSet
    val direct = probe(cents)
    assert(direct.nonEmpty && probe(loaded) == direct)
    val e = intercept[IllegalArgumentException] {
      val bad = java.nio.file.Files.createTempDirectory("ivf-bad").toString
      vecs.write.mode("overwrite").parquet(bad)
      Ann.loadCentroids(spark, bad)
    }
    assert(e.getMessage.contains("not a centroid model"))
  }

  test("vector_sum mean matches the posexplode formulation; no Generate in plan") {
    val df = Seq(
      (0L, Array(1.0f, 2.0f)), (0L, Array(3.0f, 6.0f)),
      (1L, Array(10.0f, 0.0f))).toDF("cell", "cv")
    val agg = df.groupBy("cell")
      .agg(graft.expr.VectorSum.vectorSum(col("cv")).as("s"))
      .select(col("cell"), expr("transform(s.sums, x -> CAST(x / s.n AS FLOAT))").as("m"))
    val m = agg.as[(Long, Seq[Float])].collect().toMap
    assert(m(0L) == Seq(2.0f, 4.0f) && m(1L) == Seq(10.0f, 0.0f))
    // the whole point: per-cell centroid update must NOT explode the
    // vectors into |rows|·dim scalars before the shuffle
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"unexpected explode in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg in:\n$plan")
  }

  test("vector_sum rejects mixed vector lengths instead of truncating") {
    val df = Seq((0L, Array(1.0f, 2.0f)), (0L, Array(3.0f))).toDF("cell", "cv")
    val e = intercept[Exception] {
      df.groupBy("cell").agg(graft.expr.VectorSum.vectorSum(col("cv"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("mixed vector lengths")))
  }

  test("tuneBanding: S-curve arithmetic, recall clearing, noise minimization") {
    // exact curve point: r=4, b=8 at s=0.8 -> 1-(1-0.8^4)^8
    val expect = 1.0 - math.pow(1.0 - math.pow(0.8, 4), 8)
    assert(math.abs(Similarity.bandingRecall(0.8, 4, 8) - expect) < 1e-12)
    // 32 hashes, threshold 0.8: the pick must clear 0.9 recall at the
    // threshold and have the LOWEST noise candidate rate among clearing
    // splits - verified against brute enumeration
    val (r, b, rec, noise) = Similarity.tuneBanding(32, 0.8)
    assert(r * b == 32 && rec >= 0.9, s"($r,$b,$rec)")
    val all = (1 to 32).filter(32 % _ == 0).map { rr =>
      val bb = 32 / rr
      (rr, bb, Similarity.bandingRecall(0.8, rr, bb),
        Similarity.bandingRecall(0.1, rr, bb))
    }
    val clearing = all.filter(_._3 >= 0.9)
    assert(clearing.nonEmpty && noise == clearing.map(_._4).min)
    // a HIGHER threshold picks more rows per band (sharper curve):
    // monotonicity of the auto-dial
    val loose = Similarity.tuneBanding(32, 0.5)._1
    val strict = Similarity.tuneBanding(32, 0.95)._1
    assert(strict >= loose, s"strict $strict < loose $loose")
    // impossible recall target falls back to the highest-recall split
    val (rf, bf, recF, _) = Similarity.tuneBanding(4, 0.99, minRecall = 0.999999)
    assert(rf * bf == 4 && recF == (1 to 4).filter(4 % _ == 0)
      .map(rr => Similarity.bandingRecall(0.99, rr, 4 / rr)).max)
  }

  test("minhashPairsAuto matches the manual form at its tuned banding") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text with no overlap at all whatsoever"),
      (4L, "another unrelated document about entirely other things")
    ).toDF("doc_id", "text")
    val (r, _, _, _) = Similarity.tuneBanding(32, 0.8)
    val auto = Similarity.minhashPairsAuto(docs, "doc_id", "text",
        threshold = 0.8)
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val manual = Similarity.minhashPairs(docs, "doc_id", "text",
        rowsPerBand = r, threshold = 0.8)
      .select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto == manual && auto == Set((1L, 2L)), s"auto=$auto manual=$manual")
  }
}
