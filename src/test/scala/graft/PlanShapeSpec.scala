package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-SHAPE regressions: the optimizations SURVEY §6 documents are
  * asserted here so they cannot silently rot — pushdown reaching the
  * scan, dims broadcasting, top-k avoiding a global sort, and no
  * accidental cartesian products anywhere in the suite.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q1: scan is pruned to the referenced columns only") {
    val p = plan("q1_pricing_summary")
    val read = p.linesIterator.find(_.trim.startsWith("ReadSchema:")).get
    assert(!read.contains("l_partkey") && !read.contains("l_suppkey"),
      s"q1 should not read join keys it never uses: $read")
  }

  test("q5: all four dimension joins broadcast") {
    val p = plan("q5_region_revenue")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 4, s"expected >= 4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort+limit") {
    assert(plan("q_top_purchasers").contains("TakeOrderedAndProject"))
    assert(plan("q3_shipping_priority").contains("TakeOrderedAndProject"))
    assert(plan("q10_returned_items").contains("TakeOrderedAndProject"))
  }

  test("q7: five dimension joins broadcast; fact-fact join is the only shuffle join") {
    val p = plan("q7_volume_shipping")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 5, s"expected >= 5 broadcast joins, got $broadcasts:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate range must reach the lineitem scan")
  }

  test("q8: seven-table join keeps every dimension broadcast") {
    val p = plan("q8_market_share")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 6, s"expected >= 6 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("q2: supplier/part/per-part-min all broadcast; top-100 is TakeOrdered") {
    val p = plan("q2_min_cost_supplier")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >= 3 broadcast joins, got $broadcasts:\n$p")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q16: part filter and flagged-supplier anti join both broadcast") {
    val p = plan("q16_part_supplier_counts")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, p)
    // lineitem scan reads only the two join keys
    val read = p.linesIterator.filter(_.trim.startsWith("ReadSchema:"))
      .find(_.contains("l_partkey")).get
    assert(!read.contains("l_extendedprice") && !read.contains("l_quantity"),
      s"q16 must not read fact columns it never uses: $read")
  }

  test("q11: supplier prune broadcasts; threshold is a 1-row broadcast; gate non-vacuous at BOTH shipped SFs") {
    // the per-part value frame is localCheckpointed (reused by both
    // the threshold aggregate and the filter), so the visible plan
    // starts at the checkpoint RDD: assert the threshold attaches as
    // a broadcast (1-row build side of a cross NLJ), never a
    // re-shuffle of the value frame
    val p = plan("q11_important_stock")
    assert(p.contains("BroadcastNestedLoopJoin Cross BuildRight"),
      s"threshold must attach as a 1-row broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"only the presentation sort may exchange, got $exchanges:\n$p")
    // the r13 finding: the old fixed value*1000>total cut selected 199/200
    // parts at sf0.001 and 0/2000 at sf0.01 — the count-scaled 1.3x-mean
    // cut must select a non-empty, non-trivial set at EVERY shipped SF
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val df = SparkEntry.queries("q11_important_stock")(spark, d)
      val n = df.count()
      val total = df.sparkSession.read.parquet(s"$d/lineitem.parquet")
        .select("l_partkey").distinct.count()
      assert(n > 0, s"q11 vacuous at $d")
      assert(n < total, s"q11 trivial (selects every part) at $d")
    }
  }

  test("q20: shipdate pushed down; per-part scalar joins broadcast") {
    val p = plan("q20_potential_suppliers")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate range must reach the lineitem scan")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("no query plans a cartesian product (broadcast NLJ only on ANN scans)") {
    for (name <- SparkEntry.queries.keys) {
      assert(!plan(name).contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("KN trigram scoring: model joins stay equi, no window") {
    val p = plan("text_kn_lp")
    assert(!p.contains("Window"), "kn scoring must not window")
    // exactly one nested-loop join: the broadcast of the 1-row stats
    // frame (the scalar N1+(··) attach) — the five model joins must
    // all be hash equi-joins
    val bnlj = p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin")
    assert(bnlj <= 2, s"unexpected nested-loop joins: $bnlj") // plan text repeats the node once in the detail section
  }

  test("hll registers: one counting aggregation, no window, no join") {
    val p = plan("q_hll_registers")
    assert(!p.contains("Window") && !p.contains("Join"), p.take(800))
  }

  test("validation is a single narrow projection: no shuffle before the filter") {
    val p = plan("v_customer_errors")
    assert(!p.contains("Exchange hashpartitioning"),
      "row validation must not shuffle")
  }

  test("URL normalization is scan-speed: no shuffle anywhere in the plan") {
    // normalize/host/domain are per-row regexp kernels — at 100 TB
    // this must stay a narrow projection (the final orderBy is the
    // artifact's presentation sort, range-partitioned, not a hash
    // shuffle of the pipeline itself)
    val p = plan("url_normalize")
    assert(!p.contains("Exchange hashpartitioning"),
      "url_normalize must not hash-shuffle")
  }

  test("crawl pipeline: no Window anywhere — the domain cap rides the heap") {
    // the whole point of perDomainCap is surviving a hot domain; a
    // row_number window sneaking back into the composed pipeline
    // would funnel the hottest domain through one task's sort
    val p = plan("q_crawl_pipeline")
    assert(!p.contains("Window"), s"crawl pipeline must not plan a window:\n$p")
    // stage structure bound: url-dedup agg+semi, fingerprint agg+semi,
    // cap agg (+ presentation sort) — a superlinear join explosion
    // would show up as extra exchanges
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 7, s"unexpected exchange count $exchanges:\n$p")
  }

  test("IVF cell assignment is narrow: the only exchange is the final top-k") {
    // r2 assigned cells with Window.partitionBy(unique id) — a
    // full-corpus shuffle (vectors included). The narrow argmax form
    // must leave exactly one hashpartitioning exchange in the whole
    // plan: the per-query top-k window over already-reduced
    // (query_id, neighbor_id, cosine) rows.
    val p = plan("ann_ivf_topk")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"IVF must not shuffle the corpus, got $exchanges exchanges:\n$p")
  }

  test("spatial: cell equi-join broadcasts the small side, no cartesian") {
    val p = plan("q_spatial_nearest")
    assert(p.contains("BroadcastHashJoin"), s"grid join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("attribution: one user equi-join, no corpus-wide window partition") {
    val p = plan("q_attribution")
    assert(!p.contains("CartesianProduct"))
    // both windows are keyed (user / conversion id) — a Window with an
    // empty partition spec would show 'Window [' without partitionBy
    // expressions; cheap proxy: no SinglePartition exchange feeding a
    // Window node
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"attribution must not funnel through one partition:\n$p")
  }

  test("ecod: the cell-depth lookup join is broadcast") {
    val p = plan("emb_ecod_depth")
    assert(p.contains("BroadcastHashJoin"), s"cdf join should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("join estimate: per-side sketches use TakeOrdered, not a global sort") {
    val p = plan("q_join_card_est")
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-k must be TakeOrdered:\n$p")
  }

  test("itemsets: closure prunes ride broadcast joins, basket joins stay equi") {
    val q = plan("q_freq_itemsets")
    assert(!q.contains("CartesianProduct"))
    // three downward-closure semi-prunes against the frequent-pair set
    // plus the L1 prunes — all broadcast (support-bounded sides)
    val b = q.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(b >= 3, s"closure prunes must broadcast: $b")
  }

  test("eval metrics: the ranking window sits above an aggregate, never the corpus") {
    for (name <- Seq("eval_quality_pr", "eval_quality_ks", "eval_quality_lift")) {
      val q = plan(name)
      val lines = q.linesIterator.toSeq
      val winIdx = lines.indexWhere(_.trim.matches("""\(\d+\) Window.*"""))
      assert(winIdx >= 0, s"$name should window the distinct-score frame")
      // an aggregate (the by-score reduce) must appear below the window
      // in the formatted tree; exactly one scan node (the detail
      // section repeats the node header, so count scan LOCATIONS)
      assert(lines.count(_.contains("Location: InMemoryFileIndex")) == 1,
        s"$name must reduce one scan, not re-read the corpus")
      assert(q.contains("HashAggregate"), s"$name must pre-aggregate by score")
    }
  }

  test("target encoding: category stats broadcast back, no window") {
    val q = plan("q_target_encode")
    assert(!q.contains("Window"), "LOO encoding must not window")
    assert(q.contains("BroadcastHashJoin") || q.contains("ShuffledHashJoin"),
      "stats join must be a hash join")
  }

  test("sequence mining: bounds joins are equi, no cartesian") {
    val q = plan("q_seq_patterns")
    assert(!q.contains("CartesianProduct"))
  }
}
