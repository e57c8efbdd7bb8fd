package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive
  * closure pass a dedup pipeline needs when near-duplicate PAIRS must
  * become near-duplicate CLUSTERS (A~B, B~C ⇒ {A,B,C} even though A and
  * C never matched directly; [[Similarity.dropNearDuplicates]] links
  * one hop, this closes arbitrary chains).
  *
  * Algorithm: iterative minimum-label propagation — every node starts
  * labeled with its own id; each round every node adopts the minimum
  * label in its closed neighborhood; stop when no label changes. State
  * is only (node, label) pairs; each round is ONE equi-join of the
  * (static, pre-shuffled-by-key) edge list with the current labels
  * plus a min-aggregate, then a pointer-jumping self-join (component →
  * component-of-component) that doubles effective propagation distance
  * — no driver-side graph, no quadratic blowup, O(log diameter) rounds
  * (dedup graphs: 2-4; a 10^6-hop pathological chain: ~20).
  *
  * Each round checkpoints to cut the exponentially growing iterative
  * lineage (the classic iterative-DataFrame hazard): `localCheckpoint`
  * by default (fast, executor-resident blocks), or reliable
  * `checkpoint()` with `reliable = true` for executor-loss-safe
  * production runs.
  */
object ConnectedComponents {

  /** Auto-mode threshold: above this many (directed) input edges the
    * r7 10 M-edge smoke measured reliable checkpointing both FASTER
    * (126 vs 162 s — HDFS-path writes beat block-store churn once the
    * label frame is tens of MB per round) and flatter (round max/min
    * 1.62 vs 4.57), so big graphs default to it when a checkpoint dir
    * is available. */
  val AutoReliableEdges = 2000000L

  /** Auto mode folds the closure on the DRIVER (union-find over the
    * already-materialized edge list) when the edge count is at or
    * below this. Rationale: each distributed pointer-jumping round
    * costs several scheduler round trips and shuffles — pure fixed
    * overhead when the whole graph fits in a bounded driver structure
    * (the same bounded-collect budget as IVF centroids or BPE pair
    * stats: ≤ threshold × 16 bytes in a primitive-keyed map). Above
    * the threshold — the 100 TB shape, where a blocked near-dup pair
    * graph is billions of edges — the log-round distributed closure
    * runs unchanged. An EXPLICIT `reliable` choice always takes the
    * distributed path: asking for a checkpoint mode is asking for the
    * distributed machinery. */
  // 2M (was 500k, r20): the r20 profile measured the distributed
  // closure on a 1.05M-edge core-core graph (dbscan) at ~10 s of round
  // fixed cost where the driver fold streams it in ~1 s; 2M edges is
  // ≤ ~64 MB in the primitive-keyed map — two orders of magnitude
  // under the driver heap, same answer by construction (min-id
  // union-find).
  val DriverFoldEdges = 2000000L

  /** Resolve the checkpoint mode for an iterative operator: an
    * explicit choice wins; otherwise reliable iff a checkpoint dir is
    * set AND `materialized` (a frame whose plan root is the LogicalRDD
    * of an already-executed checkpoint) holds at least `threshold`
    * rows. The row count reads the persisted RDD directly — a job, but
    * not a SQL action, so per-round one-SQL-action pins are unaffected. */
  private[graft] def resolveReliable(materialized: DataFrame,
      explicit: Option[Boolean],
      threshold: Long = AutoReliableEdges): Boolean =
    explicit.getOrElse {
      materialized.sparkSession.sparkContext.getCheckpointDir.isDefined && {
        val n = materialized.queryExecution.logical match {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.count()
          case _ => 0L
        }
        n >= threshold
      }
    }

  /** Returns (id, component) for every node appearing in `edges`, with
    * component = min reachable node id. `edges` needs two long-castable
    * columns `src`, `dst`; self-loops are fine (isolated nodes can be
    * passed as self-loops).
    *
    * `reliable = Some(true)` swaps per-round `localCheckpoint` (fast,
    * but blocks live on executors — an executor loss mid-computation
    * kills the job) for reliable `checkpoint()` to the SparkContext's
    * checkpoint dir — the mode a 1000-executor production run wants.
    * Caller must have set `spark.sparkContext.setCheckpointDir`.
    *
    * The default `None` decides automatically: reliable when a
    * checkpoint dir is set AND the materialized edge count is at least
    * [[AutoReliableEdges]] (above that size reliable is also the
    * faster mode — measured, see threshold doc); the local fast path
    * otherwise. */
  def components(edges: DataFrame, maxRounds: Int = 20,
                 reliable: Option[Boolean] = None,
                 driverFoldEdges: Long = DriverFoldEdges): DataFrame =
    componentsInstrumented(edges, maxRounds, reliable,
      driverFoldEdges = driverFoldEdges)._1

  /** [[components]] plus (rounds taken, per-round wall seconds) — the
    * scale-smoke evidence that rounds ≈ log₂(longest chain) and that
    * per-round time stays flat (checkpointing truncates the iterative
    * lineage; without it each round would replan and re-execute every
    * earlier round's DAG). `autoReliableEdges` overrides the
    * [[AutoReliableEdges]] decision threshold (tests pin the switch
    * with a tiny graph). */
  def componentsInstrumented(edges: DataFrame, maxRounds: Int = 20,
                 reliable: Option[Boolean] = None,
                 autoReliableEdges: Long = AutoReliableEdges,
                 driverFoldEdges: Long = DriverFoldEdges): (DataFrame, Int, Seq[Double]) = {
    var useReliable = reliable.getOrElse(false)
    def ckpt(df: DataFrame): DataFrame =
      if (useReliable) df.checkpoint() else df.localCheckpoint()
    // lazy variant: marks the plan's RDD for checkpointing but defers
    // materialization to the FIRST action over it — so the per-round
    // convergence count below is the job that also persists + truncates
    // the round (one job per round, not checkpoint-then-isEmpty two)
    def ckptLazy(df: DataFrame): DataFrame =
      if (useReliable) df.checkpoint(eager = false) else df.localCheckpoint(eager = false)

    // release exactly the blocks a checkpointed frame persisted: the
    // checkpoint APIs return a Dataset whose logical plan is the
    // LogicalRDD wrapping the persisted RDD, so unpersisting THAT rdd
    // frees precisely this computation's blocks — no session-global
    // persistent-RDD-id diffing, which would race with (and could
    // fatally unpersist) concurrent jobs' localCheckpoints on the same
    // SparkSession. A reliable checkpoint's rdd is not block-persisted;
    // unpersist is a no-op there.
    def release(df: DataFrame): Unit = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
    // materialize the edge list FIRST: `und` is referenced by both the
    // symmetric-closure job and the initial-labels job below — without
    // this checkpoint the caller's whole upstream pipeline (e.g. an
    // n-gram Jaccard pair join) executes once per reference, since
    // exchange reuse never spans separate actions
    val und = ckpt(edges.select(col("src").cast("long"), col("dst").cast("long")))
    // auto-mode small-graph fold: the materialized edge count is now
    // exact; at or below the threshold the closure runs as a driver
    // union-find streamed over the persisted partitions (never holding
    // the full edge list, only the ≤ 2·threshold-entry primitive map)
    // — identical min-id components, zero distributed rounds. An
    // explicit `reliable` choice opts into the distributed machinery.
    if (reliable.isEmpty && driverFoldEdges > 0) {
      val nEdges = und.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.count()
        case _ => Long.MaxValue
      }
      if (nEdges <= driverFoldEdges) {
        // union-find, min-id representative: union hangs the larger
        // root under the smaller, so every tree root is its
        // component's minimum — order-independent, deterministic
        val parent = new scala.collection.mutable.LongMap[Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        val it = und.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          if (!row.isNullAt(0) && !row.isNullAt(1)) {
            val s = row.getLong(0); val d = row.getLong(1)
            if (!parent.contains(s)) parent(s) = s
            if (!parent.contains(d)) parent(d) = d
            val (rs, rd) = (find(s), find(d))
            if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
          }
        }
        release(und)
        val spark = edges.sparkSession
        import spark.implicits._
        val out = parent.keys.toArray
        val labels = spark.createDataset(
          out.toIndexedSeq.map(n => (n, find(n)))).toDF("id", "component")
        return (labels, 0, Seq.empty)
      }
    }
    // auto mode: the edge frame is now materialized (locally — the
    // decision predates the mode), so its exact size decides the mode
    // for every downstream cut
    useReliable = resolveReliable(und, reliable, autoReliableEdges)
    // symmetric closure, checkpointed (not just cached): a cache keeps
    // the upstream logical plan — e.g. a whole near-dup pair pipeline —
    // and every round's join re-runs the optimizer over that subtree;
    // checkpointing truncates it so each round plans against a flat
    // in-memory relation
    val sym = ckpt(und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .select(col("src").as("e_id"), col("dst").as("e_nbr")))

    val labels0 = ckpt(und.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct().select(col("id"), col("id").as("component")))
    var labels: DataFrame = labels0
    // the checkpointed frame holding the CURRENT round's label state
    var roundCkpt: DataFrame = labels0
    // `und` fed only the symmetric closure and the initial labels,
    // both now materialized — release its full-edge-copy blocks
    release(und)

    var round = 0
    var converged = false
    val roundSecs = Seq.newBuilder[Double]
    while (!converged && round < maxRounds) {
      val roundT0 = System.nanoTime()
      // neighbor labels flow along edges; merging with the node's own
      // label via a left join (not union+groupBy) keeps the previous
      // label on the row, so convergence is readable off the
      // checkpointed result without the extra per-round labels-join
      // the r2 form paid (~2× the round cost at 20 rounds)
      val nbrMin = sym.join(labels, sym("e_nbr") === labels("id"))
        .groupBy(col("e_id").as("id")).agg(min("component").as("nbr_comp"))
      val merged = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old_comp"),
          least(col("component"), coalesce(col("nbr_comp"), col("component"))).as("component"))
      // pointer jumping: follow component → component-of(component),
      // doubling effective propagation distance per round (a 2^r-hop
      // path resolves in ~r rounds instead of its diameter)
      val ptrs = merged.select(col("id").as("p_id"), col("component").as("p_comp"))
      val next = ckptLazy(merged.join(ptrs, merged("component") === ptrs("p_id"), "left")
        .select(col("id"), col("old_comp"),
          least(col("component"), coalesce(col("p_comp"), col("component"))).as("component")))
      // a label only ever decreases → changed ⇔ any strict decrease.
      // This count is the round's ONLY driver action: computing it
      // forces the lazily-marked checkpoint above (RDD.doCheckpoint
      // runs over the action's whole ancestor DAG), so materialization
      // and convergence detection share one job instead of two.
      converged = next.where(col("component") < col("old_comp")).count() == 0L
      labels = next.select("id", "component")
      // the new round is materialized — free the PREVIOUS round's
      // localCheckpoint blocks. Without this, every round's full label
      // frame stays pinned in the block store; at 10 M nodes the
      // accumulated rounds overflowed executor storage and the
      // eviction/GC thrash showed up as 20-80x per-round spikes in the
      // r7 scale smoke (910 s vs 162 s with per-round release).
      release(roundCkpt)
      roundCkpt = next
      round += 1
      roundSecs += (System.nanoTime() - roundT0) / 1e9
    }
    // the result depends only on the final round's truncated state —
    // the doubled edge list (the largest persisted object) can go
    release(sym)
    // silent non-convergence would hand back labels that LOOK like
    // components but still straddle cluster boundaries — fail instead
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents: not converged after $maxRounds rounds — " +
        "raise maxRounds (rounds needed ≈ log2 of the longest chain)")
    (labels, round, roundSecs.result())
  }

  /** Free the block-store copy backing a frame returned by
    * [[components]] in localCheckpoint mode (no-op for reliable mode).
    * The final round's label frame stays pinned on the executors until
    * released — callers running several closures in one JVM (scale
    * smokes, repeated dedup passes) otherwise stack dead label frames
    * in storage. Call AFTER consuming the result: the frame cannot be
    * recomputed once its blocks are gone. */
  def releaseResult(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
    }
}
