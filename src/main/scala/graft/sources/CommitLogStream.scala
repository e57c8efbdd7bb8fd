package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Structured-Streaming offset over a commit-log table: the set of
  * batches this stream has ACCOUNTED FOR — `read` entries were live
  * when the tip advanced past them (their rows delivered), `covered`
  * entries were already retired (their surviving rows ride their
  * rewrite). History-free by construction: a tip is derived from the
  * CURRENT log state alone, and delta planning validates rewrite
  * lineage against the start offset's own sets, so checkpoint replay
  * needs no side state. */
final case class CommitLogStreamOffset(read: Set[(String, Long)],
    covered: Set[(String, Long)]) extends Offset {
  def all: Set[(String, Long)] = read ++ covered

  /** Wire format v2 (r17): per-run RANGE compression —
    * `v2|run:lo[~hi],lo[~hi];run2:…|<covered part, same form>`.
    * The r16 format serialized every (run_id, batch_id) ever seen,
    * one entry each — O(all batches ever) bytes written twice per
    * micro-batch, unbounded on a long-lived table. Batch ids within
    * a run are assigned sequentially by every writer in this library
    * (streaming sinks count epochs 0,1,2,…; rewrite runs carry the
    * single original id), so a year of micro-batches folds to ONE
    * `run:0~524159` range per writer run: steady-state offsets are
    * O(#runs + #id-gaps), not O(#batches) — the commit-log analogue
    * of Delta's monotone (version, index) scalar, without assuming a
    * totally ordered log. Compression is EXACT (ranges expand to the
    * identical set), so delta planning, rewrite-lineage walks, and
    * replay semantics are untouched; sparse id schemes degrade to
    * one range per batch — never wrong, just uncompressed. Run ids
    * are URL-encoded (':' ';' ',' '|' '~' all escape), keeping the
    * separators unambiguous. */
  override def json(): String =
    "v2|" + CommitLogStreamOffset.encodePart(read) + "|" +
      CommitLogStreamOffset.encodePart(covered)
}

object CommitLogStreamOffset {
  /** Range-compress one batch set (the v2 wire `part`). */
  private[sources] def encodePart(s: Set[(String, Long)]): String =
    s.groupBy(_._1).toSeq.sortBy(_._1).map { case (r, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      val ranges = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      ids.foreach { b =>
        if (ranges.nonEmpty && ranges.last._2 == b - 1)
          ranges(ranges.length - 1) = (ranges.last._1, b)
        else ranges += ((b, b))
      }
      java.net.URLEncoder.encode(r, "UTF-8") + ":" +
        ranges.map { case (lo, hi) =>
          if (lo == hi) s"$lo" else s"$lo~$hi" }.mkString(",")
    }.mkString(";")

  private[sources] def decodePart(s: String): Set[(String, Long)] =
    s.split(";").iterator.filter(_.nonEmpty).flatMap { entry =>
      val i = entry.lastIndexOf(':')
      val run = java.net.URLDecoder.decode(entry.substring(0, i), "UTF-8")
      entry.substring(i + 1).split(",").iterator
        .filter(_.nonEmpty).flatMap { r =>
          val j = r.indexOf('~')
          if (j < 0) Iterator(run -> r.toLong)
          else {
            val lo = r.substring(0, j).toLong
            val hi = r.substring(j + 1).toLong
            // validate BEFORE expansion: a corrupted/adversarial
            // checkpoint line like 0~9999999999999 would otherwise
            // materialize an unbounded in-memory set. The cap is
            // far above any real table (it already means a 16M-
            // batch materialized offset) — fail loudly, not OOM.
            if (hi < lo || hi - lo >= (1L << 24)) sys.error(
              "graft_commitlog offset: corrupt v2 range " +
                s"'$r' for run '$run' (need lo <= hi and width " +
                "< 2^24) — the checkpoint offset file is damaged")
            (lo to hi).iterator.map(run -> _)
          }
        }
    }.toSet

  /** Parse either wire format: v2 range-compressed, or the r16
    * full-enumeration form — an old checkpoint keeps resolving, and
    * its next offset write comes out compressed. */
  def parse(json: String): CommitLogStreamOffset =
    if (json.startsWith("v2|")) {
      val parts = json.substring(3).split("\\|", -1)
      CommitLogStreamOffset(decodePart(parts(0)),
        decodePart(if (parts.length > 1) parts(1) else ""))
    } else {
      val read = Set.newBuilder[(String, Long)]
      val covered = Set.newBuilder[(String, Long)]
      json.split(";").iterator.filter(_.nonEmpty).foreach { part =>
        val (tagged, target) =
          if (part.startsWith("~")) (part.substring(1), covered)
          else (part, read)
        val i = tagged.lastIndexOf(',')
        target += ((java.net.URLDecoder.decode(tagged.substring(0, i), "UTF-8"),
          tagged.substring(i + 1).toLong))
      }
      CommitLogStreamOffset(read.result(), covered.result())
    }
}

/** Micro-batch streaming source over the commit-log table format —
  * `spark.readStream.format("graft_commitlog").load(path)` tails the
  * COMMITTED APPEND log with the marker set as the source of truth:
  *
  *   - a batch becomes eligible the instant its marker lands (data
  *     files that precede their marker — in-flight or torn writers —
  *     are structurally invisible, exactly as in batch reads);
  *   - copy-on-write rewrites (compactDeletes / upsert) are NOT
  *     re-delivered when their origin already streamed — the rewrite
  *     chain is walked by name and validated against the offset's own
  *     sets, so replay from a checkpoint needs no side state; a fresh
  *     stream on a compacted/upserted table delivers each chain's
  *     LIVE member (current state, no doubles);
  *   - an upsert's NEW batch streams like any append (the matched old
  *     copies are not retracted — an append stream cannot retract;
  *     consumers needing delete/update awareness read
  *     [[CommitLog.readChangeFeed]]);
  *   - delivering a batch that a LIVE tombstone already row-deletes
  *     fails loudly (the fresh-stream-after-delete case) unless
  *     `ignoreDeletes` is set or [[CommitLog.compactDeletes]] has
  *     materialized the delete — the Delta contract.
  *
  * Rows come off Spark's own vectorized parquet readers: each delta
  * plans through a [[ParquetScan]] over exactly the delta's batch
  * directories; the reader factory is built once from the stream's
  * frozen schema (later widening-only evolution reads through parquet
  * type promotion; added columns read NULL for older batches). */
final class CommitLogMicroBatchStream(table: String, schema: StructType,
    ignoreDeletes: Boolean, maxBatchesPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def spark = SparkSession.active
  private val partNames = CommitLogTable.partNames

  override def initialOffset(): Offset =
    CommitLogStreamOffset(Set.empty, Set.empty)

  override def deserializeOffset(json: String): Offset =
    CommitLogStreamOffset.parse(json)

  /** The current full tip plus each live batch's commit ts (the
    * admission-control ordering — backlog drains oldest-first). */
  private def fullTip(): (CommitLogStreamOffset, Map[(String, Long), Long]) = {
    val st = CommitLog.logState(spark, table)
    val live = st.committed.toSet
    (CommitLogStreamOffset(live, st.entries.toSet -- live),
      st.meta.collect { case (k, m) if m.ts.nonEmpty => k -> m.ts.get })
  }

  override def latestOffset(): Offset = fullTip()._1

  // ---- admission control (r17): maxBatchesPerTrigger ---- //
  // Without a limit, a stream starting on (or catching up to) a
  // long-lived table plans its ENTIRE backlog as one micro-batch —
  // the planning is fine (explicit dirs), but checkpoint granularity
  // and per-batch memory are not. ReadMaxFiles caps the number of
  // COMMITTED BATCHES per trigger (a batch is the format's file-ish
  // admission unit), draining oldest-commit-ts-first;
  // SupportsTriggerAvailableNow pins the cap's target so AvailableNow
  // terminates at the snapshot it started with.

  private var availableNowCap: Option[CommitLogStreamOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(fullTip()._1)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxBatchesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val (full, ts) = fullTip()
    val tip = availableNowCap.getOrElse(full)
    val s = start.asInstanceOf[CommitLogStreamOffset]
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        val pending = tip.read -- s.all
        // rewrite-lineage-covered batches deliver nothing — admit them
        // for free rather than burn limit slots on empty work
        val (skips, fresh) = pending.partition(chainSeen(_, s.all))
        if (fresh.size <= mf.maxFiles) tip
        else {
          val chosen = fresh.toSeq
            .sortBy(k => (ts.getOrElse(k, 0L), k._1, k._2))
            .take(mf.maxFiles)
          val reads = s.read ++ skips ++ chosen
          // INVARIANT: a retired original enters the offset no earlier
          // than its live descendant. Folding ALL of tip.covered here
          // would plant retired ancestors of NOT-yet-admitted rewrites
          // into start.all, making the next trigger's chainSeen classify
          // the still-undelivered rewrite as already-seen — silent data
          // loss. Only ancestors of batches admitted (or skipped) THIS
          // trigger join now; the rest ride the final full-tip return.
          val admittedAnc = (skips ++ chosen).flatMap(ancestorsOf)
          CommitLogStreamOffset(reads,
            (s.covered ++ (tip.covered & admittedAnc)) -- reads)
        }
      case _ => tip
    }
  }

  /** Every rewrite-lineage ancestor of `e` by run-id shape (the chain
    * [[chainSeen]] walks), nearest first — the retired originals that
    * may enter an offset once `e` itself is admitted. */
  private def ancestorsOf(e: (String, Long)): Set[(String, Long)] = {
    val m = """^(.*)(?:rw|up)([0-9a-f]{8})$""".r
    val out = Set.newBuilder[(String, Long)]
    var cur = e
    var guard = 0
    var more = true
    while (more && guard < 64) {
      cur._1 match {
        case m(orig, _) => cur = (orig, cur._2); out += cur
        case _ => more = false
      }
      guard += 1
    }
    out.result()
  }

  /** Walk e's rewrite lineage by run-id shape; an ancestor present in
    * `prior` means this chain's rows were already accounted for. The
    * membership check IS the validation that the name pattern denotes
    * a real rewrite (a user run merely ending in the pattern has no
    * ancestor in any offset). */
  private def chainSeen(e: (String, Long), prior: Set[(String, Long)]): Boolean = {
    val m = """^(.*)(?:rw|up)([0-9a-f]{8})$""".r
    var cur = e
    var guard = 0
    while (guard < 64) {
      if (prior(cur)) return true
      cur._1 match {
        case m(orig, _) => cur = (orig, cur._2)
        case _ => return false
      }
      guard += 1
    }
    false
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CommitLogStreamOffset]
    val e = end.asInstanceOf[CommitLogStreamOffset]
    val delta = (e.read -- s.all).filterNot(chainSeen(_, s.all)).toSeq.sorted
    if (delta.isEmpty) return Array.empty
    if (!ignoreDeletes) {
      // fresh-stream-after-delete guard: rows about to be delivered
      // that a live tombstone already deletes would hand the consumer
      // state the batch readers no longer see. EXEMPT batches whose
      // rewrite is already live (compactDeletes/upsert materialized
      // the delete): the only way such a batch is still in this delta
      // is checkpoint REPLAY of a micro-batch planned before the
      // tombstone landed — replay re-delivers exactly what was
      // planned (the pre-delete rows, correct exactly-once replay
      // semantics), and erroring here would wedge the stream forever
      // (the tombstone keeps naming the retired original, so no
      // amount of compaction could ever clear the old error).
      val st = CommitLog.logState(spark, table)
      val live = st.committed.toSet
      def materialized(k: (String, Long)): Boolean =
        live.exists(e => e._2 == k._2 && e != k && chainSeen(e, Set(k)))
      val deltaSet = delta.toSet
      st.tombstones.filterNot(_.cancelled).find(t => t.applies.exists(k =>
        deltaSet(k) && CommitLog.tombstoneMayHit(st, t, k) &&
          !materialized(k))).foreach { t =>
        sys.error("graft_commitlog stream: a live row-delete (tombstone " +
          s"on '${t.col}') applies to batches this stream is about to " +
          "deliver — run CommitLog.compactDeletes(...) first, or set " +
          "option(\"ignoreDeletes\", \"true\") to stream the pre-delete rows")
      }
    }
    deltaScan(delta).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    deltaScan(Seq.empty).toBatch.createReaderFactory()

  /** A [[ParquetScan]] over exactly `batches`' directories with the
    * stream's frozen schema (empty = the factory template: the reader
    * factory depends only on schemas and conf, never the index). */
  private def deltaScan(batches: Seq[(String, Long)]): ParquetScan = {
    val sp = spark
    val index = CommitLogTable.index(sp, table, batches, schema)
    val dataSchema =
      StructType(schema.fields.filterNot(f => partNames.contains(f.name)))
    val partSchema =
      StructType(schema.fields.filter(f => partNames.contains(f.name)))
    ParquetScan(sp, sp.sessionState.newHadoopConfWithOptions(Map.empty),
      index, dataSchema, dataSchema, partSchema, Array.empty,
      CaseInsensitiveStringMap.empty())
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"CommitLogMicroBatchStream($table)"
}

/** Offset of the STREAMING change feed: everything the stream has
  * turned into change events so far — the log entries seen (inserts /
  * upsert-delete pre-images), the retire marks seen (full-batch
  * deletes), and a count into the log's deterministic tombstone order
  * (row deletes). All three are derived from the CURRENT log state at
  * planning time and immutable once recorded, so checkpoint replay
  * recomputes the identical events with no side state. */
final case class CommitLogChangesOffset(entries: Set[(String, Long)],
    retired: Set[(String, Long)], tombs: Int, restores: Int = 0)
    extends Offset {
  // `restores` counts RESTORE markers seen — the stream cannot express
  // a rollback as append-only increments, so crossing one fails loudly
  // at planning (field absent on pre-r20 checkpoints → 0)
  override def json(): String =
    "cdc1|" + CommitLogStreamOffset.encodePart(entries) + "|" +
      CommitLogStreamOffset.encodePart(retired) + "|" + tombs +
      "|" + restores
}

object CommitLogChangesOffset {
  def parse(json: String): CommitLogChangesOffset = {
    require(json.startsWith("cdc1|"),
      s"graft_commitlog change-feed offset: unknown wire format '$json'")
    val parts = json.substring(5).split("\\|", -1)
    CommitLogChangesOffset(
      CommitLogStreamOffset.decodePart(parts(0)),
      CommitLogStreamOffset.decodePart(if (parts.length > 1) parts(1) else ""),
      if (parts.length > 2 && parts(2).nonEmpty) parts(2).toInt else 0,
      if (parts.length > 3 && parts(3).nonEmpty) parts(3).toInt else 0)
  }
}

/** The change feed as a STREAMING source (the Delta CDF-as-stream
  * rung): `spark.readStream.format("graft_commitlog")
  * .option("readChangeFeed", "true").load(path)` delivers
  * [[CommitLog.readChangeFeed]]'s (data…, change_type, change_ts)
  * rows INCREMENTALLY — inserts as batches commit, row deletes as
  * tombstones land, an upsert as its delete pre-image plus the new
  * batch's inserts, exactly once across restarts; compaction rewrites
  * (carried copies) emit nothing. A fresh stream replays the table's
  * whole recorded history first (Delta's startingVersion=0 shape);
  * vacuumed pre-images fail loudly exactly like the batch feed.
  *
  * Each micro-batch's events are computed with the batch feed's own
  * set algebra over the OFFSET DELTA (new entries / new retires / new
  * tombstones — all immutable facts), materialized once as parquet
  * under the stream's checkpoint (`<ckpt>/graft-cdc-stage/<hash>`),
  * and served through Spark's vectorized [[ParquetScan]]; a replayed
  * micro-batch reuses its staged bytes (or deterministically
  * recomputes them after cleanup). Committed batches' stages are
  * deleted on [[commit]]. `maxBatchesPerTrigger` admission-controls
  * the backlog in EVENT units — an upsert rewrite admits together
  * with its original's retire mark so a partial offset can never
  * misread a paired retire as a full-batch delete. */
final class CommitLogChangesMicroBatchStream(table: String,
    dataSchema: StructType, checkpointLocation: String,
    maxBatchesPerTrigger: Option[Int] = None,
    startingTs: Option[Long] = None,
    startingSeq: Option[Long] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  private def spark = SparkSession.active
  private[sources] val feedSchema: StructType = StructType(
    dataSchema.fields :+ StructField("change_type", StringType) :+
      StructField("change_ts", LongType) :+
      StructField("_change_seq", LongType))

  /** Empty (replay ALL recorded history — the startingVersion=0
    * shape), or, with `startingTimestamp`, the log state as of that
    * wall time: changes recorded AFTER it deliver, nothing before —
    * the Delta CDF startingTimestamp rung. All three components are
    * ts-prefixes of immutable facts (the tombstone order leads with
    * ts), so the skipped history is exactly the batch feed's
    * (-inf, T] window. */
  override def initialOffset(): Offset = (startingTs, startingSeq) match {
    case (None, None) => CommitLogChangesOffset(Set.empty, Set.empty, 0)
    case (Some(t), _) =>
      val st = CommitLog.logState(spark, table)
      CommitLogChangesOffset(
        st.entries.filter(k =>
          st.meta.get(k).flatMap(_.ts).forall(_ <= t)).toSet,
        st.retired.filter(_._2 <= t).keySet,
        // the offset is a COUNT into the seq-led order (r19), so only
        // a PREFIX may be skipped: takeWhile, not count — a tombstone
        // with a pinned pre-T ts but a post-T recording position stays
        // deliverable (erring toward delivery, never a silent skip)
        st.tombstones.takeWhile(_.ts <= t).size,
        st.restores.count(_.ts <= t))
    case (None, Some(v)) =>
      // startingVersion (r20): resume PAST an exact change sequence —
      // what a consumer actually persists (`_change_seq`). Facts with
      // effective seq ≤ v are already applied; everything later
      // delivers, with no wall-clock ambiguity.
      val st = CommitLog.logState(spark, table)
      CommitLogChangesOffset(
        st.entries.filter(k => st.entrySeq(k) <= v).toSet,
        st.retired.keySet.filter(k => st.retireSeqOf(k) <= v),
        st.tombstones.takeWhile(t => st.tombSeq(t) <= v).size,
        st.restores.count(_.seq <= v))
  }
  override def deserializeOffset(json: String): Offset =
    CommitLogChangesOffset.parse(json)

  private def tipOf(st: CommitLog.LogState): CommitLogChangesOffset =
    CommitLogChangesOffset(st.entries.toSet, st.retired.keySet,
      st.tombstones.size, st.restores.size)

  /** A RESTORE inside the stream's pending range cannot be expressed
    * as append-only change increments (re-adds do not change the
    * entry SET the offset tracks, and a rollback is not an append) —
    * fail loudly with the remedy rather than silently skip it. */
  private def requireNoRestore(s: CommitLogChangesOffset,
      tip: CommitLogChangesOffset): Unit =
    if (tip.restores > s.restores) sys.error(
      "graft_commitlog change-feed stream: a RESTORE was performed on " +
        "this table past the stream's checkpoint — a rollback cannot " +
        "be delivered as append-only increments; restart the CDC " +
        "consumer from a fresh checkpoint (full replay, or " +
        "startingTimestamp after the restore), or rebuild the replica " +
        "from CommitLog.readChangeFeed, which replays restores exactly")

  override def latestOffset(): Offset =
    tipOf(CommitLog.logState(spark, table))

  private var availableNowCap: Option[CommitLogChangesOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(tipOf(CommitLog.logState(spark, table)))

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxBatchesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val st = CommitLog.logState(spark, table)
    val tip = availableNowCap.getOrElse(tipOf(st))
    val s = start.asInstanceOf[CommitLogChangesOffset]
    requireNoRestore(s, tip)
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        // admission UNITS keep paired facts together: a rewrite entry
        // carries its original's retire mark (else the next trigger
        // would see a new retire with no rewrite and emit a spurious
        // full-batch delete); an unpaired retire is its own unit;
        // tombstones are their own units, admitted oldest-first with
        // everything else by effective SEQ (r19 — the recording order;
        // legacy facts fall back to their ts, the pre-seq behavior)
        val newEntries = (tip.entries -- s.entries).toSeq.sorted
        val newRetired = (tip.retired -- s.retired).toSet
        final case class Unit0(seq: Long, entries: Set[(String, Long)],
          retires: Set[(String, Long)], tombs: Int)
        val entryUnits = newEntries.map { case (r, b) =>
          CommitLog.rewriteOf(st, r, b) match {
            case Some((orig, _)) if newRetired((orig, b)) =>
              Unit0(st.entrySeq((r, b)), Set((r, b)), Set((orig, b)), 0)
            case _ => Unit0(st.entrySeq((r, b)), Set((r, b)), Set.empty, 0)
          }
        }
        val pairedRetires = entryUnits.flatMap(_.retires).toSet
        val retireUnits = (newRetired -- pairedRetires).toSeq.sorted.map(k =>
          Unit0(st.retireSeqOf(k), Set.empty, Set(k), 0))
        val tombUnits = st.tombstones.slice(s.tombs, tip.tombs)
          .map(t => Unit0(st.tombSeq(t), Set.empty, Set.empty, 1))
        val units = (entryUnits ++ retireUnits ++ tombUnits).sortBy(_.seq)
        if (units.size <= mf.maxFiles) tip
        else {
          val chosen = units.take(mf.maxFiles)
          // tombstone admission is a COUNT into the deterministic
          // order — only a ts-PREFIX of the pending tombstones can be
          // admitted, so admit min(chosen tomb units, prefix length)
          val tombsAdmitted = chosen.map(_.tombs).sum
          CommitLogChangesOffset(
            s.entries ++ chosen.flatMap(_.entries),
            s.retired ++ chosen.flatMap(_.retires),
            s.tombs + tombsAdmitted,
            s.restores) // == tip.restores (requireNoRestore passed)
        }
      case _ => tip
    }
  }

  /** The delta's change events as one frame in [[feedSchema]], or None
    * when the delta is empty. Every input is an immutable recorded
    * fact, so replay recomputes identical rows. */
  private def eventsFrame(st: CommitLog.LogState, s: CommitLogChangesOffset,
      e: CommitLogChangesOffset): Option[DataFrame] = {
    val sp = spark
    val (hfs, _) = {
      val p = new org.apache.hadoop.fs.Path(table)
      (p.getFileSystem(sp.sparkContext.hadoopConfiguration), p)
    }
    def requireDir(r: String, b: Long, why: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$table/run_id=$r/batch_id=$b")
      if (!hfs.exists(p)) sys.error(
        s"graft_commitlog change-feed stream needs ($r, $b) for $why, " +
          "but its directory was vacuumed — history before the vacuum " +
          "grace window is gone")
    }
    val parts = Seq.newBuilder[DataFrame]
    val newEntries = (e.entries -- s.entries).toSeq.sorted
    // plain inserts read as ONE multi-dir frame (rawBatchSet already
    // reconciles schema lineages) with per-batch commit ts/seq attached
    // by a broadcast mapping — a fresh stream bootstrapping a year-old
    // table must not build a union plan with one scan node per batch
    val inserts = newEntries.filter { case (r, b) =>
      CommitLog.rewriteOf(st, r, b).isEmpty }
    if (inserts.nonEmpty) {
      inserts.foreach { case (r, b) => requireDir(r, b, "an insert") }
      parts += CommitLog.insertEventsFrame(sp, table,
        inserts.map(k => (k, st.meta.get(k).flatMap(_.ts).getOrElse(0L),
          st.entrySeq(k))), st)
    }
    // delete events — full-batch deletes for this delta's unpaired
    // retires, upsert deletes for its rewrites: write-time change
    // partitions assemble as ONE scan per schema lineage (r20, shared
    // with the batch feed; filtered to THIS delta's originals —
    // admission control may split a transaction across micro-batches),
    // per-original exceptAll reconstruction for legacy rewrites
    // rewrite-of relation inverted ONCE over the end offset's entries
    // (the per-retire scan was O(history²) on a bootstrap delta)
    val rewrittenOrigs = e.entries.iterator.flatMap { case (r2, b2) =>
      CommitLog.rewriteOf(st, r2, b2).map { case (orig, _) => (orig, b2) }
    }.toSet
    parts ++= CommitLog.deleteEventFrames(sp, table, st,
      (e.retired -- s.retired).toSeq.filterNot(rewrittenOrigs)
        .map(k => (k, st.retired.getOrElse(k, 0L), st.retireSeqOf(k))),
      newEntries.flatMap { k =>
        CommitLog.rewriteOf(st, k._1, k._2) match {
          case Some((orig, "up")) =>
            val ok = (orig, k._2)
            Some((k, ok, st.retired.getOrElse(ok, 0L), st.retireSeqOf(ok)))
          case _ => None
        }
      },
      (r, b, why) => requireDir(r, b, why))
    // row deletes: this delta's tombstone slice as ONE frame
    CommitLog.tombstoneDeleteFrame(sp, table, st,
      i => i >= s.tombs && i < e.tombs,
      (r, b, why) => requireDir(r, b, why)).foreach(parts += _)
    val all = parts.result()
    if (all.isEmpty) None
    else {
      val union = all.reduce(_.unionByName(_, allowMissingColumns = true))
      Some(union.select(feedSchema.fields.toSeq.map { f =>
        if (union.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*))
    }
  }

  private def stageDir(s: CommitLogChangesOffset,
      e: CommitLogChangesOffset): String = {
    // 62 bits across two seeds: a stage-key collision between two
    // different offset ranges would silently serve the WRONG staged
    // rows, so one 31-bit hash is not enough headroom. The name leads
    // with a MONOTONIC watermark (entries + retires + tombstones seen
    // — each nondecreasing, and every non-empty micro-batch advances
    // the sum) so commit-time cleanup can also sweep ORPHANS from
    // prior runs (stages whose batch committed before a crash lost
    // the in-memory tracking map) by prefix comparison alone.
    val key = s.json() + "->" + e.json()
    val h1 = scala.util.hashing.MurmurHash3.stringHash(key, 0x5ca1e) & 0x7fffffff
    val h2 = scala.util.hashing.MurmurHash3.stringHash(key, 0x9e3779) & 0x7fffffff
    f"$checkpointLocation/graft-cdc-stage/${watermark(e)}%020d-$h1%08x$h2%08x"
  }

  private def watermark(o: CommitLogChangesOffset): Long =
    o.entries.size.toLong + o.retired.size + o.tombs

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CommitLogChangesOffset]
    val e = end.asInstanceOf[CommitLogChangesOffset]
    requireNoRestore(s, e)
    val sp = spark
    val dir = stageDir(s, e)
    val success = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val hfs = success.getFileSystem(sp.sparkContext.hadoopConfiguration)
    if (!hfs.exists(success)) {
      val st = CommitLog.logState(sp, table)
      eventsFrame(st, s, e) match {
        case None => return Array.empty
        case Some(df) => df.write.mode("overwrite").parquet(dir)
      }
    }
    // a staged-but-empty frame (all events filtered) still has _SUCCESS
    val files = hfs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return Array.empty
    stageScan(Seq(dir)).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    stageScan(Seq.empty).toBatch.createReaderFactory()

  private def stageScan(dirs: Seq[String]): ParquetScan = {
    val sp = spark
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      sp, dirs.map(new org.apache.hadoop.fs.Path(_)), Map.empty,
      Some(feedSchema),
      org.apache.spark.sql.execution.datasources.FileStatusCache.getOrCreate(sp),
      None, None)
    ParquetScan(sp, sp.sessionState.newHadoopConfWithOptions(Map.empty),
      index, feedSchema, feedSchema, StructType(Seq.empty), Array.empty,
      CaseInsensitiveStringMap.empty())
  }

  /** Spark committed every batch up to `end`: their staged parquet is
    * consumed and deletable (a later replay would start after `end`).
    * The stage for `end` itself stays until a LATER commit passes it —
    * conservative, bounded by one stage dir per in-flight batch. The
    * sweep is by the dirs' monotonic watermark prefix alone (no
    * in-memory tracking to lose), so it also reclaims ORPHANS a
    * crashed prior run left behind — their watermarks sit strictly
    * below the committed end's. */
  override def commit(end: Offset): Unit = {
    val endMark = watermark(end.asInstanceOf[CommitLogChangesOffset])
    val sp = spark
    val root = new org.apache.hadoop.fs.Path(
      s"$checkpointLocation/graft-cdc-stage")
    try {
      val hfs = root.getFileSystem(sp.sparkContext.hadoopConfiguration)
      if (hfs.exists(root)) {
        hfs.listStatus(root).foreach { st =>
          val name = st.getPath.getName
          val mark = name.takeWhile(_ != '-').toLongOption
          if (mark.exists(_ < endMark)) hfs.delete(st.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
  override def stop(): Unit = ()
  override def toString: String = s"CommitLogChangesMicroBatchStream($table)"
}
