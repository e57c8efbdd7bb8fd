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
  override def json(): String = {
    def enc(s: (String, Long), tag: String) =
      tag + java.net.URLEncoder.encode(s._1, "UTF-8") + "," + s._2
    (read.toSeq.sorted.map(enc(_, "")) ++
      covered.toSeq.sorted.map(enc(_, "~"))).mkString(";")
  }
}

object CommitLogStreamOffset {
  def parse(json: String): CommitLogStreamOffset = {
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
    ignoreDeletes: Boolean) extends MicroBatchStream {

  private def spark = SparkSession.active
  private val partNames = CommitLogTable.partNames

  override def initialOffset(): Offset =
    CommitLogStreamOffset(Set.empty, Set.empty)

  override def deserializeOffset(json: String): Offset =
    CommitLogStreamOffset.parse(json)

  override def latestOffset(): Offset = {
    val st = CommitLog.logState(spark, table)
    val live = st.committed.toSet
    CommitLogStreamOffset(live, st.entries.toSet -- live)
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
      // state the batch readers no longer see
      val st = CommitLog.logState(spark, table)
      val deltaSet = delta.toSet
      st.tombstones.find(t => t.applies.exists(k =>
        deltaSet(k) && CommitLog.tombstoneMayHit(st, t, k))).foreach { t =>
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
