package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based randomized check of the table format: a seeded random
  * sequence of the format's operations runs against BOTH the real
  * commit log and a trivial in-memory reference model, and after
  * every step the committed read (library AND DSv2 door), plus a
  * sampled time-travel read, must equal the model exactly. The
  * point-specs pin each operation's contract; this spec pins their
  * COMPOSITION — the states a real table actually passes through
  * (append → delete → merge → compactDeletes → optimize → compactLog
  * interleaved), where a protocol bug would hide.
  *
  * Maintenance ops (compactDeletes / compactFiles / compactLog) are
  * model NO-OPS by contract: whenever one runs, the visible rows must
  * not move at all. */
class CommitLogModelSpec extends SparkSpec {
  import spark.implicits._

  private type Row2 = (Long, String)

  private def readRows(table: String): Set[(Row2, Int)] = count(
    CommitLog.readCommitted(spark, table)
      .map(_.select("id", "v").as[Row2].collect().toSeq)
      .getOrElse(Seq.empty))
  private def readDsv2(table: String): Set[(Row2, Int)] = count(
    spark.read.format("graft_commitlog").load(table)
      .select("id", "v").as[Row2].collect().toSeq)
  private def readAsOf(table: String, ts: Long): Set[(Row2, Int)] = count(
    CommitLog.readCommittedAsOfTimestamp(spark, table, ts)
      .map(_.select("id", "v").as[Row2].collect().toSeq)
      .getOrElse(Seq.empty))
  // multiset compare: appends may land duplicate rows on purpose
  private def count(rows: Seq[Row2]): Set[(Row2, Int)] =
    rows.groupBy(identity).view.mapValues(_.size).toSet

  test("random operation sequences match the reference model at every step") {
    for (seed <- Seq(7L, 23L, 101L)) {
      val rnd = new scala.util.Random(seed)
      val table =
        java.nio.file.Files.createTempDirectory(s"graft-model$seed").toString + "/t"
      var model = Vector.empty[Row2] // the reference: a bag of rows
      val history = scala.collection.mutable.ArrayBuffer.empty[(Long, Vector[Row2])]
      var ts = 1000L
      var batch = 0L

      def rows(n: Int, tag: String): Seq[Row2] =
        (0 until n).map(_ => (rnd.nextInt(40).toLong, s"$tag${rnd.nextInt(1000)}"))

      for (step <- 1 to 14) {
        ts += 1000
        rnd.nextInt(6) match {
          case 0 | 1 => // append (possibly duplicate ids — appends are a bag)
            val rs = rows(1 + rnd.nextInt(8), s"s$step-")
            batch += 1
            CommitLog.writeBatchWithStats(rs.toDF("id", "v"), table,
              "r", batch, Seq("id"), ts = ts)
            model = model ++ rs
          case 2 => // row-level delete: in-set or range
            if (model.nonEmpty) {
              if (rnd.nextBoolean()) {
                val vals = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(40).toLong).distinct
                CommitLog.deleteWhere(spark, table, "id", "in", vals, ts = ts)
                model = model.filterNot(r => vals.contains(r._1))
              } else {
                val lo = rnd.nextInt(30).toLong; val hi = lo + rnd.nextInt(10)
                CommitLog.deleteWhere(spark, table, "id", "range",
                  Seq(lo, hi), ts = ts)
                model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
              }
            }
          case 3 => // CDC merge keyed on id: updates/inserts + delete ops
            val ups = rows(1 + rnd.nextInt(4), s"m$step-")
              .groupBy(_._1).map(_._2.head).toSeq // one op per key
            val delKeys = Seq.fill(rnd.nextInt(3))(rnd.nextInt(40).toLong)
              .distinct.filterNot(ups.map(_._1).contains)
            val feed = (ups.map(r => (r._1, r._2, "U")) ++
              delKeys.map(k => (k, "x", "D"))).toDF("id", "v", "op")
            batch += 1
            CommitLog.merge(spark, table, feed, Seq("id"), "m", batch,
              ts = ts, statsCols = Seq("id"),
              deleteWhen = Some(col("op") === "D"), dropCols = Seq("op"))
            val touched = (ups.map(_._1) ++ delKeys).toSet
            model = model.filterNot(r => touched(r._1)) ++ ups
          case 4 => // maintenance: model no-op
            rnd.nextInt(3) match {
              case 0 => CommitLog.compactDeletes(spark, table, ts = ts)
              case 1 => CommitLog.compactFiles(spark, table,
                targetBytes = 128L * 1024 * 1024, ts = ts)
              case 2 => CommitLog.compactLog(spark, table)
            }
          case 5 => // no-op step (time passes; exercises as-of density)
        }
        val expected = count(model)
        if (model.nonEmpty || CommitLog.logState(spark, table).entries.nonEmpty) {
          assert(readRows(table) == expected, s"seed $seed step $step library")
          assert(readDsv2(table) == expected, s"seed $seed step $step dsv2")
        }
        history += ((ts, model))
        // one sampled time-travel probe per step: any PAST state must
        // still read exactly (vacuum never runs here)
        val (pastTs, pastModel) = history(rnd.nextInt(history.size))
        assert(readAsOf(table, pastTs) == count(pastModel),
          s"seed $seed step $step as-of $pastTs")
      }
    }
  }

  test("racing merges converge: the loser re-plans against the winner (r19 OCC retry)") {
    // every step runs TWO merges planned from the SAME log state (the
    // injectable race window): the inner one commits first, the outer
    // one hits the write conflict, re-plans and lands LAST — the model
    // applies inner then outer. Keys are seeded up front so every
    // merge updates EXISTING rows (two merges INSERTING the same fresh
    // key is the documented concurrent-append serializability hole —
    // out of scope for the retry, as for Delta without constraints).
    for (seed <- Seq(11L, 57L)) {
      val rnd = new scala.util.Random(seed)
      val table = java.nio.file.Files
        .createTempDirectory(s"graft-race$seed").toString + "/t"
      val keys = (0L until 40L).toVector
      var model: Vector[Row2] = keys.map(k => (k, s"base$k"))
      CommitLog.writeBatchWithStats(model.toDF("id", "v"), table,
        "r", 0L, Seq("id"), ts = 1000L)
      var ts = 1000L
      var batch = 0L
      def picks(tag: String): Seq[Row2] =
        Seq.fill(1 + rnd.nextInt(4))(keys(rnd.nextInt(keys.size)))
          .distinct.map(k => (k, s"$tag$k"))
      for (step <- 1 to 8) {
        ts += 1000
        val outer = picks(s"o$step-")
        val inner = picks(s"i$step-") // may overlap outer's keys
        batch += 2
        val (ob, ib) = (batch - 1, batch)
        var fired = false
        CommitLog.mergeWithHook(spark, table, outer.toDF("id", "v"),
          Seq("id"), "o", ob, ts = ts, statsCols = Seq("id"),
          beforeCommit = () => if (!fired) {
            fired = true
            CommitLog.merge(spark, table, inner.toDF("id", "v"),
              Seq("id"), "i", ib, ts = ts, statsCols = Seq("id"))
          })
        val innerKeys = inner.map(_._1).toSet
        val outerKeys = outer.map(_._1).toSet
        model = model.filterNot(r => innerKeys(r._1)) ++ inner
        model = model.filterNot(r => outerKeys(r._1)) ++ outer
        assert(readRows(table) == count(model),
          s"seed $seed step $step after racing merges")
      }
    }
  }
}
