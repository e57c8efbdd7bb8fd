package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("inc-ingest").toString

  private def writeFile(dir: String, name: String, ids: Seq[Long]): Unit =
    ids.toDF("id").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/_stage_$name")
      .ensuring { _ =>
        // move the single part file to a stable name so the listing
        // sees one file per logical drop
        val src = new java.io.File(s"$dir/_stage_$name").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val ok = src.renameTo(new java.io.File(s"$dir/$name"))
        scala.reflect.io.Directory(new java.io.File(s"$dir/_stage_$name"))
          .deleteRecursively()
        ok
      }

  test("first run processes everything; second run only the new file; third is a no-op") {
    val in = tmp(); val ledger = tmp() + "/ledger"
    writeFile(in, "a.parquet", Seq(1L, 2L))
    writeFile(in, "b.parquet", Seq(3L))
    var seen = Seq.empty[Long]
    val p1 = IncrementalIngest.ingest(spark, in, ledger, batchId = 1) { df =>
      seen = df.select("id").as[Long].collect().toSeq.sorted
    }
    assert(p1.map(f => f.split('/').last).sorted == Seq("a.parquet", "b.parquet"))
    assert(seen == Seq(1L, 2L, 3L))

    writeFile(in, "c.parquet", Seq(9L))
    val p2 = IncrementalIngest.ingest(spark, in, ledger, batchId = 2) { df =>
      seen = df.select("id").as[Long].collect().toSeq.sorted
    }
    assert(p2.map(_.split('/').last) == Seq("c.parquet"))
    assert(seen == Seq(9L))

    var called = false
    val p3 = IncrementalIngest.ingest(spark, in, ledger, batchId = 3) { _ =>
      called = true
    }
    assert(p3.isEmpty && !called)
    // audit surface: which batch took which file
    val led = IncrementalIngest.ledger(spark, ledger)
      .as[(String, Long, Long)].collect()
      .map { case (f, _, b) => f.split('/').last -> b }.toMap
    assert(led == Map("a.parquet" -> 1L, "b.parquet" -> 1L, "c.parquet" -> 2L))
  }

  test("a failed process leaves the ledger untouched (at-least-once retry)") {
    val in = tmp(); val ledger = tmp() + "/ledger"
    writeFile(in, "a.parquet", Seq(1L))
    intercept[RuntimeException] {
      IncrementalIngest.ingest(spark, in, ledger, batchId = 1) { _ =>
        throw new RuntimeException("sink down")
      }
    }
    // retry reprocesses the same file
    val p = IncrementalIngest.ingest(spark, in, ledger, batchId = 2) { _ => () }
    assert(p.map(_.split('/').last) == Seq("a.parquet"))
  }

  test("in-place overwrite with a different size is re-ingested") {
    val in = tmp(); val ledger = tmp() + "/ledger"
    writeFile(in, "a.parquet", Seq(1L))
    IncrementalIngest.ingest(spark, in, ledger, batchId = 1) { _ => () }
    writeFile(in, "a.parquet", Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    val p = IncrementalIngest.ingest(spark, in, ledger, batchId = 2) { _ => () }
    assert(p.map(_.split('/').last) == Seq("a.parquet"))
  }

  test("pending check anti-joins the ledger distributed — the ledger never lands on the driver") {
    val in = tmp(); val ledger = tmp() + "/ledger"
    writeFile(in, "a.parquet", Seq(1L))
    IncrementalIngest.ingest(spark, in, ledger, batchId = 1) { _ => () }
    writeFile(in, "b.parquet", Seq(2L))
    // plan pin: the subtraction shape is broadcast(listing) LEFT ANTI
    // streamed-ledger — the exact plan pendingFiles builds internally
    val listing = broadcast(Seq((s"$in/a.parquet", 0L), (s"$in/b.parquet", 0L))
      .toDF("file_path", "file_size"))
    val done = spark.read.parquet(ledger).select("file_path", "file_size")
    val plan = listing.join(done, Seq("file_path", "file_size"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
    // behavior: only the new file is pending
    val pend = IncrementalIngest.pendingFiles(spark, in, ledger)
    assert(pend.map(_._1.split('/').last) == Seq("b.parquet"))
  }

  test("compactLedger collapses per-batch small files, same rows") {
    val in = tmp(); val ledger = tmp() + "/ledger"
    for (b <- 1 to 5) {
      writeFile(in, s"f$b.parquet", Seq(b.toLong))
      IncrementalIngest.ingest(spark, in, ledger, batchId = b) { _ => () }
    }
    def nFiles = new java.io.File(ledger).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles == 5) // one coalesce(1) append per batch
    val before = IncrementalIngest.ledger(spark, ledger)
      .as[(String, Long, Long)].collect().toSet
    IncrementalIngest.compactLedger(spark, ledger)
    assert(nFiles == 1)
    val after = IncrementalIngest.ledger(spark, ledger)
      .as[(String, Long, Long)].collect().toSet
    assert(after == before)
    // the compacted ledger still gates: nothing pending
    assert(IncrementalIngest.pendingFiles(spark, in, ledger).isEmpty)
  }
}
