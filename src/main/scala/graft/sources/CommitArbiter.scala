package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit ARBITRATION seam (r20): how a fully-written temp marker
  * becomes durably and EXCLUSIVELY visible under its final name. Every
  * log-record publish — single-batch commits, transaction markers,
  * restore markers, tombstones, snapshot folds — goes through the one
  * installed arbiter, so the store-specific atomicity story lives in
  * exactly one place.
  *
  * Contract a plugin must meet:
  *   - `publish(fs, tmp, dst)` makes the COMPLETE content of `tmp`
  *     visible at `dst`, or nothing: a reader listing the directory
  *     must never observe a partial marker.
  *   - It must be EXCLUSIVE: when several processes race the same
  *     `dst`, at most one publish returns true; the rest return false
  *     with `dst` existing (callers treat a lost same-name race as
  *     success — markers are content-deterministic per name).
  *   - It must not require any state outside the filesystem: crash
  *     between publish attempts leaves only `.tmp` debris, which is
  *     invisible to readers and reclaimed by maintenance.
  *
  * Cross-process guarantees BY STORE CLASS, honestly:
  *   - HDFS / POSIX / local: [[CommitArbiter.Rename]] (the default)
  *     meets the contract outright — `rename` is atomic and fails
  *     when the destination exists.
  *   - S3-class object stores: a filesystem "rename" is copy+delete —
  *     atomic enough for VISIBILITY (the copy is a single-object PUT,
  *     so the marker appears complete or not at all) but NOT exclusive:
  *     two processes racing the same name can both "succeed", and the
  *     optimistic conflict re-check before publish only narrows the
  *     window. Same-process writers are still safe (the re-check runs
  *     under one log view), but true multi-process mutation on S3
  *     needs a put-if-absent arbiter — S3 conditional writes
  *     (`If-None-Match`), a DynamoDB-style lock table, or any CAS
  *     service — plugged via [[CommitArbiter.install]]. This is the
  *     same trade Delta resolves with its pluggable LogStore.
  */
trait CommitArbiter {
  /** Publish `tmp` at `dst` atomically-and-exclusively; false = lost
    * the race for this name (dst exists, written by someone else). */
  def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean
}

object CommitArbiter {

  /** HDFS/POSIX rename: atomic, destination-exclusive. The default. */
  object Rename extends CommitArbiter {
    override def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      fs.rename(tmp, dst)
  }

  @volatile private var current: CommitArbiter = Rename

  /** Install a store-specific arbiter process-wide (a put-if-absent
    * implementation for object stores). Pass [[Rename]] to restore
    * the default. */
  def install(a: CommitArbiter): Unit = { current = a }

  private[sources] def get: CommitArbiter = current
}
