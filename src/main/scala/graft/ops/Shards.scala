package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding with an integrity manifest — the
  * last step of a training-data pipeline: write the corpus as N
  * stable shards and record, per shard, a row count and an
  * order-independent identity checksum that any engine (or a later
  * audit job) can recompute from the data alone. Re-running the
  * pipeline yields byte-stable shard membership (content-hash
  * assignment, same property as Sampling.assignSplit), and a
  * missing / duplicated / misplaced row flips the checksum of
  * exactly the shard it touches.
  *
  * Scale shape: assignment is a narrow map; the manifest is one
  * hash-partitioned aggregation to N rows; the write is
  * `partitionBy(shard)` so each output task streams its own shard
  * files — no global sort, no single-writer funnel. The checksum is
  * a bitwise XOR of per-row 60-bit md5 folds: order-independent
  * (shuffle- and retry-safe), overflow-free, and replayable in SQL.
  */
object Shards {

  /** 60-bit md5 fold of `id:salt` — same engine-replayable hash
    * family as Sampling, kept full-width (< 2⁶⁰, no modulo) so the
    * XOR checksum uses all the entropy. */
  private def fold60(idCol: Column, salt: Long): Column =
    conv(substring(md5(concat(idCol.cast("string"), lit(":"), lit(salt))),
      1, 15), 16, 10).cast("long")

  /** Stable shard id in [0, numShards) for `idCol`'s content. */
  def assignShard(idCol: Column, numShards: Int, salt: Long = 0L): Column = {
    require(numShards > 0, s"numShards $numShards must be positive")
    pmod(fold60(idCol, salt), lit(numShards.toLong)).cast("int")
  }

  /** Relational manifest of the (planned or written) sharding:
    * `(shard, n_rows, checksum)` — checksum = XOR of row id folds.
    * Computable before the write, after the write, and by an external
    * engine; equality means the datasets hold exactly the same id
    * multiset per shard (XOR cancels a row appearing twice — pair it
    * with n_rows, which does not). */
  def manifest(df: DataFrame, idCol: String, numShards: Int,
      salt: Long = 0L): DataFrame =
    df.select(assignShard(col(idCol), numShards, salt).as("shard"),
        fold60(col(idCol), salt).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))

  /** Merge per-batch manifests into the manifest of the combined
    * data: counts add, XOR checksums compose (XOR is the point — an
    * incremental ingest maintains corpus-level integrity by folding
    * each micro-batch's manifest into the running one, never
    * re-scanning history; `manifest(b₁ ∪ b₂) = merge(manifest(b₁),
    * manifest(b₂))` exactly, for disjoint batches). */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("shard")
      .agg(sum("n_rows").as("n_rows"), expr("bit_xor(checksum)").as("checksum"))

  /** Write `df` as `numShards` hash shards under `path`
    * (`shard=<n>/part-*.parquet`) and return the manifest computed
    * from the files as written — grouped by the DIRECTORY partition
    * column, not a recomputed assignment, so the result certifies
    * what each shard directory actually holds (a row written to the
    * wrong shard would surface as two checksum mismatches).
    *
    * `df` must not already carry a `shard` column (it would be
    * silently replaced by the assignment — rejected instead), and the
    * write uses mode("overwrite"): any existing data under `path` is
    * replaced wholesale. */
  def writeShards(df: DataFrame, idCol: String, path: String,
      numShards: Int, salt: Long = 0L): DataFrame = {
    require(!df.columns.contains("shard"),
      "writeShards: input already has a 'shard' column — rename it; " +
        "the shard assignment owns that name (it becomes the partition dir)")
    df.withColumn("shard", assignShard(col(idCol), numShards, salt))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
      .select(col("shard").cast("int").as("shard"),
        fold60(col(idCol), salt).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("checksum"))
  }

  /** The ordered-shard manifest derived from the DATA alone (no
    * write): what an external auditor recomputes to certify a shard
    * directory — and exactly what [[writeOrderedShards]] reads back
    * from its files. (shard, n_rows, min_pos, max_pos, checksum). */
  def orderedManifest(df: DataFrame, idCol: String, rowsPerShard: Long,
      salt: Long = 0L): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive: $rowsPerShard")
    GlobalOrder.shuffled(df, idCol, salt)
      .select((col("pos") / rowsPerShard).cast("int").as("shard"), col("pos"),
        fold60(col(idCol), salt).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min("pos").as("min_pos"), max("pos").as("max_pos"),
        expr("bit_xor(h)").as("checksum"))
  }

  /** ORDERED shards: the training-run delivery format — rows carry a
    * reproducible global position ([[GlobalOrder.shuffled]]'s salted
    * order), shard s holds positions [s·rowsPerShard, (s+1)·…), and
    * files within a shard are written position-sorted, so "example i"
    * resolves to shard i/rowsPerShard by arithmetic and a resumed run
    * skips whole shards. [[writeShards]] trades order for pure hash
    * placement; this trades one range exchange for ORDER — both end
    * manifest-certified.
    *
    * Returns the manifest recomputed from the files as written:
    * (shard, n_rows, min_pos, max_pos, checksum). Contiguity is the
    * integrity property here, so min/max are part of it: a misplaced
    * or missing row breaks [min_pos, max_pos] = the shard's arithmetic
    * range (with n_rows = its width) before anyone checks a hash. */
  def writeOrderedShards(df: DataFrame, idCol: String, path: String,
      rowsPerShard: Long, salt: Long = 0L): DataFrame = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive: $rowsPerShard")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "writeOrderedShards: input already has a 'shard'/'pos' column — rename it")
    GlobalOrder.shuffled(df, idCol, salt)
      .withColumn("shard", (col("pos") / rowsPerShard).cast("int"))
      .sortWithinPartitions("pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
      .select(col("shard").cast("int").as("shard"), col("pos"),
        fold60(col(idCol), salt).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min("pos").as("min_pos"), max("pos").as("max_pos"),
        expr("bit_xor(h)").as("checksum"))
  }
}
