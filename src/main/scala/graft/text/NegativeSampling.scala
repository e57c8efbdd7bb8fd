package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** word2vec negative sampling (Mikolov et al. 2013): negatives drawn
  * from the unigram distribution raised to the 3/4 power. Implemented
  * the way the ORIGINAL C implementation does it — a pre-built
  * quantized sampling table mapping `tableSize` equal buckets to
  * words proportionally to their weight — because that is also the
  * form a distributed, replayable pipeline wants: the table is a
  * MODEL-sized (bucket, word) frame built in one pass, and every draw
  * is an integer `md5 mod tableSize` bucket pick plus one broadcast
  * equi-join. No float comparison anywhere in the draw path.
  *
  * Determinism details: freq^0.75 is computed as
  * `sqrt(freq · sqrt(freq))` — IEEE sqrt is correctly rounded in
  * every engine, unlike pow — then floor-quantized to 1e-6 integer
  * weights; bucket boundaries are exact integer ceil-divisions of the
  * cumulative weights (word-ascending order), so the table is
  * bit-identical across engines and partitionings. Overflow bound:
  * cum · tableSize must fit a long — fine to ~10¹⁵ total quantized
  * weight at the default 4096 buckets.
  *
  * The weight sum/cumsum runs as a WINDOW over the vocabulary — the
  * one place a single-partition window is correct by design: the
  * vocabulary (capped at `topV`) is model data, like IVF centroids
  * or the BPE pair table, not corpus data. */
object NegativeSampling {

  /** The sampling table: exactly `tableSize` rows (bucket, neg_word),
    * bucket 0-based, built from (word, freq). Words beyond the `topV`
    * most frequent (ties word-asc) are excluded — the standard
    * vocabulary cap. */
  def sampleTable(wordFreq: DataFrame, tableSize: Int = 4096,
                  topV: Int = 65536): DataFrame = {
    require(tableSize > 0 && topV > 0)
    val top = wordFreq
      .select(col("word"), col("freq").cast("long").as("freq"))
      .orderBy(col("freq").desc, col("word").asc).limit(topV)
    val w = top.select(col("word"),
      floor(sqrt(col("freq").cast("double") * sqrt(col("freq").cast("double"))) * 1e6)
        .cast("long").as("w"))
    val vocabW = Window.orderBy(col("word").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = w.withColumn("cum", sum("w").over(vocabW))
      .withColumn("prev", col("cum") - col("w"))
      .withColumn("total", sum("w").over(
        Window.orderBy(col("word").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // word covers buckets [ceil(prev·M/total), ceil(cum·M/total) − 1]
    // `div`, not `/`: Spark's / on longs is DOUBLE division
    cum.select(col("word"),
        expr(s"(prev * $tableSize + total - 1) div total").as("b_lo"),
        expr(s"((cum * $tableSize + total - 1) div total) - 1").as("b_hi"))
      .where(col("b_lo") <= col("b_hi"))
      .select(explode(sequence(col("b_lo"), col("b_hi"))).as("bucket"),
        col("word").as("neg_word"))
  }

  /** `k` seeded negatives per input row: bucket = md5(seed, id cols,
    * rank) mod tableSize, joined against the broadcast table. Output:
    * input id columns + (neg_rank 1..k, neg_word). Draws are
    * derandomized — same seed, same negatives, any partitioning. */
  def drawNegatives(items: DataFrame, idCols: Seq[String], k: Int,
                    table: DataFrame, seed: String): DataFrame = {
    require(k >= 1 && idCols.nonEmpty)
    val tableSize = table.count()
    val keyed = items.select(idCols.map(col): _*)
      .withColumn("neg_rank", explode(sequence(lit(1), lit(k))))
    // Column API, not an expr() splice: a quote in the seed or a
    // backtick in an id column name must not break the hash expression
    val keyParts = lit(seed) +: idCols.map(c => col(c).cast("string")) :+
      col("neg_rank").cast("string")
    keyed
      .withColumn("bucket",
        conv(substring(md5(concat_ws("|", keyParts: _*)), 1, 15), 16, 10)
          .cast("long") % lit(tableSize))
      .join(broadcast(table), "bucket")
      .select(idCols.map(col) :+ col("neg_rank") :+ col("neg_word"): _*)
  }
}
