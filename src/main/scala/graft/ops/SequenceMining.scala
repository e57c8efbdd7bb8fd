package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over `(sequence, item, time)` events —
  * the ORDERED complement of [[Itemsets]]: which item chains (a → b,
  * a → b → c, items not necessarily adjacent) recur across enough
  * sequences. PrefixSpan (Pei et al. 2001) answers this by growing
  * projected databases; at bounded item vocabularies (event types,
  * page classes, funnel stages — the curation/behavioral case) the
  * same answer falls out of per-(sequence, item) TIME BOUNDS, with no
  * projection state at all:
  *
  *  - a→b occurs in s  ⇔  min_ts(a) < max_ts(b)   (a==b: two events)
  *  - a→b→c occurs in s ⇔ ∃ b-event in the OPEN interval
  *    (min_ts(a), max_ts(c)) ⇔ the smallest b-event time strictly
  *    after min_ts(a) is strictly before max_ts(c)
  *
  * both exact for ANY event multiplicity, both computed from frames
  * bounded by |sequences|·|items| — never an event-pair join. Exact
  * integer/timestamp comparisons end to end; supports are distinct
  * sequence counts.
  *
  * Scale shape: one (sequence, item) min/max aggregate; pairs are a
  * vocabulary-squared-bounded self-join per sequence; triples add one
  * events⋈bounds join (rows = events × items-per-sequence, vocabulary
  * bounded) and one groupBy. Ties (equal timestamps) do NOT count as
  * ordered — strict inequalities throughout, documented. */
object SequenceMining {

  private def bounds(ev: DataFrame, seqCol: String, itemCol: String,
      tsCol: String): DataFrame =
    ev.where(col(seqCol).isNotNull && col(itemCol).isNotNull &&
        col(tsCol).isNotNull)
      .groupBy(col(seqCol).as("sq"), col(itemCol).as("it"))
      .agg(min(col(tsCol)).as("tmin"), max(col(tsCol)).as("tmax"))

  /** Frequent ordered pairs: `(a, b, support)` — sequences containing
    * some a-event strictly before some b-event, support >=
    * minSupport. a == b means "item occurs at least twice". */
  def frequentPairs(ev: DataFrame, seqCol: String, itemCol: String,
      tsCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val st = bounds(ev, seqCol, itemCol, tsCol)
    st.as("a").join(st.as("b"),
        col("a.sq") === col("b.sq") && col("a.tmin") < col("b.tmax"))
      .groupBy(col("a.it").as("a"), col("b.it").as("b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Frequent ordered triples: `(a, b, c, support)` — sequences with
    * events of a, b, c at strictly increasing times. */
  def frequentTriples(ev: DataFrame, seqCol: String, itemCol: String,
      tsCol: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val st = bounds(ev, seqCol, itemCol, tsCol)
      .localCheckpoint(eager = false)
    val mids = ev.where(col(seqCol).isNotNull && col(itemCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(seqCol).as("sq"), col(itemCol).as("b"),
        col(tsCol).as("tb"))
    // smallest b-event strictly after a's first occurrence
    val firstAfter = mids.as("m").join(st.as("a"),
        col("m.sq") === col("a.sq") && col("a.tmin") < col("m.tb"))
      .groupBy(col("m.sq").as("sq"), col("a.it").as("a"),
        col("m.b").as("b"))
      .agg(min(col("m.tb")).as("tstar"))
    firstAfter.as("f").join(st.as("c"),
        col("f.sq") === col("c.sq") && col("f.tstar") < col("c.tmax"))
      .groupBy(col("f.a").as("a"), col("f.b").as("b"),
        col("c.it").as("c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
