package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance similarity self-join — the PassJoin segment
  * filter (Li/Deng/Feng 2011): partition every indexed string into
  * k+1 contiguous segments; if ed(s,t) <= k then by pigeonhole at
  * least one segment of s survives UNEDITED in t, shifted by at most
  * k positions — so candidate generation is an EQUI-join between s's
  * segments and t's bounded substring probes, never an all-pairs
  * levenshtein. The existing q_fuzzy_nations cross join is right for
  * a 25-row dimension; this is the corpus-scale form (near-dup titles,
  * URLs, names).
  *
  * Exactness: the filter is COMPLETE (every true pair produces at
  * least one probe/segment match — (k+1)·(2k+1)² probes per string
  * cover every admissible right length and shift), and every candidate
  * is verified with the real levenshtein, so the join equals the
  * brute-force answer. Strings shorter than k+1 chars are EXCLUDED
  * (segments would be empty; pad or bucket them upstream).
  *
  * Scale shape: k+1 index rows and (k+1)·(2k+1)² probe rows per
  * string (constants), one equi-join on (segment, j, len), distinct on
  * the candidate pair, then a levenshtein per CANDIDATE — cost is
  * driven by segment selectivity. Caveat: key spaces sharing long
  * constant prefixes ("Customer#...") make early segments hot and
  * degrade toward all-pairs within a length class — that is the
  * data's true pair structure, not an artifact; pre-strip constant
  * prefixes for such feeds.
  */
object EditJoin {

  /** All unordered pairs with ed <= k over `strCol` (chars). Output:
    * `(id1, id2, dist)` with id1 < id2 by the id column's ordering. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 5, s"k $k out of the sane band [1,5]")
    val p = k + 1
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .where(col("_s").isNotNull && length(col("_s")) >= p)

    def ibase(l: Column): Column = (l / p).cast("int")
    def irem(l: Column): Column = (l % p).cast("int")

    val lr = length(col("_s"))
    val segs = (0 until p).map { j =>
      val b = ibase(lr); val r = irem(lr)
      val lenJ = b + when(lit(j) < r, 1).otherwise(0)
      val startJ = lit(j) * b + least(lit(j), r)
      struct(lit(j).as("j"), col("_s").substr(startJ + 1, lenJ).as("seg"),
        lr.as("slen"))
    }
    val index = base.select(col("_id").as("rid"),
        explode(array(segs: _*)).as("g"))
      .select(col("rid"), col("g.j").as("j"), col("g.seg").as("seg"),
        col("g.slen").as("slen"))

    // probe generation as exploded (j, dl, d) SEQUENCES, not a literal
    // array of (k+1)·(2k+1)² struct expressions (r21): the unrolled
    // form put 75 substr/when subtrees into one plan and the entry's
    // dominant cost became per-run ANALYSIS of that tree (~3 s driver
    // at k=2, jobs themselves ~1 s). One arithmetic template over
    // three generators emits the identical probe rows.
    val lt = length(col("_s"))
    val l2 = lt + col("dl")
    val bP = ibase(l2); val rP = irem(l2)
    val lenJ = bP + when(col("j") < rP, 1).otherwise(0)
    val startJ = col("j") * bP + least(col("j"), rP) + col("d")
    val valid = (l2 >= p) && (startJ >= 0) && (startJ + lenJ <= lt)
    val probed = base.select(col("_id").as("lid"), col("_s"),
        explode(sequence(lit(0), lit(p - 1))).as("j"))
      .select(col("lid"), col("_s"), col("j"),
        explode(sequence(lit(-k), lit(k))).as("dl"))
      .select(col("lid"), col("_s"), col("j"), col("dl"),
        explode(sequence(lit(-k), lit(k))).as("d"))
      .select(col("lid"), col("j"),
        when(valid, col("_s").substr(startJ + 1, lenJ)).as("seg"),
        l2.as("slen"))
      .where(col("seg").isNotNull)

    val cands = probed.join(index, Seq("j", "seg", "slen"))
      .where(col("lid") =!= col("rid"))
      .select(least(col("lid"), col("rid")).as("id1"),
        greatest(col("lid"), col("rid")).as("id2"))
      .distinct()

    val s1 = base.select(col("_id").as("id1"), col("_s").as("_s1"))
    val s2 = base.select(col("_id").as("id2"), col("_s").as("_s2"))
    cands.join(s1, "id1").join(s2, "id2")
      .withColumn("dist", levenshtein(col("_s1"), col("_s2")))
      .where(col("dist") <= k)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
