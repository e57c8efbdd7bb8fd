package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jupyter notebook (.ipynb) source — the other container code
  * corpora arrive in (The Stack, Kaggle dumps): a notebook is one
  * JSON document whose `cells` each carry a type and a source-line
  * array. The reader is `spark.read` with `wholetext` (one notebook =
  * one JSON value = one row; a line-oriented JSON reader would split
  * it) + `from_json` with an explicit schema + one `posexplode` —
  * fully distributed, no driver parsing, and malformed notebooks
  * degrade to a `_corrupt` marker row per FILE (the PERMISSIVE
  * convention), never an exception.
  *
  * Output: one row per cell — (path, cell_idx, cell_type, source,
  * n_lines, _corrupt) — ready for [[graft.text.CodeText]] flags on
  * code cells and the prose operators on markdown cells. */
object Notebooks {

  /** nbformat 4's cell shape (`source` = line array; the archaic
    * single-string form parses to an empty source rather than
    * failing the whole notebook). */
  private val cellSchema = StructType(Seq(
    StructField("cell_type", StringType),
    StructField("source", ArrayType(StringType))))

  private val nbSchema = StructType(Seq(
    StructField("nbformat", IntegerType),
    StructField("cells", ArrayType(cellSchema))))

  /** One row per cell across every notebook under `glob`. */
  def readCells(spark: SparkSession, glob: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(glob)
      .withColumn("path", input_file_name())
    val parsed = raw.withColumn("nb", from_json(col("value"), nbSchema))
    val ok = parsed
      .where(col("nb").isNotNull && col("nb.cells").isNotNull)
      .select(col("path"),
        posexplode(col("nb.cells")).as(Seq("cell_idx", "c")))
      .select(col("path"), col("cell_idx"),
        col("c.cell_type").as("cell_type"),
        concat_ws("", col("c.source")).as("source"),
        coalesce(size(col("c.source")), lit(0)).as("n_lines"),
        lit(false).as("_corrupt"))
    val corrupt = parsed
      .where(col("nb").isNull || col("nb.cells").isNull)
      .select(col("path"), lit(-1).as("cell_idx"),
        lit(null).cast("string").as("cell_type"),
        lit(null).cast("string").as("source"),
        lit(0).as("n_lines"), lit(true).as("_corrupt"))
    ok.unionByName(corrupt)
  }

  /** The training-text projection: code cells concatenated per
    * notebook (what a code corpus ingests), markdown cells as prose.
    * One groupBy on path. */
  def asDocuments(cells: DataFrame): DataFrame =
    cells.where(!col("_corrupt"))
      .groupBy("path")
      .agg(
        concat_ws("\n\n", sort_array(collect_list(
          when(col("cell_type") === "code",
            struct(col("cell_idx"), col("source"))))).getField("source"))
          .as("code"),
        concat_ws("\n\n", sort_array(collect_list(
          when(col("cell_type") === "markdown",
            struct(col("cell_idx"), col("source"))))).getField("source"))
          .as("prose"),
        count(lit(1)).as("n_cells"))
}
