package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class NotebooksSpec extends SparkSpec {
  import spark.implicits._

  private def writeNb(dir: String, name: String, json: String): Unit =
    Files.writeString(Paths.get(dir, name), json)

  private val goodNb =
    """{"nbformat": 4, "nbformat_minor": 5, "metadata": {},
      | "cells": [
      |  {"cell_type": "markdown", "metadata": {},
      |   "source": ["# Title\n", "Some prose here.\n"]},
      |  {"cell_type": "code", "metadata": {}, "outputs": [],
      |   "execution_count": 1,
      |   "source": ["x = 1\n", "print(x)\n"]},
      |  {"cell_type": "code", "metadata": {}, "outputs": [],
      |   "execution_count": 2,
      |   "source": ["y = x + 1\n"]}
      |]}""".stripMargin

  test("readCells: one row per cell, line arrays joined, order kept") {
    val dir = Files.createTempDirectory("nb").toString
    writeNb(dir, "a.ipynb", goodNb)
    val cells = Notebooks.readCells(spark, s"$dir/*.ipynb")
      .orderBy("cell_idx").collect()
    assert(cells.length == 3)
    assert(cells.map(_.getAs[String]("cell_type")).toSeq ==
      Seq("markdown", "code", "code"))
    assert(cells(0).getAs[String]("source") == "# Title\nSome prose here.\n")
    assert(cells(1).getAs[String]("source") == "x = 1\nprint(x)\n")
    assert(cells(1).getAs[Int]("n_lines") == 2)
    assert(cells.forall(!_.getAs[Boolean]("_corrupt")))
  }

  test("a malformed notebook degrades to one _corrupt row, others unaffected") {
    val dir = Files.createTempDirectory("nb2").toString
    writeNb(dir, "good.ipynb", goodNb)
    writeNb(dir, "bad.ipynb", "{ not json at all")
    val cells = Notebooks.readCells(spark, s"$dir/*.ipynb")
    assert(cells.where(col("_corrupt")).count() == 1)
    assert(cells.where(col("_corrupt"))
      .select("path").as[String].head().endsWith("bad.ipynb"))
    assert(cells.where(!col("_corrupt")).count() == 3)
  }

  test("asDocuments splits code and prose per notebook in cell order") {
    val dir = Files.createTempDirectory("nb3").toString
    writeNb(dir, "a.ipynb", goodNb)
    val docs = Notebooks.asDocuments(
      Notebooks.readCells(spark, s"$dir/*.ipynb")).collect()
    assert(docs.length == 1)
    val d = docs(0)
    assert(d.getAs[String]("code") == "x = 1\nprint(x)\n\n\ny = x + 1\n")
    assert(d.getAs[String]("prose") == "# Title\nSome prose here.\n")
    assert(d.getAs[Long]("n_cells") == 3L)
  }

  test("code cells feed CodeText flags directly") {
    val dir = Files.createTempDirectory("nb4").toString
    writeNb(dir, "a.ipynb", goodNb)
    val flags = Notebooks.readCells(spark, s"$dir/*.ipynb")
      .where(col("cell_type") === "code")
      .select(graft.text.CodeText.codeFlags(col("source")).as("f"))
      .select("f.n_lines").as[Long].collect().sorted
    // trailing \n makes split produce a final empty line: 2 and 3
    assert(flags.toSeq == Seq(2L, 3L))
  }
}
