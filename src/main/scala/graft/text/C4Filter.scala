package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4's line-level cleanup (Raffel et al. 2020, §2.2 — "Colossal
  * Clean Crawled Corpus") — the other half of web-text hygiene next
  * to [[LineDedup]]: LineDedup removes lines REPEATED across
  * documents; these rules remove lines that are junk in isolation
  * (menus, buttons, code fragments), then gate whole pages that are
  * left with too little prose. The exact published rule set:
  *
  *  - keep only lines ending in a terminal punctuation mark
  *    (`.`, `!`, `?`, `"`, `'` — quotes close quoted sentences);
  *  - keep only lines with at least `minWords` words (default 5,
  *    the paper's value: drops nav items and button labels);
  *  - drop any line containing the word "javascript" (enable-JS
  *    banners survive every other rule);
  *  - after cleaning, drop PAGES containing "lorem ipsum" or `{`
  *    (placeholder text, code), or with fewer than `minSentences`
  *    sentences (default 3).
  *
  * Everything is higher-order array functions over the line split —
  * one narrow codegen'd projection, NO explode, NO shuffle: the rules
  * run at scan speed and the DuckDB oracle replays them with
  * list_filter verbatim. */
object C4Filter {

  /** The cleaned text: junk lines removed, survivors rejoined in
    * order with their original newline framing. */
  def cleanLines(text: Column, minWords: Int = 5): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      t.rlike("[.!?\"']$") &&
        size(filter(split(t, "\\s+"), w => length(w) > 0)) >= minWords &&
        !lower(t).contains("javascript")
    })
    array_join(kept, "\n")
  }

  /** Page gate over the CLEANED text (C4 applies it after line
    * cleanup): no placeholder text, no code braces, enough sentences
    * to be prose. */
  def pageKeep(cleaned: Column, minSentences: Int = 3): Column =
    !lower(cleaned).contains("lorem ipsum") &&
      !cleaned.contains("{") &&
      coalesce(regexp_count(cleaned, lit("[.!?]")), lit(0)) >= minSentences

  /** The composed operator: (id, text) → (id, clean_text, kept).
    * Callers route on `kept` and feed `clean_text` downstream. */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val cleaned = cleanLines(col(textCol), minWords)
    df.select(col(idCol),
      cleaned.as("clean_text"),
      pageKeep(cleaned, minSentences).as("kept"))
  }
}
