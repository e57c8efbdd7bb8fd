package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All are pure `functions._` column expressions — narrow, codegen'd,
  * no UDFs — so they run at scan speed over any corpus size and can be
  * fused into the same projection as validation rules.
  */
object TextAnalysis {

  /** Whitespace token count (0 for blank/NULL). Counts NON-EMPTY
    * tokens: `trim` strips only 0x20, so a tab/newline at either edge
    * of the text yields "" entries from `split` — counting those would
    * diverge from any length>0-filtered tokenization (the r6 oracle
    * divergence class). */
  def wsTokenCount(text: Column): Column =
    // greatest: under spark.sql.legacy.sizeOfNull (ANSI off) size(NULL)
    // is -1, not NULL — coalesce alone would let it through and a NULL
    // doc would count -1 tokens
    greatest(coalesce(size(filter(split(text, "\\s+"), t => length(t) > 0)),
      lit(0)), lit(0))

  /** BPE-ish subword-unit count: runs of letters, single digits, and
    * single non-alphanumeric marks — a cheap proxy for tokenizer cost
    * (GPT-2-style pre-tokenization splits on exactly these classes). */
  def bpeishTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")), lit(0))

  /** Heuristic quality score in [0,1]:
    * mean word length in a sane band, low symbol ratio, reasonable
    * length — the length/punct/stopword-ratio family of filters used by
    * web-corpus pipelines (C4/Gopher-style rules). Deterministic,
    * SQL-expressible (mirrored in the DuckDB oracle). */
  def qualityScore(text: Column): Column = {
    val t = trim(text)
    val nChars = length(t).cast("double")
    val nTokens = wsTokenCount(text).cast("double")
    // native char-class counters (graft.expr.CountInSet, r21): both
    // classes are ASCII-only single-char classes, where counting
    // mask-member BYTES equals regexp_count's per-char matches
    // (CountInSetSpec pins the equality property-style) — but one
    // branch-light byte loop instead of java.util.regex's per-position
    // find() state machine (the two regexp passes were the dominant
    // per-row cost of every eval_quality_* scan). Value-identical, so
    // the DuckDB oracles' regexp forms still match bit-for-bit.
    val alphaSet = ('A' to 'Z').mkString + ('a' to 'z').mkString
    val nAlpha = coalesce(
      graft.expr.CountInSet.countInSet(t, alphaSet), lit(0)).cast("double")
    // symbol count as length MINUS the positive-class count — the
    // same integer as counting [^A-Za-z0-9\s] (every char either is
    // in the class or is not); the negated-class regex form was ~9x
    // slower still (r20 measurement, kept for the record).
    val nSym = (length(t) - coalesce(
      graft.expr.CountInSet.countInSet(t,
        alphaSet + ('0' to '9').mkString +
          graft.expr.CountInSet.RegexWhitespace), lit(0))).cast("double")
    val meanWord = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val alphaRatio = when(nChars > 0, nAlpha / nChars).otherwise(lit(0.0))
    val symRatio = when(nChars > 0, nSym / nChars).otherwise(lit(0.0))
    val lenOk = when(nChars >= 50 && nChars <= 100000, 1.0).otherwise(0.5)
    val wordOk = when(meanWord >= 3 && meanWord <= 12, 1.0).otherwise(0.5)
    // floor-quantize instead of round: the score formula can land
    // exactly on a half-ulp boundary where Spark (HALF_UP on the exact
    // binary value) and other engines (multiply-then-round) disagree;
    // floor of an identical IEEE double is engine-stable.
    floor(least(lit(1.0),
      alphaRatio * 0.4 + (lit(1.0) - least(symRatio * 5, lit(1.0))) * 0.2 +
        lenOk * 0.2 + wordOk * 0.2) * 10000) / 10000
  }

  /** Stopword evidence per language, SCRIPT-ROUTED: tiny
    * high-frequency function-word lists, the language with the most
    * distinct hits wins (struct-max, ties → lexicographically-largest
    * lang code; 0 hits → 'und'). The n-gram-free cousin of CLD-style
    * detectors — O(tokens) per doc.
    *
    * The lists are curated for PAIRWISE SEPARATION inside each script:
    * shared Romance/Germanic function words appear in both lists they
    * belong to (they cancel in the vote) while each language carries
    * distinctive forms (es `el/los/y` vs pt `o/os/e`; de `ein/nicht`
    * vs nl `een/niet`; da `af/hvad/efter` vs no `av/hva/etter`; cs
    * `se/nebo/jsem` vs sk `sa/alebo/som`). All lists are public
    * high-frequency function words. */
  private[graft] val latinStops: Seq[(String, Seq[String])] = Seq(
    "ca" -> Seq("els", "les", "amb", "què", "per", "una", "és", "dels", "com", "més", "hi", "aquest"),
    "cs" -> Seq("a", "je", "se", "na", "že", "to", "nebo", "ale", "jako", "pro", "jsem", "byl"),
    "da" -> Seq("og", "det", "er", "til", "ikke", "af", "hvad", "efter", "noget", "hende", "skal", "være"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf", "zu", "sich"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "on"),
    "es" -> Seq("el", "la", "los", "las", "que", "y", "en", "un", "una", "es", "con", "no"),
    "et" -> Seq("ja", "on", "ei", "et", "see", "ta", "aga", "oli", "kui", "ka", "nii", "oma"),
    "fi" -> Seq("ja", "on", "ei", "että", "se", "hän", "mutta", "oli", "kun", "myös", "niin", "ovat"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "que", "pour", "dans", "une", "du", "il"),
    "hr" -> Seq("je", "i", "u", "na", "se", "da", "su", "za", "ali", "kao", "što", "nije"),
    "hu" -> Seq("a", "az", "és", "nem", "hogy", "is", "egy", "van", "volt", "csak", "már", "meg"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan", "pada", "adalah"),
    "it" -> Seq("il", "lo", "la", "gli", "che", "di", "non", "per", "una", "sono", "con", "si"),
    "lt" -> Seq("ir", "yra", "kad", "tai", "su", "bet", "kaip", "jis", "buvo", "iš", "apie", "jau"),
    "lv" -> Seq("un", "ir", "ka", "tas", "ar", "bet", "kā", "viņš", "bija", "no", "par", "jau"),
    "nl" -> Seq("de", "het", "een", "niet", "van", "je", "op", "aan", "voor", "zijn", "ook", "maar"),
    "no" -> Seq("og", "det", "er", "til", "ikke", "av", "hva", "etter", "noe", "henne", "skal", "være"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "jest", "że", "do", "z", "to", "co", "jak"),
    "pt" -> Seq("o", "os", "as", "um", "uma", "que", "não", "com", "em", "é", "para", "se"),
    "ro" -> Seq("și", "de", "la", "cu", "nu", "este", "pentru", "din", "care", "mai", "sunt", "o"),
    "sk" -> Seq("a", "je", "sa", "na", "že", "to", "alebo", "ale", "ako", "pre", "som", "bol"),
    "sl" -> Seq("je", "in", "na", "se", "da", "so", "za", "ali", "kot", "kaj", "tudi", "ni"),
    "sv" -> Seq("och", "att", "det", "som", "en", "är", "av", "för", "med", "på", "inte", "han"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ne", "ben", "çok", "ama", "gibi", "var", "daha", "olarak"),
    "vi" -> Seq("và", "của", "là", "có", "không", "được", "trong", "cho", "người", "này", "với", "các"))

  private[graft] val cyrillicStops: Seq[(String, Seq[String])] = Seq(
    "bg" -> Seq("и", "в", "не", "на", "че", "той", "как", "това", "но", "го", "по", "тя"),
    "mk" -> Seq("и", "во", "не", "на", "што", "тој", "како", "тоа", "но", "го", "по", "таа"),
    "ru" -> Seq("и", "в", "не", "на", "что", "он", "как", "это", "но", "его", "по", "она"),
    "sr" -> Seq("и", "у", "не", "на", "што", "он", "као", "то", "али", "га", "по", "она"),
    "uk" -> Seq("і", "в", "не", "на", "що", "він", "як", "це", "але", "його", "по", "вона"))

  private[graft] val arabicStops: Seq[(String, Seq[String])] = Seq(
    "ar" -> Seq("في", "من", "على", "أن", "إلى", "عن", "هذا", "كان", "مع", "لا", "هو", "ما"),
    "fa" -> Seq("در", "از", "که", "با", "را", "این", "است", "برای", "آن", "خود", "تا", "هم"))

  /** Writing-system ranges used by [[langId]]'s routing — FINER than
    * [[scriptRanges]] (kana split from han so ja/zh separate; hebrew,
    * thai, devanagari added). Literal-char classes, any regex engine
    * replays the counts. */
  private[graft] val langScriptRanges: Seq[(String, String)] = Seq(
    "arabic" -> "؀-ۿ",
    "bengali" -> "ঀ-৿",
    "cyrillic" -> "Ѐ-ӿ",
    "devanagari" -> "ऀ-ॿ",
    "greek" -> "Ͱ-Ͽ",
    "gujarati" -> "઀-૿",
    "gurmukhi" -> "਀-੿",
    "han" -> "一-鿿",
    "hangul" -> "가-힯",
    "hebrew" -> "֐-׿",
    "kana" -> "぀-ヿ",
    "kannada" -> "ಀ-೿",
    "latin" -> "A-Za-zÀ-ɏ",
    "malayalam" -> "ഀ-ൿ",
    "oriya" -> "଀-୿",
    "tamil" -> "஀-௿",
    "telugu" -> "ఀ-౿",
    "thai" -> "฀-๿")

  /** Script name → the language its text IS, for the scripts that
    * (for web-corpus purposes) belong to exactly one language —
    * including the eight Indic web-language scripts (bn, ta, or,
    * te, gu, kn, ml, pa), which routed to 'und' before r15. Scripts
    * shared across languages (latin, cyrillic, arabic, han/kana)
    * resolve through stopword votes / the kana discriminator
    * instead. */
  private[graft] val singleLangScripts: Seq[(String, String)] = Seq(
    "bengali" -> "bn",
    "devanagari" -> "hi",
    "greek" -> "el",
    "gujarati" -> "gu",
    "gurmukhi" -> "pa",
    "hangul" -> "ko",
    "hebrew" -> "he",
    "kannada" -> "kn",
    "malayalam" -> "ml",
    "oriya" -> "or",
    "tamil" -> "ta",
    "telugu" -> "te",
    "thai" -> "th")

  /** One script's languages voting: struct-max over (distinct-hit
    * count, lang). */
  private def voteAmong(toks: Column,
      stops: Seq[(String, Seq[String])]): Column =
    array_max(array(stops.map { case (lang, words) =>
      struct(size(array_intersect(toks, array(words.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }: _*))

  /** Language ID over ~46 languages: the dominant SCRIPT routes first
    * — ONE native UTF-8 byte pass ([[graft.expr.LangScriptRoute]],
    * replacing eighteen per-script regexp scans; the composed regexp
    * form survives as [[langIdComposed]], the executable spec the
    * kernel is property-tested against) — so CJK/Thai/Hebrew/Indic
    * text never pays a stopword scan and the thirteen single-language
    * scripts ([[singleLangScripts]]) resolve without one; then a
    * per-script stopword vote separates the languages sharing a
    * script (25 Latin, 5 Cyrillic, ar/fa). kana ⇒ ja; han with ANY
    * kana ⇒ ja, han alone ⇒ zh. Scripted text whose script vote has
    * no stopword hits → 'und' (seen script, unseen language — the
    * honest answer). Routing is GENERATED from langScriptRanges order
    * + singleLangScripts, so the three layers (native kernel, this
    * when-chain, the DuckDB oracle) cannot drift on which script maps
    * where. `when` branches evaluate lazily per row in codegen, so
    * each row pays exactly one script's vote. */
  def langId(text: Column): Column = {
    // route = scriptIdx (sorted langScriptRanges order) | 0x100 if kana
    val route = graft.expr.LangScriptRoute.langScriptRoute(text)
    val scriptIdx = route.bitwiseAND(lit(0xff))
    val kanaSeen = route.bitwiseAND(lit(0x100)) > 0
    val toks = split(trim(lower(text)), "\\s+")
    def voted(stops: Seq[(String, Seq[String])]): Column = {
      val v = voteAmong(toks, stops)
      when(v.getField("hits") > 0, v.getField("lang")).otherwise(lit("und"))
    }
    val single = singleLangScripts.toMap
    langScriptRanges.map(_._1).zipWithIndex
      .filter(_._1 != "latin") // latin is the otherwise arm
      .foldLeft(when(route.isNull, lit("und"))) { case (acc, (name, i)) =>
        val res = name match {
          case "kana" => lit("ja")
          case "han" => when(kanaSeen, lit("ja")).otherwise(lit("zh"))
          case "cyrillic" => voted(cyrillicStops)
          case "arabic" => voted(arabicStops)
          case n => lit(single(n))
        }
        acc.when(scriptIdx === i, res)
      }
      .otherwise(voted(latinStops))
  }

  /** The composed regexp form of [[langId]] — the executable spec the
    * native script-route kernel is property-tested against
    * (TextAnalysisSpec): eighteen per-script char-class counts,
    * struct-max routing, identical vote layer; single-language
    * scripts resolve through the same [[singleLangScripts]] map the
    * native chain uses. */
  private[graft] def langIdComposed(text: Column): Column = {
    def cnt(cls: String) =
      coalesce(regexp_count(text, lit(s"[$cls]")), lit(0))
    val counts = langScriptRanges.map { case (name, cls) => name -> cnt(cls) }
    val best = array_max(array(counts.map { case (name, c) =>
      struct(c.as("hits"), lit(name).as("s"))
    }: _*))
    val script = best.getField("s")
    val kanaCnt = counts.toMap.apply("kana")
    val toks = split(trim(lower(text)), "\\s+")
    def voted(stops: Seq[(String, Seq[String])]): Column = {
      val v = voteAmong(toks, stops)
      when(v.getField("hits") > 0, v.getField("lang")).otherwise(lit("und"))
    }
    val base = when(best.getField("hits") <= 0, lit("und"))
      .when(script === "kana", lit("ja"))
      .when(script === "han", when(kanaCnt > 0, lit("ja")).otherwise(lit("zh")))
    singleLangScripts
      .foldLeft(base) { case (acc, (name, lang)) =>
        acc.when(script === name, lit(lang))
      }
      .when(script === "cyrillic", voted(cyrillicStops))
      .when(script === "arabic", voted(arabicStops))
      .otherwise(voted(latinStops))
  }

  /** Un-wrap hard line breaks — the standard post-processing for
    * PDF/fixed-width-extracted text, where every visual line carries a
    * newline and words hyphen-break across lines:
    *   1. normalize CRLF/CR to LF;
    *   2. de-hyphenate `letter-\n letter` wraps (non-overlapping
    *      left-to-right, the shared Java/RE2 replaceAll semantics — a
    *      chain like `a-\nb-\nc` resolves its first wrap per pass);
    *   3. collapse PARAGRAAPH breaks (`\n\s*\n`) to a sentinel, turn
    *      the remaining single newlines into spaces, restore the
    *      sentinel as `\n\n`.
    * Pure codegen'd regexp chain, each pattern RE2-replayable so the
    * DuckDB oracle runs the identical passes. Sentinel is U+0001 —
    * legitimate text never carries it (C4/control-char gates strip it
    * upstream); a document that does would see those chars become
    * paragraph breaks, documented. */
  def unwrapLines(text: Column): Column = {
    val lf = regexp_replace(text, "\\r\\n?", "\n")
    val deh = regexp_replace(lf, "(\\p{L})-\\n(\\p{L})", "$1$2")
    val prot = regexp_replace(deh, "\\n\\s*\\n", "\u0001")
    val unwrapped = regexp_replace(prot, "\\n", " ")
    regexp_replace(unwrapped, "\u0001", "\n\n")
  }

  /** Accent folding for matching keys — NFD then strip every
    * combining mark (`café`→`cafe`, `Müller`→`Muller`; base letters
    * with no decomposition like `ø` survive): the normalization
    * record linkage, URL slugs, and fuzzy name joins apply before
    * comparing. Identical to DuckDB's `strip_accents` (checked on
    * diacritics, ring/umlaut/tilde/cedilla, stroke letters, and kana
    * dakuten), so the oracle replays it with the built-in. */
  def foldAccents(text: Column): Column =
    regexp_replace(
      graft.expr.NormalizeText.normalize(text, "NFD"), "\\p{M}", "")

  /** Repetition ratio in [0,1]: fraction of token occurrences that are
    * repeats of an earlier token — the Gopher-style "duplicate
    * fraction" filter (templated/boilerplate docs score high, natural
    * prose low). 0 for blank docs. Narrow codegen'd array ops, no
    * shuffle; floor-quantized for cross-engine stability. */
  def repetitionRatio(text: Column): Column = {
    // empty tokens (tab/newline at the text edges survive the
    // space-only trim) are filtered BEFORE distinct/total, matching
    // the length>0-filtered oracle tokenization — a tab-only doc is
    // blank (ratio 0), not 50% repetitious
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val n = coalesce(size(toks), lit(0)).cast("double")
    when(n === 0, 0.0).otherwise(
      floor((lit(1.0) - size(array_distinct(toks)) / n) * 10000) / 10000)
  }

  /** Encoding-damage ("mojibake") score in [0,1]: the fraction of
    * characters that are evidence of a decode gone wrong —
    *  - UTF-8-bytes-read-as-Latin-1 artifacts: U+00C2/U+00C3 ('Â'/'Ã',
    *    the lead bytes of 2-byte UTF-8 sequences) immediately followed
    *    by a continuation-range char U+0080-U+00BF (the "Ã©", "â€™"
    *    family's first pair);
    *  - U+FFFD replacement characters (a decoder already gave up);
    *  - bare C1 controls U+0080-U+009F (never legitimate in text).
    * Counting is by deleted-length difference (no regexp_count
    * dependency), one codegen'd scan; every pattern is a literal-char
    * class so any regex engine replays it bit-identically. The
    * standard crawl-QC gate: score > ~0.01 marks a mis-decoded doc. */
  def mojibakeScore(text: Column): Column = {
    val s = coalesce(text, lit(""))
    val n = length(s).cast("double")
    val pairHits = (n - length(regexp_replace(s, "[\u00C2\u00C3][\u0080-\u00BF]", ""))) / 2
    val oneHits = n - length(regexp_replace(s, "[\uFFFD\u0080-\u009F]", ""))
    when(n === 0, 0.0).otherwise(
      floor((pairHits * 2 + oneHits) / n * 10000) / 10000)
  }

  /** Unicode writing-system ranges (BMP), as literal-char regex
    * classes so any regex engine replays the counts. */
  private val scriptRanges: Map[String, String] = Map(
    "latin" -> "A-Za-zÀ-ɏ",
    "cyrillic" -> "Ѐ-ӿ",
    "greek" -> "Ͱ-Ͽ",
    "cjk" -> "぀-ヿ一-鿿", // kana + unified ideographs
    "arabic" -> "؀-ۿ",
    "hangul" -> "가-힯")

  /** Dominant writing system of the text: per-script character counts
    * (one single-char regex class each), max count wins, ties broken
    * by the lexicographically-largest script name (same deterministic
    * struct-max shape as [[langId]]); no script characters → 'other'.
    * The charset-detection step of multilingual corpus routing —
    * O(chars) per doc, scan-speed, no shuffle. */
  def scriptId(text: Column): Column = {
    val counts = scriptRanges.toSeq.sortBy(_._1).map { case (name, cls) =>
      struct(coalesce(regexp_count(text, lit(s"[$cls]")), lit(0)).as("hits"),
        lit(name).as("script"))
    }
    val best = array_max(array(counts: _*))
    when(best.getField("hits") > 0, best.getField("script"))
      .otherwise(lit("other"))
  }

  /** Mean length of non-empty whitespace tokens (0 for blank/NULL
    * docs); floor-quantized to 1e-4 for cross-engine stability. Total
    * token chars = doc length with all whitespace removed, so no
    * per-token aggregation is needed — one regexp, one division. */
  def meanWordLen(text: Column): Column = {
    val n = wsTokenCount(text).cast("double")
    val chars =
      length(regexp_replace(coalesce(text, lit("")), "\\s+", "")).cast("double")
    when(n === 0, 0.0).otherwise(floor(chars / n * 10000) / 10000)
  }

  /** Flesch reading-ease and Flesch-Kincaid grade — the classic
    * audience-difficulty signals (Kincaid et al. 1975), the
    * readability rung the quality ladder ([[qualityScore]], gopher
    * flags) stops short of. Syllables are approximated as vowel-group
    * runs (`[aeiouy]+` on the folded text) — the standard
    * dictionary-free proxy, biased low on silent-e words but
    * monotone with true syllable load and exactly replayable by any
    * regex engine. Sentences are terminator-group counts (floored at
    * 1 so headline-ish fragments don't divide by zero). Returns a
    * struct `(n_words, n_sentences, n_syllables, flesch, fk_grade)`;
    * scores NULL on wordless docs, floor-quantized to 10⁻⁴. Narrow
    * codegen'd scan — no shuffle, no UDF. */
  def readability(text: Column): Column = {
    val words = wsTokenCount(text)
    val sents = greatest(coalesce(regexp_count(text, lit("[.!?]+")),
      lit(0)), lit(1))
    val syl = coalesce(regexp_count(lower(text), lit("[aeiouy]+")), lit(0))
    val w = words.cast("double")
    val wps = w / sents.cast("double")
    val spw = syl.cast("double") / w
    struct(
      words.as("n_words"),
      sents.as("n_sentences"),
      syl.as("n_syllables"),
      when(words > 0, floor((lit(206.835) - lit(1.015) * wps -
        lit(84.6) * spw) * 10000) / 10000).as("flesch"),
      when(words > 0, floor((lit(0.39) * wps + lit(11.8) * spw -
        lit(15.59)) * 10000) / 10000).as("fk_grade"))
  }

  /** Fraction of tokens containing at least one ASCII letter — the
    * Gopher "≥80% of words must have an alphabetic character" filter
    * (numeric/symbol-soup docs score low). Tokens come from the
    * case-folded text, so the class is just [a-z]. */
  def alphaWordFrac(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    // greatest guards legacy size(NULL) = -1 (see wsTokenCount)
    val n = greatest(coalesce(size(toks), lit(0)), lit(0)).cast("double")
    val nAlpha = greatest(coalesce(
      size(filter(toks, t => regexp_count(t, lit("[a-z]")) > 0)), lit(0)),
      lit(0)).cast("double")
    when(n === 0, 0.0).otherwise(floor(nAlpha / n * 10000) / 10000)
  }

  /** Duplicate word-n-gram fraction (the Gopher "fraction of
    * duplicated n-grams" repetition filter, generalizing
    * [[repetitionRatio]] from unigrams): 1 − distinct/total over the
    * doc's adjacent n-token shingles; 0 when the doc has fewer than n
    * tokens. Narrow codegen'd array ops, no shuffle. */
  def dupNgramFrac(text: Column, n: Int = 2): Column = {
    require(n >= 1, "need n >= 1")
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    // greatest guards legacy size(NULL) = -1 (see wsTokenCount)
    val total = greatest(coalesce(size(toks), lit(0)), lit(0)) - (n - 1)
    // gram generation via zip_with over shifted slices — NOT
    // transform(sequence, i => slice(toks, i, n)): a lambda that
    // references `toks` re-evaluates the whole tokenization per
    // element after CollapseProject inlines it (O(len²) per doc —
    // the same trap BigramLm.pairs measured at 7x on the bench).
    // Successive zip_withs append one shifted slice per extra gram
    // position; tokenization cost stays O(n·len) per row.
    val len = greatest(total, lit(0))
    val grams = (2 to n).foldLeft(slice(toks, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), len),
        (a, b) => concat(a, lit(" "), b))
    }
    when(total <= 0, 0.0).otherwise(
      floor((lit(1.0) - size(array_distinct(grams)).cast("double")
        / total.cast("double")) * 10000) / 10000)
  }

  /** Gopher-style document keep decision: word count in band, mean
    * word length in band, enough alphabetic words, low n-gram
    * repetition. Thresholds default to values meaningful for prose;
    * all inputs are the floor-quantized metrics above, so the decision
    * replays identically in any engine. */
  def gopherKeep(text: Column, minWords: Int = 30, maxWords: Int = 100000,
      minMeanWord: Double = 4.0, maxMeanWord: Double = 10.0,
      minAlphaFrac: Double = 0.8, maxDupBigramFrac: Double = 0.05): Column = {
    val n = wsTokenCount(text)
    n.geq(minWords) && n.leq(maxWords) &&
      meanWordLen(text).between(minMeanWord, maxMeanWord) &&
      alphaWordFrac(text) >= minAlphaFrac &&
      dupNgramFrac(text, 2) <= maxDupBigramFrac
  }

  /** PII-style scrubbing for training corpora: emails → <EMAIL>,
    * long digit runs (phone/account numbers) → <NUM>. Pure
    * regexp_replace — runs at scan speed; patterns restricted to
    * POSIX-safe classes so any engine reproduces them. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{7,}", "<NUM>")

  /** Sentence segmentation: split after `.`/`!`/`?` followed by
    * whitespace, trimmed, empties dropped — as `array<string>`.
    * RE2-safe (no lookbehind: the boundary is marked by a `$1`-keeping
    * replacement with U+001E, then split on it), so an external
    * engine replays segmentation exactly. The abbreviation-aware
    * heuristics of NLP segmenters are deliberately out: they are
    * language-specific model data, and the downstream uses here
    * (stats, chunk boundaries) tolerate an occasional over-split. */
  def sentences(text: Column): Column = {
    val marked = regexp_replace(coalesce(text, lit("")),
      "([.!?])\\s+", "$1\u001E")
    filter(transform(split(marked, "\u001E"), s => trim(s)),
      s => length(s) > 0)
  }

  /** Sentence-aware chunking: pack whole sentences greedily into
    * chunks of at most `maxChars` (a lone sentence longer than the
    * budget becomes its own oversized chunk — never split mid-
    * sentence). The RAG/context-window chunking shape that [[chunks]]'
    * fixed character windows can't give you. One codegen'd aggregate
    * fold over the sentence array — narrow, no shuffle, no UDF. */
  def chunkBySentences(text: Column, maxChars: Int): Column = {
    require(maxChars > 0, "maxChars must be positive")
    val emptyChunks = array().cast("array<string>")
    val folded = aggregate(
      sentences(text),
      struct(emptyChunks.as("done"), lit("").as("cur")),
      (acc, s) => {
        val cur = acc.getField("cur")
        val joined = concat(cur, lit(" "), s)
        when(cur === "", struct(acc.getField("done").as("done"), s.as("cur")))
          .when(length(joined) <= maxChars,
            struct(acc.getField("done").as("done"), joined.as("cur")))
          .otherwise(struct(
            concat(acc.getField("done"), array(cur)).as("done"), s.as("cur")))
      },
      acc => when(acc.getField("cur") === "", acc.getField("done"))
        .otherwise(concat(acc.getField("done"), array(acc.getField("cur")))))
    folded
  }

  /** Candidate payment-card substrings: 13-19 digits with optional
    * single space/dash separators between digit pairs — the raw
    * matches, validation is [[luhnValid]]'s job. */
  def ccCandidates(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")),
      lit("[0-9](?:[ -]?[0-9]){12,18}"), lit(0))

  /** Luhn checksum over a digits-only string: standard card-number
    * validation (double every second digit from the right, subtract 9
    * above 9, total ≡ 0 mod 10) plus the 13-19 length band. A
    * codegen'd `aggregate` over character positions — no UDF; an
    * engine with list lambdas replays it exactly. */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val sum = aggregate(
      sequence(lit(1), greatest(n, lit(1))),
      lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val dd = d * 2
        acc + when(((n - i) % 2) === 1,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })
    n.between(13, 19) && (sum % 10 === 0)
  }

  /** The Luhn-VALID candidates of `text`, in match order, as their
    * original (separator-preserving) substrings — what a scrubber
    * must replace. Distinguishing real card numbers from arbitrary
    * digit runs is the difference between PII removal and destroying
    * every order id in the corpus. */
  def ccValid(text: Column): Column = {
    val structs = transform(ccCandidates(text), x =>
      struct(x.as("orig"), regexp_replace(x, "[ -]", "").as("ds")))
    transform(filter(structs, s => luhnValid(s.getField("ds"))),
      s => s.getField("orig"))
  }

  /** Replace every Luhn-valid card number with `<CC>` (exact-substring
    * replace of each valid match; invalid digit runs survive). Compose
    * with [[scrubPii]] for the full PII pass — card numbers first,
    * or the generic long-digit-run rule masks them as `<NUM>`. */
  def scrubCc(text: Column): Column =
    aggregate(ccValid(text), coalesce(text, lit("")),
      (acc, x) => replace(acc, x, lit("<CC>")))

  /** Candidate IBAN substrings: two uppercase letters + two check
    * digits + 10-30 more alphanumerics with optional single-space
    * grouping — both the printed form (`DE89 3704 0044 …`) and the
    * compact form; validation is [[ibanValid]]'s job. An uppercase
    * word glued directly after a real IBAN absorbs into the greedy
    * candidate and fails the checksum — the candidate then survives
    * unscrubbed (the standard scrubber trade-off; the separator-free
    * plants the oracle gates never hit it). */
  def ibanCandidates(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")),
      lit("[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]){10,30}"), lit(0))

  /** ISO 13616 mod-97 check over a compact (space-free) IBAN: rotate
    * the first four chars to the end, map A..Z → 10..35, fold the
    * digit stream mod 97 — valid iff the residue is 1 (plus the
    * 15-34 length band). The fold is a codegen'd `aggregate` over
    * character positions, reducing mod 97 every step (letters scale
    * the accumulator by 100, digits by 10) — no bignum, and an engine
    * with list lambdas replays it exactly. */
  def ibanValid(compact: Column): Column = {
    val n = length(compact)
    val rot = concat(compact.substr(lit(5), n - 4),
      compact.substr(lit(1), lit(4)))
    val residue = aggregate(
      sequence(lit(1), greatest(n, lit(1))),
      lit(0),
      (acc, i) => {
        val ch = rot.substr(i, lit(1))
        val isDigit = ch.between("0", "9")
        // the cast only evaluates on the digit branch (CASE WHEN is
        // lazy per row) — ANSI mode never sees a letter
        (when(isDigit, acc * 10 + ch.cast("int"))
          .otherwise(acc * 100 + ascii(ch) - 55)) % 97
      })
    n.between(15, 34) && (residue === 1)
  }

  /** The mod-97-VALID IBAN candidates of `text`, in match order, as
    * their original (grouping-preserving) substrings — what a
    * scrubber must replace. The checksum gate is what separates PII
    * removal from destroying every uppercase reference code in the
    * corpus (the [[ccValid]] discipline). */
  def ibanValidIn(text: Column): Column = {
    val structs = transform(ibanCandidates(text), x =>
      struct(x.as("orig"), regexp_replace(x, " ", "").as("cs")))
    transform(filter(structs, s => ibanValid(s.getField("cs"))),
      s => s.getField("orig"))
  }

  /** Replace every mod-97-valid IBAN with `<IBAN>` (exact-substring
    * replace per valid match; near-miss candidates survive). Compose
    * with [[scrubPii]] / [[scrubCc]] for the full PII pass. */
  def scrubIban(text: Column): Column =
    aggregate(ibanValidIn(text), coalesce(text, lit("")),
      (acc, x) => replace(acc, x, lit("<IBAN>")))

  /** Content fingerprint: md5 of case-folded, whitespace-collapsed
    * text. Canonical exact-dup key that survives formatting jitter. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** [[fingerprint]] with Unicode NFC canonicalization first
    * (graft.expr.NormalizeText): composed and decomposed spellings of
    * the same glyphs ("é" as U+00E9 vs e+U+0301) fingerprint
    * identically — the form web-scraped corpora actually need. */
  def canonicalFingerprint(text: Column): Column =
    fingerprint(graft.expr.NormalizeText.normalize(text, "NFC"))

  /** Rolling/positional fingerprint: xxhash64 of each `w`-token window
    * — winnowing-style shingle hashes for partial-overlap detection. */
  /** Fixed-size overlapping character chunks of `text` as
    * array<string> — the training-data chunking shape (split long
    * documents into model-context-sized windows, `overlap` chars of
    * continuity between neighbors). Chunk i starts at i*(size-overlap);
    * the last chunk may be short. Pure codegen'd built-ins
    * (transform/sequence/substring), narrow, explode at the caller. */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val step = size - overlap
    transform(
      sequence(lit(0), floor((length(text) - 1) / step).cast("int")),
      i => text.substr((i * step + 1).cast("int"), lit(size)))
  }

  def windowFingerprints(text: Column, w: Int = 8): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    val total = size(toks) - (w - 1)
    // shifted-slice zip_with fold (see dupNgramFrac): per-element
    // slice lambdas re-evaluate the tokenization O(len²)
    val len = greatest(total, lit(0))
    val grams = (2 to w).foldLeft(slice(toks, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), len),
        (a, b) => concat(a, lit(" "), b))
    }
    val fps = transform(grams, g => xxhash64(g))
    when(total <= 0, array().cast("array<bigint>")).otherwise(fps)
  }
}
