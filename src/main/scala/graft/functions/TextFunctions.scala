package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the large-scale training-data
  * pipeline: tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here composes codegen'd Spark built-ins (`functions._`) so
  * the hot path stays inside whole-stage codegen — no Scala UDFs. All
  * functions are deterministic and partition-independent, so they scale
  * linearly with input splits (no shuffle is introduced by any of them).
  */
object TextFunctions {

  /** Whitespace tokens with empties removed. Since round 15 this is the
    * native [[WhitespaceTokens]] kernel — one byte scan, zero-copy token
    * views — semantically identical to
    * `filter(split(text, "\\s+"), t => length(t) > 0)` (property-pinned
    * against that regex path in TextFunctionsSpec). */
  def tokens(text: Column): Column =
    WhitespaceTokens.whitespace_tokens(text)

  /** Whitespace token count (matches single-space `split` in ANSI SQL). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs + isolated symbols. A cheap
    * proxy for tokenizer cost estimation over 100 TB corpora. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles (windows of `n` consecutive tokens). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Gopher-style repetition signal: the fraction of a document's word
    * n-gram OCCURRENCES that repeat an earlier occurrence —
    * (total − distinct) / total, 0.0 for a document with no repeats.
    * A sub-n-token document has exactly one whole-document shingle
    * (the wordShingles convention), so its fraction is 0. Map-only:
    * one codegen'd token pass + the native ShingleHashes kernel. */
  def duplicateShingleFraction(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val total = when(size(toks) < n, 1).otherwise(size(toks) - n + 1)
    val distinct = size(graft.functions.ShingleHashes.shingle_hashes(toks, n))
    (total - distinct).cast("double") / total
  }

  /** Normalized text: lowercased, whitespace collapsed, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact document fingerprint: md5 over normalized text (ANSI-SQL
    * mirrorable; use [[RollingHash]] for the cheap 64-bit scale path). */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** 64-bit xxhash fingerprint of normalized text — one pass, codegen'd. */
  def fingerprintXx(text: Column): Column = xxhash64(normalized(text))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "on", "for", "with", "as", "at", "by", "it")

  /** Fraction of tokens that are common-English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.isInCollection(stopwords)))
        .cast("double") / size(toks))
  }

  /** Fraction of characters that are not alphanumeric/space (punctuation,
    * control, symbol soup — a classic low-quality signal). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[a-zA-Z0-9 ]", "")))
          .cast("double") / length(text))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * reasonable length, penalizes symbol soup. Deliberately simple and
    * exactly mirrorable in ANSI SQL for the oracle. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val sw = stopwordRatio(text)
    val punct = punctRatio(text)
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + sw * 0.4 + (lit(1.0) - punct) * 0.2))
  }

  /** Per-language stopword seeds for the n-gram/stopword language-ID
    * heuristic. Latin-script languages are scored by stopword hits;
    * CJK by codepoint-class ratio. */
  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "dans", "pour", "que"),
    "it" -> Seq("il", "la", "che", "di", "non", "una", "per", "sono", "con", "del"))

  /** Heuristic language ID. Returns a language code; 'und' when nothing
    * scores. Pure column algebra → whole-stage codegen, no shuffle. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val scores: Seq[(String, Column)] = langStopwords.map { case (lang, sws) =>
      lang -> size(filter(toks, t => t.isInCollection(sws)))
    }
    val best = greatest(scores.map(_._2): _*)
    // CJK wins outright if present in volume; ties break in seed order.
    val latinPick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, sc)) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(cjk * 2 > length(text), lit("zh")).otherwise(latinPick)
  }

  /** Fraction of tokens containing at least one alphabetic character
    * (Gopher's "80% of words must contain an alphabetic character"). */
  def alphaWordFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.rlike("[a-zA-Z]")))
        .cast("double") / size(toks))
  }

  /** Count of common-English stopword tokens (Gopher's "at least two of
    * a small stopword set must appear" evidence rule). */
  def stopwordHits(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isInCollection(stopwords)))

  /** PII-style redaction for training text: emails → [EMAIL], URLs →
    * [URL], long digit runs (ids, phone-ish) → [NUM]. Pure
    * `regexp_replace` chain — codegen'd, map-only, no shuffle at any
    * corpus size. Patterns stay in the Java∩RE2 common subset so the
    * same SQL runs on any engine (the DuckDB oracle replays it
    * verbatim); application order matters (emails before digit runs, or
    * an address's digits would be half-eaten). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("[EMAIL]"))
    val url = regexp_replace(email, lit("https?://[^\\s]+"), lit("[URL]"))
    regexp_replace(url, lit("[0-9]{6,}"), lit("[NUM]"))
  }
}
