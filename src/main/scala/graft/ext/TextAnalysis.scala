package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (extension surface):
  * language-ID, quality scoring, token counting, document fingerprinting.
  * Everything is a Catalyst expression composition — per-row work inside
  * whole-stage codegen, embarrassingly parallel at any scale.
  */
object TextAnalysis {

  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish subword count estimate: word-piece regex splits on
    * letter/digit/punctuation boundaries (a cheap deterministic proxy for a
    * real tokenizer, which would be a vocab lookup).
    */
  def subwordCount(c: Column): Column =
    size(split(trim(c), "(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|\\s+|(?=[^\\p{L}\\p{N}\\s])"))

  /** Stopword-ratio language scores. `stopwords` maps language → word list;
    * score = fraction of tokens that are stopwords of that language.
    */
  def langScore(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    round(size(filter(toks, t => t.isInCollection(stopwords))).cast("double") /
      greatest(size(toks), lit(1)), 4)
  }

  val DefaultStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von")
  )

  /** n-gram-heuristic language ID: argmax of per-language stopword scores
    * with deterministic tiebreak (language order as declared).
    */
  def langId(c: Column, stopwords: Map[String, Seq[String]] = DefaultStopwords): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(langScore(c, words).as("s"), lit(lang).as("l"))
    }
    // greatest struct = (max score, then max lang name); invert lang for
    // deterministic *first*-declared tiebreak instead
    val best = scored.reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    best.getField("l")
  }

  /** PII redaction (standard pre-training scrub pass): replace emails,
    * IPv4 addresses, phone-like digit runs, and URLs with typed tokens.
    * Patterns restricted to the regex subset Java and RE2 share (no
    * lookarounds/backrefs), so an engine with RE2 `regexp_replace` (the
    * DuckDB oracle) reproduces the output byte-for-byte. Order matters:
    * URLs before IPv4 (an URL may embed a host IP), emails before phones
    * (digits inside a local-part must not be phone-masked).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\+?[0-9][0-9()\\-. ]{7,}[0-9]" -> "<PHONE>"
  )

  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Quality scoring: length / punctuation / stopword ratios combined into
    * [0,1] (the usual pre-train heuristics, cf. C4/Gopher rules — public
    * knowledge).
    */
  def qualityFeatures(c: Column): Column = {
    val n = greatest(length(c), lit(1)).cast("double")
    val toks = tokens(c)
    val nToks = greatest(size(toks), lit(1)).cast("double")
    struct(
      length(c).as("n_chars"),
      size(toks).as("n_tokens"),
      round(length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / n, 4)
        .as("punct_ratio"),
      round(length(regexp_replace(c, "[^0-9]", "")).cast("double") / n, 4)
        .as("digit_ratio"),
      round(aggregate(org.apache.spark.sql.functions.transform(toks, t => length(t).cast("double")),
        lit(0.0), (a, x) => a + x) / nToks, 4).as("mean_token_len"),
      round(size(array_distinct(toks)).cast("double") / nToks, 4).as("distinct_token_ratio")
    )
  }

  /** Scalar quality score in [0,1]: penalize extreme lengths, high punct /
    * digit ratios, low vocabulary diversity. Computed from RAW ratios (no
    * intermediate rounding): pre-rounded ratios land the final sum exactly
    * on decimal rounding boundaries, where engines disagree on the last
    * digit; raw IEEE arithmetic in a fixed order is bit-reproducible in any
    * engine, so the single final round is stable.
    */
  def qualityScore(c: Column): Column = {
    val n = greatest(length(c), lit(1)).cast("double")
    val toks = tokens(c)
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val punct = length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / n
    val digit = length(regexp_replace(c, "[^0-9]", "")).cast("double") / n
    val dr = size(array_distinct(toks)).cast("double") / nToks
    val lenOk = when(size(toks).between(5, 100000), 1.0).otherwise(0.3)
    val punctOk = lit(1.0) - least(punct * 4, lit(1.0))
    val digitOk = lit(1.0) - least(digit * 4, lit(1.0))
    val divOk = least(dr * 2, lit(1.0))
    round(lenOk * 0.25 + punctOk * 0.25 + digitOk * 0.25 + divOk * 0.25, 4)
  }

  /** Document fingerprint: md5 of normalized text (whole-doc), plus a
    * winnowing-style rolling fingerprint — the k smallest shingle hashes,
    * joined — which is stable under small edits (public winnowing/MOSS idea).
    */
  def fingerprint(c: Column): Column = md5(Dedup.normalize(c))

  def winnowFingerprint(c: Column, shingleLen: Int = 3, k: Int = 4): Column =
    array_join(slice(sort_array(
      org.apache.spark.sql.functions.transform(
        Dedup.shingles(c, shingleLen), s => md5(s))), 1, k), "|")
}
