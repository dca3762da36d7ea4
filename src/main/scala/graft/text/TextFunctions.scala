package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a web-scale training-data pipeline:
  * language-ID, quality scoring, token counting, fingerprinting. All pure
  * `Column` expressions (codegen'd, no UDFs) so they run inside the same
  * single-pass scan as the validation rules.
  */
object TextFunctions {

  /** Whitespace tokens; empty/null-safe (empty string → empty array). */
  def tokens(c: Column): Column = {
    val trimmed = trim(coalesce(c, lit("")))
    when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * single punctuation marks each count as one token (the common
    * pre-tokenizer regex shape).
    */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(coalesce(c, lit("")),
      lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"))

  // --- language id ------------------------------------------------------

  /** Stopword tables for the n-gram/stopword heuristic. Deliberately tiny:
    * the goal is a deterministic, cheap, fully-columnar classifier.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por", "con", "para"))

  /** Count of word-boundary stopword hits for one language. */
  def stopwordHits(c: Column, lang: String): Column = {
    val pat = Stopwords(lang).mkString("(?i)\\b(", "|", ")\\b")
    regexp_count(coalesce(c, lit("")), lit(pat))
  }

  /** Heuristic language id: argmax of per-language stopword hits,
    * "und" (undetermined) when nothing matched. Ties break lexicographically
    * descending on (score, lang) for determinism.
    */
  def langId(c: Column): Column = {
    val scored = Stopwords.keys.toSeq.sorted.map { l =>
      struct(stopwordHits(c, l).as("score"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  // --- quality ----------------------------------------------------------

  def stopwordRatio(c: Column): Column = {
    val total = tokenCount(c)
    val hits = Stopwords.keys.toSeq.sorted
      .map(l => stopwordHits(c, l)).reduce(_ + _)
    when(total === 0, 0.0).otherwise(hits.cast("double") / total)
  }

  def punctRatio(c: Column): Column = {
    val n = length(coalesce(c, lit("")))
    when(n === 0, 0.0).otherwise(
      regexp_count(c, lit("[^\\p{L}\\p{N}\\s]")).cast("double") / n)
  }

  def digitRatio(c: Column): Column = {
    val n = length(coalesce(c, lit("")))
    when(n === 0, 0.0).otherwise(
      regexp_count(c, lit("[\\p{N}]")).cast("double") / n)
  }

  def meanWordLength(c: Column): Column = {
    val toks = tokens(c)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(toks))
  }

  /** Composite quality score in [0,1] — length, stopword, punctuation and
    * digit signals (the usual pretraining-filter features). Deterministic,
    * documented weights; callers threshold it (e.g. keep > 0.3).
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 100.0, lit(1.0))
    val swScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 5.0)
    val digitPenalty = greatest(lit(0.0), lit(1.0) - digitRatio(c) * 3.0)
    (lenScore * 0.3 + swScore * 0.3 + punctPenalty * 0.2 + digitPenalty * 0.2)
  }

  // --- fingerprinting ---------------------------------------------------

  /** Canonical-form document fingerprint: xxhash64 of lowercased,
    * whitespace-collapsed text. Byte-stable: the same extracted text always
    * maps to the same 64-bit id (the cheap exact-dup key).
    */
  def fingerprint(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(coalesce(c, lit("")))), "\\s+", " "))

  /** Rolling-hash fingerprint over word 3-grams: order-sensitive but
    * locally-stable (a small edit changes few shingle hashes). Returns the
    * min shingle hash — the 1-hash MinHash, useful as a cheap cluster key.
    */
  def rollingMinShingleHash(c: Column, k: Int = 3): Column = {
    val sh = Shingles.wordShingles(c, k)
    when(size(sh) === 0, xxhash64(coalesce(c, lit(""))))
      .otherwise(array_min(transform(sh, s => xxhash64(s))))
  }
}

/** Word-level k-shingles shared by the dedup family. */
object Shingles {
  def wordShingles(c: Column, k: Int): Column = {
    val toks = TextFunctions.tokens(c)
    when(size(toks) < k, when(size(toks) > 0,
        array(array_join(toks, " "))).otherwise(array().cast("array<string>")))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " "))))
  }
}
