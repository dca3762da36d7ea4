package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rules._

/** Gopher/C4-style corpus filtering expressed as the SAME `ValidationRule`
  * catalog the page validator runs — because filtering training text IS
  * validation: per-(source, rule) verdicts, violation rows keyed by doc,
  * severity levels, and (via [[graft.engine.Audit]]) resumable incremental
  * runs over a growing crawl, all for free from the engine.
  *
  * The thresholds follow the published filters in spirit (Gopher's
  * repetition cuts, C4's length/language gates — Rae et al. 2021 §A1.1,
  * Raffel et al. 2020 §2.2) with values picked for the synthetic corpus;
  * a production pipeline tunes them per source. Every signal used here is
  * independently SQL-re-derivable, which is what makes the whole verdict
  * table DuckDB-oracle-able (`q_docs_quality_filter`).
  */
object QualityRules {

  /** The documents table augmented with the filter signals the catalog
    * references. `quality` is rounded to 4 places ON PURPOSE: the verdict
    * threshold then compares a value both engines compute bit-identically.
    */
  def withSignals(docs: DataFrame): DataFrame = {
    import graft.text.{TextFunctions => TF}
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
      TF.tokenCount(col("text")).cast("long").as("n_tokens"),
      TF.duplicateLineFraction(col("text")).as("dup_line_frac"),
      TF.duplicateNgramFraction(col("text"), 3).as("dup_3gram_frac"),
      round(TF.qualityScore(col("text")), 4).as("quality"),
      TF.symbolToWordRatio(col("text")).as("symbol_word_ratio"),
      TF.bulletLineFraction(col("text")).as("bullet_line_frac"),
      TF.ellipsisLineFraction(col("text")).as("ellipsis_line_frac"),
      TF.alphaWordFraction(col("text")).as("alpha_word_frac"))
  }

  /** The filter catalog. Severity "error" = drop the doc; "warn" = keep
    * but flag (the pass/fail verdict counts both; a production filter
    * would drop on error-severity violations only).
    */
  def catalog(allowedLangs: Seq[String] = Seq("en", "de", "fr", "es"),
      minTokens: Int = 5, maxDupFrac: Double = 0.3,
      minQuality: Double = 0.25): Seq[ValidationRule] = Seq(
    Required("text_required", "text"),
    ExprRule("min_tokens", "n_tokens", s"n_tokens >= $minTokens",
      message = s"document shorter than $minTokens tokens"),
    ExprRule("max_dup_line_frac", "dup_line_frac",
      s"dup_line_frac <= $maxDupFrac",
      message = "too many repeated lines (boilerplate)"),
    ExprRule("max_dup_3gram_frac", "dup_3gram_frac",
      s"dup_3gram_frac <= $maxDupFrac",
      message = "too many repeated 3-grams (keyword stuffing / loops)"),
    Allowed("lang_allowed", "lang", allowedLangs),
    ExprRule("min_quality", "quality", s"quality >= $minQuality",
      severity = "warn",
      message = s"quality score below $minQuality"),
    // Gopher auxiliary gates (Rae et al. 2021 §A1.1 thresholds), WARN
    // severity: flag-and-keep here, promote to error per deployment
    ExprRule("max_symbol_ratio", "symbol_word_ratio",
      "symbol_word_ratio <= 0.1", severity = "warn",
      message = "too many #/ellipsis symbols per word"),
    ExprRule("max_bullet_lines", "bullet_line_frac",
      "bullet_line_frac <= 0.9", severity = "warn",
      message = "mostly bullet lines (nav/listing boilerplate)"),
    ExprRule("max_ellipsis_lines", "ellipsis_line_frac",
      "ellipsis_line_frac <= 0.3", severity = "warn",
      message = "too many lines end in an ellipsis (truncated previews)"),
    ExprRule("min_alpha_words", "alpha_word_frac",
      "alpha_word_frac >= 0.8", severity = "warn",
      message = "too few words contain a letter"))
}
