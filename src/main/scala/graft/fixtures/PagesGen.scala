package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules._

/** Deterministic, fully-distributed generator for the graft input table
  * `pages(url, warc_ts, html, text, lang)` with planted violations
  * (FIXTURES.md §1). The reference analog is the `dummydata` management
  * command (`cerberus/management/commands/dummydata.py:27-188`) — seeded
  * synthetic data — except ours is generated as Catalyst expressions over
  * `spark.range(n)`, so it scales to any row count with zero driver memory
  * and is bit-identical at any parallelism (no RNG, only xxhash64 of id).
  *
  * Each id lands in at most ONE plant bucket (disjoint corruption), decided
  * by a hash in [0,1000); anchor rows (id % 100 == 0) are never corrupted so
  * duplicate-url plants can point at them. The same expressions that plant
  * corruption also build the `expected(key, rule_id)` oracle, so tests
  * assert set-equality, not counts.
  */
object PagesGen {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "zh", "ja", "ru", "pt")
  val Vocab: Seq[String] = Seq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "the", "a", "line", "sort", "window",
    "join", "shuffle", "plan", "codegen", "filter", "broadcast", "salt",
    "skew", "page", "crawl", "text", "lang")
  val NumHosts = 50
  /** Crawl window: [2024-01-01, 2024-02-01) UTC. */
  val WindowStartSec = 1704067200L
  val CrawlWindowMinSql = "timestamp'2024-01-01 00:00:00'"
  val CrawlWindowMaxSql = "timestamp'2024-02-01 00:00:00'"

  final case class PagesData(pages: DataFrame, expected: DataFrame,
      hosts: DataFrame, langs: DataFrame)

  private def h(id: Column, seed: Long, k: Int): Column =
    xxhash64(id, lit(seed), lit(k))

  /** Host id with deliberate skew: ~30% of rows on host 0, ~15% on host 1
    * (the "skewed hosts" the uniqueness pass must survive).
    */
  private def hostId(id: Column, seed: Long): Column = {
    val r = pmod(h(id, seed, 2), lit(100L))
    when(r < 30, lit(0L)).when(r < 45, lit(1L))
      .otherwise(pmod(r, lit(NumHosts.toLong)))
  }

  /** Canonical url for a (possibly remapped) id — used both for normal rows
    * and to alias a duplicate row to its anchor's url.
    */
  private def urlFor(id: Column, seed: Long): Column =
    concat(lit("https://host"), hostId(id, seed).cast("string"),
      lit(".example.com/page/"), id.cast("string"))

  // plant buckets in [0, 1000): rates per FIXTURES.md §1
  private val DupHi = 5L        // [0,5)    0.5% duplicate url      → R5
  private val BadUrlHi = 10L    // [5,10)   0.5% url fails regex    → R7
  private val BadLangHi = 15L   // [10,15)  0.5% lang outside set   → R2
  private val NullTextHi = 17L  // [15,17)  0.2% null text          → R6
  private val NullUrlHi = 18L   // [17,18)  0.1% null url           → R6
  private val BadTsHi = 20L     // [18,20)  0.2% warc_ts off-window → R1
  private val NullHtmlHi = 22L  // [20,22)  0.2% text but no html   → R3
  private val LongUrlHi = 23L   // [22,23)  0.1% url > 2083 chars   → R8
  private val BadHostHi = 26L   // [23,26)  0.3% host not in dim    → R9

  /** @param padTextTo when > 0, right-pad `text` to ~this many chars with a
    *   deterministic filler (codegen'd rpad — NOT per-word generation) so
    *   benchmarks can use realistic Common-Crawl row widths (tens of KB)
    *   without paying interpreted word-by-word generation. Planted
    *   violations are unaffected (text stays non-empty and unique-suffixed).
    */
  def generate(spark: SparkSession, nRows: Long, nDays: Int = 10,
      seed: Long = 42L, padTextTo: Int = 0): PagesData = {
    val id = col("id")
    val driftDay = nDays - 1

    val bucket = when(id % 100 === 0, lit(-1L)) // anchors stay clean
      .otherwise(pmod(h(id, seed, 0), lit(1000L)))

    val day = pmod(h(id, seed, 1), lit(nDays.toLong))
    val inWindowTs = timestamp_seconds(
      lit(WindowStartSec) + day * 86400L + pmod(h(id, seed, 3), lit(86400L)))
    val offWindowTs = timestamp_seconds(
      lit(1262304000L) + pmod(h(id, seed, 4), lit(86400L))) // 2010-01-01
    val warcTs = when(bucket >= BadTsHi - 2 && bucket < BadTsHi, offWindowTs)
      .otherwise(inWindowTs)

    val anchorId = (id - (id % 100)) // clean row guaranteed to exist
    val normalUrl = urlFor(id, seed)
    val urlCol =
      when(bucket < DupHi, urlFor(anchorId, seed))
        .when(bucket >= DupHi && bucket < BadUrlHi,
          concat(lit("not a url "), id.cast("string")))
        .when(bucket >= NullTextHi && bucket < NullUrlHi, lit(null).cast("string"))
        .when(bucket >= NullHtmlHi && bucket < LongUrlHi,
          concat(normalUrl, lit("/"), lpad(lit("x"), 2100, "x")))
        .when(bucket >= LongUrlHi && bucket < BadHostHi,
          concat(lit("https://badhost"), pmod(h(id, seed, 5), lit(7L)).cast("string"),
            lit(".invalid/page/"), id.cast("string")))
        .otherwise(normalUrl)

    // word-salad text; drift partition gets a shifted length distribution
    val vocabArr = array(Vocab.map(lit): _*)
    val lBase = (pmod(h(id, seed, 6), lit(40L)) + 8L).cast("int")
    val lCol = when(day === driftDay, lBase + 60).otherwise(lBase)
    val textWords = transform(sequence(lit(0), lCol), i =>
      element_at(vocabArr,
        (pmod(xxhash64(id, lit(seed), lit(7), i), lit(Vocab.size.toLong)) + 1).cast("int")))
    val baseText = array_join(textWords, " ")
    val sizedText =
      if (padTextTo > 0)
        // unique prefix (keeps per-row distinctness) + cheap filler;
        // SQL rpad (column-length overload) — codegen'd
        call_function("rpad", baseText,
          lit(padTextTo) + pmod(h(id, seed, 12), lit(200L)).cast("int"),
          lit(" the quick crawl page filler text segment"))
      else baseText
    val textCol = when(bucket >= NullTextHi - 2 && bucket < NullTextHi,
        lit(null).cast("string"))
      .otherwise(sizedText)

    // drift partition also inflates lang null-rate (null lang is allowed by
    // schema — surfaces as a warn-severity rule + null-rate drift)
    val langNullExtra = day === driftDay &&
      pmod(h(id, seed, 8), lit(100L)) < 20 &&
      !(bucket >= BadUrlHi && bucket < BadLangHi) // don't shadow lang plants
    val langCol =
      when(bucket >= BadUrlHi && bucket < BadLangHi - 1, lit("xx"))
        .when(bucket === BadLangHi - 1, lit(null).cast("string"))
        .when(langNullExtra, lit(null).cast("string"))
        .otherwise(element_at(array(Langs.map(lit): _*),
          (pmod(h(id, seed, 9), lit(Langs.size.toLong)) + 1).cast("int")))

    val htmlStr = concat(lit("<html><body>"), textCol, lit("</body></html>"))
    val htmlCol = when(bucket >= BadTsHi && bucket < NullHtmlHi,
        lit(null).cast("binary"))
      .otherwise(htmlStr.cast("binary"))

    val base = spark.range(nRows)
    val pages = base.select(
      urlCol.as("url"), warcTs.as("warc_ts"), htmlCol.as("html"),
      textCol.as("text"), langCol.as("lang"))

    // expected oracle from the same plant conditions
    val keyOf = coalesce(urlCol, lit("(null)"))
    def exp(cond: Column, rid: String): DataFrame =
      base.where(cond).select(keyOf.as("key"), lit(rid).as("rule_id"))
    val expected = Seq(
      // planted dup rows carry their anchor's url, so these keys are exactly
      // the distinct duplicated url values the engine must flag
      exp(bucket >= 0 && bucket < DupHi, PagesRules.UniqueUrl),
      exp(bucket >= DupHi && bucket < BadUrlHi, PagesRules.UrlRegex),
      exp(bucket >= BadUrlHi && bucket < BadLangHi - 1, PagesRules.LangAllowed),
      exp((bucket === BadLangHi - 1) || langNullExtra, PagesRules.LangPresent),
      exp(bucket >= NullTextHi - 2 && bucket < NullTextHi, PagesRules.TextRequired),
      exp(bucket >= NullTextHi && bucket < NullUrlHi, PagesRules.UrlRequired),
      exp(bucket >= BadTsHi - 2 && bucket < BadTsHi, PagesRules.TsWindow),
      exp(bucket >= BadTsHi && bucket < NullHtmlHi, PagesRules.HtmlDependency),
      exp(bucket >= NullHtmlHi && bucket < LongUrlHi, PagesRules.UrlMaxLen),
      exp(bucket >= LongUrlHi && bucket < BadHostHi, PagesRules.HostReferential)
    ).reduce(_.unionByName(_)).distinct()

    val hosts = spark.range(NumHosts)
      .select(concat(lit("host"), col("id").cast("string"),
        lit(".example.com")).as("host"))
    val langs = Langs.toDF(spark)

    PagesData(pages, expected, hosts, langs)
  }

  /** A "second crawl snapshot": identical to the input except ~0.4% of
    * pages (chosen deterministically by url hash) get mutated text bytes —
    * the planted corruption for the byte-identity invariant (FIXTURES.md:
    * "mutated text bytes for known urls between two snapshots").
    * Returns (mutated pages, expected violating urls).
    */
  def mutateSnapshot(pages: DataFrame, seed: Long = 42L): (DataFrame, DataFrame) = {
    val hit = col("url").isNotNull && col("text").isNotNull &&
      pmod(xxhash64(col("url"), lit(seed), lit(99)), lit(1000L)) < 4
    val mutated = pages.withColumn("text",
      when(hit, concat(col("text"), lit(" [mutated]"))).otherwise(col("text")))
    val expected = pages.where(hit).select(col("url").as("key")).distinct()
    (mutated, expected)
  }

  private implicit class SeqToDf(vals: Seq[String]) {
    def toDF(spark: SparkSession): DataFrame =
      spark.createDataFrame(vals.map(Tuple1(_))).toDF("code")
  }
}

/** The standard rule catalog for the `pages` table — the graft
  * instantiation of SURVEY.md §2.10 (R1..R9 species over web pages).
  */
object PagesRules {
  val UrlRequired = "url_required"       // R6
  val TextRequired = "text_required"     // R6
  val TsRequired = "warc_ts_required"    // R6
  val LangPresent = "lang_present"       // R6 (warn — lang is nullable)
  val UrlRegex = "url_regex"             // R7
  val LangAllowed = "lang_allowed"       // R2
  val TsWindow = "warc_ts_window"        // R1
  val HtmlDependency = "html_when_text"  // R3
  val UrlMaxLen = "url_max_length"       // R8
  val UniqueUrl = "unique_url"           // R5
  val HostReferential = "host_in_dim"    // R9

  val UrlPattern = "^https?://[^ ]+$"

  /** Stats-pass expressions for pages: derived lengths instead of full
    * text/html bodies (min/max/HLL over megabyte strings is wasted IO+CPU;
    * length distributions are what the drift checks consume anyway).
    */
  val statsExprs: Seq[(String, String)] = Seq(
    "url" -> "url",
    "warc_ts" -> "warc_ts",
    "lang" -> "lang",
    "text_len" -> "length(text)",
    "html_len" -> "octet_length(html)")

  def catalog: Seq[ValidationRule] = Seq(
    Required(UrlRequired, "url"),
    Required(TextRequired, "text"),
    Required(TsRequired, "warc_ts"),
    Required(LangPresent, "lang", severity = "warn"),
    Regex(UrlRegex, "url", UrlPattern),
    Allowed(LangAllowed, "lang", PagesGen.Langs),
    MinMax(TsWindow, "warc_ts",
      Some(PagesGen.CrawlWindowMinSql), Some(PagesGen.CrawlWindowMaxSql)),
    Dependency(HtmlDependency, "html",
      "text IS NOT NULL AND length(text) > 0", "html IS NOT NULL"),
    MaxLength(UrlMaxLen, "url", 2083),
    Unique(UniqueUrl, Seq("url")),
    // try_parse_url: malformed urls yield NULL (not an ANSI error) and are
    // left to the regex rule — a referential check must not throw on dirty
    // web data
    Referential(HostReferential, "url", "hosts", "host",
      keyExprSql = Some("try_parse_url(url, 'HOST')"))
  )
}
