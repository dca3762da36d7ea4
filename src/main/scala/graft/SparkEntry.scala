package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine._
import graft.fixtures.{PagesGen, PagesRules}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` run against the driver's TPC-H-ish parquet dir and are
  * hash-compared against `oracleSql` run in DuckDB on the same files, so:
  *  - every aggregate / computed column is aliased identically on both sides;
  *  - money-style sums go through DecimalType (exact, order-independent)
  *    rather than double (order-dependent across engines);
  *  - every ORDER-dependent result carries a unique tie-break key.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Flagship: the full validation pass (row rules + referential +
    * uniqueness + stats) over a pages-shaped table derived from the
    * sf0.001 documents, returning per-partition verdicts.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val pages = documentsAsPages(t(spark, dir, "documents"))
    val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
      .where(col("host").isNotNull).distinct()
    val cfg = EngineConfig(
      keyExpr = "url",
      partExpr = "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts")
    ValidationEngine.run(pages, PagesRules.catalog,
      dims = Map("hosts" -> hosts), cfg = cfg).verdicts
  }

  /** Deterministic pages view over the documents table — the graft input
    * shape (url, warc_ts, html, text, lang) built from real testdata.
    */
  def documentsAsPages(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://"), col("source"), lit(".example.com/doc/"),
        col("doc_id").cast("string")).as("url"),
      timestamp_seconds(lit(1704067200L) + col("doc_id") * 797L).as("warc_ts"),
      concat(lit("<html><body>"), col("text"), lit("</body></html>"))
        .cast("binary").as("html"),
      col("text").as("text"),
      col("lang").as("lang"))

  // ---------------------------------------------------------------------
  // Operator queries (SURVEY.md §2 inventory; oracle-checked in DuckDB)
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2/A3 group-by aggregation (invoice-per-week shape, reports.py:19-35)
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("cnt"))
    }),

    // A4 filtered aggregates (CustomerManager annotations, customer.py:28-58)
    "q_filtered_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_totalprice") > 1000.0, 1L).otherwise(0L)).as("n_big"),
          sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice")))
            .otherwise(dec(lit(0)))).cast("double").as("urgent_total"),
          count(lit(1)).as("cnt"))
    }),

    // J1/J2 FK equi-joins with broadcast dims + grouped revenue
    "q_join_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // J4 semi-join (EXISTS; filters.py:85)
    "q_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi").select("c_custkey", "c_name")
    }),

    // J5 anti-join — referential-integrity orphan check (R9 shape)
    "q_anti_join_orphans" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").select(col("c_custkey").as("o_custkey"))
      o.join(c, Seq("o_custkey"), "left_anti")
        .select("o_orderkey", "o_custkey")
    }),

    // W3 first-row pick per group (booking.py:153-158) — deterministic
    // tie-break on the unique key
    "q_window_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // A1 global min/max (booking.py:305-314)
    "q_minmax_global" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        count(lit(1)).as("cnt"))
    }),

    // A11 bucketed time aggregation (year/week report, reports.py:25-32;
    // month used for cross-engine calendar parity)
    "q_time_buckets" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // A9/R5 uniqueness violations: composite key with count > 1
    "q_dup_uniqueness" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
    }),

    // R2 allowed-set rule: event_type outside the closed enum
    "q_enum_violations" -> ((s, dir) => {
      t(s, dir, "events")
        .where(!col("event_type").isin("click", "view", "purchase", "signup"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // R14 generated-column consistency: stored n_chars vs recompute
    "q_generated_consistency" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
            .as("n_bad"),
          count(lit(1)).as("n"))
    }),

    // column-stats pass shape: per-group count/min/max/distinct/nulls
    "q_stats_profile" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          countDistinct(col("source")).as("n_sources"))
    }),

    // J7/R10 self range-join: same-customer orders within 1 day
    "q_self_range_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("a_key"), col("o_orderdate").as("a_date"))
      val b = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("b_key"), col("o_orderdate").as("b_date"))
      a.join(b, Seq("custkey"))
        .where(col("a_key") < col("b_key") &&
          abs(unix_timestamp(col("a_date")) - unix_timestamp(col("b_date"))) <= 86400L)
        .groupBy(col("custkey"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // W6/R12 state-sequence reconstruction: transition counts via lag()
    "q_fsm_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // F17 JSON field access (user_settings.py:10)
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
    }),

    // W5 top-k with deterministic tie-break
    "q_topk_global" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // A8 distinct counts per group
    "q_distinct_custs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),

    // token counting (whitespace tokenizer) — text-pipeline primitive
    "q_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("tokens"),
          count(lit(1)).as("docs"))
    }),

    // F6-shape regex classifier chain (first match wins) → class counts
    "q_regex_classify" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("cls",
          when(col("text").rlike("spark"), "sparkish")
            .when(col("text").rlike("window"), "windowed")
            .when(col("text").rlike("hash"), "hashy")
            .otherwise("other"))
        .groupBy(col("cls")).agg(count(lit(1)).as("n"))
    }),

    // exact dedup key: duplicate 30-char text prefixes (R5 over documents)
    "q_dedup_exact_prefix" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(substring(col("text"), 1, 30).as("prefix"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
    }),

    // embedding stats: raw min/max are arithmetic-free → bit-identical
    "q_embedding_stats" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          min(element_at(col("embedding"), 1)).as("min_e1"),
          max(element_at(col("embedding"), 1)).as("max_e1"),
          min(size(col("embedding"))).as("min_dim"),
          max(size(col("embedding"))).as("max_dim"))
    }),

    // W8: calendar bucketing — batch window() as grouping expression
    // (views/booking.py:141-164 15-minute slots)
    "q_window_bucket_15m" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "15 minutes").getField("start").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total"))
    }),

    // W9: 10-minute floor rounding (booking.py:66-70)
    "q_round_10min" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(graft.functions.StringFunctions
          .roundDateTime10Min(col("ts")).as("slot"))
        .agg(count(lit(1)).as("n"))
    }),

    // P6: case-insensitive substring filter (filters.py:46-47)
    "q_icontains" -> ((s, dir) => {
      t(s, dir, "customer")
        .where(graft.functions.StringFunctions.icontains(col("c_name"), "er"))
        .select("c_custkey", "c_name")
    }),

    // J8: dedup after join fanout (filters.py:128-130 .distinct())
    "q_join_dedup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(p.where(col("p_type") === "PROMO")),
          li("l_partkey") === p("p_partkey"))
        .select(col("o_custkey")).distinct()
    }),

    // A5: post-aggregate expression (total = adjustment + subtotal shape,
    // invoice.py:44)
    "q_post_agg_expr" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(dec(col("o_totalprice"))).as("subtotal"),
          count(lit(1)).as("n_orders"))
        .withColumn("total_with_fee",
          (col("subtotal") + dec(lit(10))).cast("double"))
        .select(col("o_custkey"), col("subtotal").cast("double").as("subtotal"),
          col("n_orders"), col("total_with_fee"))
    }),

    // F10: zero-padded format (invoice.py:127-128)
    "q_format_string" -> ((s, dir) => {
      t(s, dir, "orders").orderBy(col("o_orderkey")).limit(20)
        .select(col("o_orderkey"),
          graft.functions.StringFunctions.invoiceName(col("o_orderkey"))
            .as("invoice_name"))
    }),

    // F2: ISO-8601 year-of-week/week buckets (the invoice-per-week report,
    // reports.py:25-32 — ExtractYear/ExtractWeek; ISO parity verified
    // against DuckDB on year-boundary dates)
    "q_iso_week" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(expr("extract(YEAROFWEEK FROM o_orderdate)").cast("int").as("iso_y"),
          weekofyear(col("o_orderdate")).cast("int").as("iso_w"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("total"))
    }),

    // ------------- rows-only entries (no SQL-expressible oracle) --------

    // full validation pass over the pages-shaped table (the flagship job)
    "q_pages_validate" -> ((s, dir) => {
      val pages = documentsAsPages(t(s, dir, "documents"))
      val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
        .where(col("host").isNotNull).distinct()
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts")
      ValidationEngine.run(pages, PagesRules.catalog,
        dims = Map("hosts" -> hosts), cfg = cfg)
        .verdicts.orderBy("part", "rule_id")
    }),

    // engine versus planted corruption (self-contained generator input)
    "q_pages_validate_planted" -> ((s, dir) => {
      val data = PagesGen.generate(s, nRows = 50000L, nDays = 5)
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts")
      ValidationEngine.run(data.pages, PagesRules.catalog,
        dims = Map("hosts" -> data.hosts), cfg = cfg)
        .violations.groupBy(col("rule_id")).agg(count(lit(1)).as("n"))
        .orderBy("rule_id")
    }),

    // CRM replay: the reference error-fixture corpus as violation rows
    "q_crm_replay" -> ((s, dir) => {
      val t = graft.fixtures.CrmFixtures.build(s)
      import graft.crm.{CrmCatalog, CrmChecks}
      def run(df: DataFrame, rules: Seq[graft.rules.ValidationRule], e: String) =
        ValidationEngine.run(df, rules,
          Map("customers" -> t.customers, "services" -> t.services,
            "invoices" -> t.invoices),
          EngineConfig(s"concat('$e:', cast(id as string))", s"'$e'",
            uniquenessSalts = 4)).violations
      Seq(
        run(t.bookings, CrmCatalog.bookingRules, "booking"),
        run(t.bookingSlots, CrmCatalog.slotRules, "booking_slot"),
        run(t.customers, CrmCatalog.customerRules, "customer"),
        run(t.invoices, CrmCatalog.invoiceRules, "invoice"),
        run(t.charges, CrmCatalog.chargeRules, "charge"),
        run(t.payments, CrmCatalog.paymentRules, "payment"),
        run(t.pets, CrmCatalog.petRules, "pet"),
        CrmChecks.overlappingSlots(t.bookingSlots, t.bookings),
        CrmChecks.capacity(t.bookings, t.bookingPets, t.services),
        CrmChecks.fsmLegality(t.stateLog, "booking"),
        CrmChecks.accountingInvariants(t.invoices, t.charges, t.payments),
        CrmChecks.petOwnership(t.bookings, t.bookingPets, t.pets)
      ).reduce(_.unionByName(_)).orderBy("key", "rule_id")
    }),

    // MinHash-LSH near-dup pairs over the documents corpus
    "q_minhash_lsh" -> ((s, dir) => {
      // 3-row bands: collision prob j^3 per band kills the quadratic
      // candidate mass from mid-similarity template pages while keeping
      // ~60% recall at j=0.35; oversized buckets are stop-banded
      graft.dedup.Dedup.minHashNearDups(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.35, numHashes = 64, bands = 21,
        maxBucketSize = 200)
        .orderBy("a_id", "b_id")
    }),

    // SimHash near-dup pairs
    "q_simhash_neardup" -> ((s, dir) => {
      graft.dedup.Dedup.simHashNearDups(t(s, dir, "documents"),
        "doc_id", "text", maxHamming = 7, maxBucketSize = 200)
        .orderBy("a_id", "b_id")
    }),

    // brute-force cosine top-k (ANN baseline) for 5 query vectors
    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      graft.sim.Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10)
        .orderBy("q_id", "rank")
    }),

    // LSH-bucketed ANN (scale path)
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      // bucket granularity sized to the corpus: 2^6 buckets over ~10^3
      // vectors keeps per-bucket work tiny while recall stays high
      // these embeddings are near-random (top cosine ~0.37), the hard case
      // for SRP-LSH; 12 tables of 2^5 buckets probe ~40% of the corpus for
      // ~2/3 recall — on clustered real embeddings recall >0.9 (see
      // SimilaritySpec)
      graft.sim.Similarity.lshTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10,
        planes = 5, tables = 12)
        .orderBy("q_id", "rank")
    }),

    // text-quality profile: langId, quality score, token counts
    "q_text_quality" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      t(s, dir, "documents").select(
        col("doc_id"),
        TF.langId(col("text")).as("lang_id"),
        round(TF.qualityScore(col("text")), 4).as("quality"),
        TF.tokenCount(col("text")).as("tokens"),
        TF.bpeishTokenCount(col("text")).as("bpe_tokens"),
        TF.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // multimodal plumbing: stubbed decode over binary media columns
    "q_multimodal_features" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.mediaFromPages(
        documentsAsPages(t(s, dir, "documents")))
      graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
        .select(col("id"), col("kind"), col("ok"), col("featureDim"))
        .orderBy("id")
    }),

    // drift: per-source PSI/KS of n_chars distributions vs the first source
    "q_drift_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cfg = EngineConfig(keyExpr = "doc_id", partExpr = "source")
      val hist = StatsPass.histogram(docs, cfg, "n_chars", binWidth = 25.0)
      val reports = Drift.againstBaseline(hist, "src0", "n_chars")
      s.createDataFrame(reports)
        .select(col("part"), col("metric"),
          round(col("value"), 6).as("value"), col("pass"))
        .orderBy("part", "metric")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         count(*) AS cnt
         FROM lineitem GROUP BY 1, 2""",
    "q_filtered_agg" ->
      """SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_totalprice > 1000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             THEN CAST(o_totalprice AS DECIMAL(18,2))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent_total,
         count(*) AS cnt
         FROM orders GROUP BY 1""",
    "q_join_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1""",
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_anti_join_orphans" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""",
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn = 1""",
    "q_minmax_global" ->
      """SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
         count(*) AS cnt FROM lineitem""",
    "q_time_buckets" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         count(*) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2""",
    "q_dup_uniqueness" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n
         FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1""",
    "q_enum_violations" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type NOT IN ('click','view','purchase','signup')
         GROUP BY 1""",
    "q_generated_consistency" ->
      """SELECT source,
         CAST(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         count(*) AS n
         FROM documents GROUP BY 1""",
    "q_stats_profile" ->
      """SELECT lang, count(*) AS cnt,
         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         count(DISTINCT source) AS n_sources
         FROM documents GROUP BY 1""",
    "q_self_range_join" ->
      """SELECT a.o_custkey AS custkey, count(*) AS n_pairs
         FROM orders a JOIN orders b
           ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
          AND abs(epoch(a.o_orderdate) - epoch(b.o_orderdate)) <= 86400
         GROUP BY 1""",
    "q_fsm_transitions" ->
      """SELECT prev, event_type, count(*) AS n FROM (
           SELECT event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) AS prev
           FROM events)
         WHERE prev IS NOT NULL GROUP BY 1, 2""",
    "q_json_extract" ->
      """SELECT event_type,
         CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, count(*) AS n
         FROM events GROUP BY 1""",
    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_distinct_custs" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs,
         count(*) AS n_orders FROM orders GROUP BY 1""",
    "q_token_count" ->
      """SELECT lang,
         CAST(sum(length(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens,
         count(*) AS docs
         FROM documents GROUP BY 1""",
    "q_regex_classify" ->
      """SELECT CASE WHEN regexp_matches(text, 'spark') THEN 'sparkish'
                     WHEN regexp_matches(text, 'window') THEN 'windowed'
                     WHEN regexp_matches(text, 'hash') THEN 'hashy'
                     ELSE 'other' END AS cls, count(*) AS n
         FROM documents GROUP BY 1""",
    "q_dedup_exact_prefix" ->
      """SELECT substring(text, 1, 30) AS prefix, count(*) AS n
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q_embedding_stats" ->
      """SELECT label, count(*) AS n,
         min(embedding[1]) AS min_e1, max(embedding[1]) AS max_e1,
         CAST(min(len(embedding)) AS INT) AS min_dim,
         CAST(max(len(embedding)) AS INT) AS max_dim
         FROM embeddings GROUP BY 1""",
    "q_window_bucket_15m" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1""",
    "q_round_10min" ->
      """SELECT CAST(to_timestamp(floor(epoch(ts)/600)*600) AS TIMESTAMP) AS slot,
         count(*) AS n FROM events GROUP BY 1""",
    "q_icontains" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE lower(c_name) LIKE '%er%'""",
    "q_join_dedup" ->
      """SELECT DISTINCT o_custkey FROM orders
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN part ON l_partkey = p_partkey
         WHERE p_type = 'PROMO'""",
    "q_post_agg_expr" ->
      """SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS subtotal,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              + CAST(10 AS DECIMAL(18,2)) AS DOUBLE) AS total_with_fee
         FROM orders GROUP BY 1""",
    "q_format_string" ->
      """SELECT o_orderkey, printf('INV-%03d', o_orderkey) AS invoice_name
         FROM orders ORDER BY o_orderkey LIMIT 20""",
    "q_iso_week" ->
      """SELECT CAST(isoyear(o_orderdate) AS INT) AS iso_y,
         CAST(week(o_orderdate) AS INT) AS iso_w,
         count(*) AS cnt,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2"""
  )
}
