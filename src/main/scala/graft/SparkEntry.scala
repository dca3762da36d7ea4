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

  /** Deterministic dump order in ONE pass. A global `orderBy` range-sorts:
    * it runs a partition-boundary SAMPLING job that executes the (often
    * expensive) upstream pipeline a second time, then ships the plan to
    * every range task. The entries below emit small final result sets, so
    * one hash exchange + in-partition sort is strictly cheaper and equally
    * deterministic. The correctness gate sorts rows itself — this exists
    * for stable, diffable dumps, not for the compare.
    *
    * DUMP-ONLY, O(result) ON ONE TASK: `repartition(1)` funnels the whole
    * result through a single task, which is exactly right for kilobyte
    * verdict dumps and exactly wrong for any production data path. It is
    * deliberately a `private implicit` of this dump layer so no
    * engine/text/dedup code can reach it (PhysicalPlanSpec additionally
    * pins that dumps never range-partition).
    */
  private implicit class StableDump(df: DataFrame) {
    def stableSorted(cols: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols.map(col): _*)
  }

  /** Shared harness for the stateful-streaming graded rows: drive a
    * streaming frame through REAL micro-batches into a parquet sink and
    * read the sink back. `feed` receives a step function that processes
    * everything added to the source so far as one micro-batch. State
    * width is pinned narrow for the graded run and restored after:
    * state-store instances (shuffle partitions × batches) are the entire
    * wall at test volume — 32→8 measured q_fsm_stateful 12.4→2.9 s and
    * q_dedup_stream 7.9→3.6 s at sf0.1, pure fixed machinery with no
    * data term. A production stream sizes the width to key cardinality.
    */
  private def streamedToParquet(s: SparkSession, out: DataFrame,
      prefix: String)(feed: (() => Unit) => Unit): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    val prevW = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val q = out.writeStream.format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      feed(() => q.processAllAvailable())
      q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevW)
    s.read.parquet(s"$tmp/out")
  }

  /** Flagship: the full validation pass (row rules + referential +
    * uniqueness + stats) over a pages-shaped table derived from the
    * documents testdata (driver smoke default sf0.001; override with
    * SPARK_GRAFT_SF_DIR), returning per-partition verdicts.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val pages = documentsAsPages(t(spark, dir, "documents"))
    val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
      .where(col("host").isNotNull).distinct()
    val cfg = EngineConfig(
      keyExpr = "url",
      partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")
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

    // the ENGINE's own StatsPass.profile (the north-star column-stats
    // leg), value-graded on its exactly-derivable outputs: per-(part,
    // column) row count, null count/rate, and NATIVE-TYPE min/max — the
    // oracle aggregates in the column's type and casts the result, so a
    // lexicographic regression ("9" > "100") hash-mismatches. The
    // HLL approxDistinct and percentile_approx quantiles are
    // sketch-approximate by design (engine-specific) and graded by
    // QuantilesSpec/`q_quantiles` instead.
    "q_column_profile" -> ((s, dir) => {
      val cfg = EngineConfig(keyExpr = "cast(doc_id as string)",
        partExpr = "source",
        statsExprs = Seq("n_chars" -> "n_chars", "lang" -> "lang",
          "text_len" -> "length(text)"))
      StatsPass.profile(t(s, dir, "documents"), cfg)
        .select(col("part"), col("column"), col("rowCount"),
          col("nullCount"), col("nullRate"), col("min"), col("max"))
        .stableSorted("part", "column")
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
      // BANDED self range join (same shape as CrmChecks.overlappingSlots):
      // a bare equi-join on custkey followed by the date predicate is
      // O(fanout²) per key — measured x20 wall going sf0.1 → x10 input as
      // per-customer order counts grew. Bucketing by the window width and
      // exploding ONE side to {b-1, b, b+1} makes each qualifying pair
      // join on exactly one (custkey, bucket) — |Δts| ≤ w ⇒ |Δbucket| ≤ 1
      // and a.bucket matches exactly one of b's three — so the join cost
      // tracks pairs-within-window, not all pairs per key.
      val o = t(s, dir, "orders")
      val day = 86400L
      val a = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("a_key"), col("o_orderdate").as("a_date"),
        floor(unix_timestamp(col("o_orderdate")) / day).as("bucket"))
      val b = o.select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("b_key"), col("o_orderdate").as("b_date"),
        floor(unix_timestamp(col("o_orderdate")) / day).as("bb"))
        .withColumn("bucket",
          explode(array(col("bb") - 1, col("bb"), col("bb") + 1)))
        .drop("bb")
      a.join(b, Seq("custkey", "bucket"))
        .where(col("a_key") < col("b_key") &&
          abs(unix_timestamp(col("a_date")) - unix_timestamp(col("b_date"))) <= day)
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

    // Row-level exact dedup through the Dedup API itself (the groupBy +
    // join-back form — ADVICE r5's skew fix): planted canonical-duplicate
    // groups (case + whitespace variants collapse under the lowercase/
    // \s+-collapse fingerprint) over doc-unique filler; per-row n /
    // keep_id / survivor flag all re-derived in SQL over the LITERAL
    // canonical strings (the engine groups 64-bit hashes — q_repeated_
    // spans' collision contract).
    "q_dedup_rows" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          when(col("doc_id") % 20 === 0,
            concat(lit("Shared  Body "), expr("doc_id div 100").cast("string")))
            .otherwise(concat(lit("shared body "),
              expr("doc_id div 100").cast("string"))))
          // coalesce: a NULL corpus text would otherwise yield a NULL
          // filler whose fingerprint coalesces to hash('') — grouping all
          // null-text docs on the engine side while the SQL oracle's NULL
          // canonical drops out of both GROUP BY and the join
          .otherwise(concat(coalesce(col("text"), lit("")), lit(" #"),
            col("doc_id").cast("string"))).as("text"))
      graft.dedup.Dedup.exactDuplicateRows(docs, "doc_id", "text")
        .select(col("doc_id"), col("n"), col("keep_id"), col("keep"))
        .stableSorted("doc_id")
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

    // F13 make_aware (utils.py:17-24): attach the project zone to a naive
    // timestamp and normalize to the UTC instant; from_utc_timestamp is
    // the inverse, so ts_back pins the round trip. The events corpus is
    // January-only, so no DST gap/ambiguity — both engines resolve every
    // instant identically from the IANA db.
    "q_make_aware" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("event_id") % 37 === 0)
        .select(col("event_id"),
          to_utc_timestamp(col("ts"), "Europe/Amsterdam").as("ts_utc"),
          from_utc_timestamp(
            to_utc_timestamp(col("ts"), "Europe/Amsterdam"),
            "Europe/Amsterdam").as("ts_back"))
    }),

    // F15 rgetattr dotted-path access (utils.py:34-38): violations anchor
    // to nested struct paths via col("a.b.c"). The frame is re-nested
    // into contact.{name, account.{segment, balance}} and every output
    // column is read back THROUGH the dotted path; the oracle re-derives
    // flat, proving path access is exactly field projection.
    "q_nested_path" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          struct(col("c_name").as("name"),
            struct(col("c_mktsegment").as("segment"),
              col("c_acctbal").as("balance")).as("account")).as("contact"))
        .where(col("contact.account.balance") < 0)
        .select(col("key"), col("contact.name").as("name"),
          col("contact.account.segment").as("segment"),
          col("contact.account.balance").cast("double").as("balance"))
    }),

    // P15: multi-field OR search (DRF SearchFilter, api.py:296-298 —
    // search_fields ORed): "ar" hits p_name-only rows (gear parts),
    // p_type-only rows (STANDARD/LARGE), both, and neither, so the
    // cross-column OR is actually exercised
    "q_search_multi" -> ((s, dir) => {
      t(s, dir, "part")
        .where(graft.functions.StringFunctions.searchAny("ar",
          col("p_name"), col("p_type")))
        .select("p_partkey", "p_name", "p_type")
    }),

    // P12: match-case dispatch filter (CustomerFilter.filter_status,
    // filters.py:82-93) — each named status selects an EXISTS predicate
    // over the related table (semi-join arm), and an unknown status falls
    // through to no filter; the row runs EVERY arm plus the fallthrough
    // and counts the customers each one admits. OVERDUE mirrors the
    // reference's unpaid ∧ due < today with a frozen clock (F4).
    "q_filter_dispatch" -> ((s, dir) => {
      import graft.crm.StatusDispatch
      val cust = t(s, dir, "customer")
      val ords = t(s, dir, "orders")
      val arms = Map(
        "ORDERS" -> lit(true),
        "OPEN" -> (col("o_orderstatus") === "O"),
        "PENDING" -> (col("o_orderstatus") === "P"),
        "OVERDUE" -> (col("o_orderstatus") === "P" &&
          col("o_orderdate") < lit("1998-06-01").cast("timestamp")))
      (arms.keys.toSeq.sorted :+ "NO_SUCH_STATUS").map { st =>
        StatusDispatch.filterByStatus(cust, ords,
            "c_custkey", "o_custkey", arms, st)
          .agg(count(lit(1)).as("n_customers"))
          .select(lit(st).as("status"), col("n_customers"))
      }.reduce(_.unionByName(_))
    }),

    // S4 keyed MERGE upsert as a graded row (same write-to-tmp pattern as
    // the streaming row): batch1 (event_id %3 != 0) is upserted into a
    // fresh table keyed by user_id with ts as the version column, then
    // batch2 (event_id %2 = 0) is upserted on top. MERGE semantics under
    // oracle: ONE row per key survives globally — a key arriving in
    // batch2 keeps batch2's latest-ts row REGARDLESS of the existing
    // row's ts (updates beat existing), any other key keeps batch1's
    // latest-ts survivor. (user_id, ts) is unique per batch in this
    // corpus, so the deterministic row-hash tie-break never engages and
    // the DuckDB re-derivation is exact.
    "q_upsert_merge" -> ((s, dir) => {
      import graft.sources.PagesTable
      val ev = t(s, dir, "events")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_upsert").toString + "/tbl"
      PagesTable.upsert(s, tmp, ev.where(col("event_id") % 3 =!= 0),
        keyCols = Seq("user_id"), versionCol = "ts")
      PagesTable.upsert(s, tmp, ev.where(col("event_id") % 2 === 0),
        keyCols = Seq("user_id"), versionCol = "ts")
      PagesTable.read(s, tmp)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
    }),

    // S4 resumable validation as a graded row: two incremental arrivals
    // (days <= / > the cut) through Audit.runIncremental, then the FULL
    // audit verdict history dumped. Resume must equal from-scratch: the
    // per-day verdict grid is identical to a single full run, and each
    // run's "(global)" uniqueness row describes exactly the table that
    // run scanned (arrival-1 subset, then the whole table) — all
    // re-derived in SQL.
    "q_audit_resume" -> ((s, dir) => {
      // bounded to the first 6 crawl days: the graded mechanism (resume ≡
      // from-scratch + per-run global scopes) is day-count-independent,
      // and an unbounded row pays 2 dynamic-partition writes x every day
      // in the SF (46 at x10 — measured 37 s of pure commit machinery)
      val day0 = date_format(col("warc_ts"), "yyyy-MM-dd")
      val pages = documentsAsPages(t(s, dir, "documents"))
        .where(day0 <= "2024-01-06")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_audit_q").toString
      val tableDir = s"$tmp/pages"
      val auditDir = s"$tmp/audit"
      val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
        .where(col("host").isNotNull).distinct()
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")
      val cut = "2024-01-03"
      def arrive(slice: DataFrame, runId: String): Unit = {
        graft.sources.PagesTable.write(slice, tableDir,
          org.apache.spark.sql.SaveMode.Append)
        Audit.runIncremental(
          graft.sources.PagesTable.read(s, tableDir)
            .drop(graft.sources.PagesTable.PartitionCol),
          PagesRules.catalog, Map("hosts" -> hosts), cfg, auditDir, runId)
      }
      val day = date_format(col("warc_ts"), "yyyy-MM-dd")
      arrive(pages.where(day <= cut), "run_1")
      arrive(pages.where(day > cut), "run_2")
      new AuditLog(auditDir, s).verdicts()
        .select(col("part"), col("rule_id"), col("checked"),
          col("violations"), col("pass"))
        .stableSorted("part", "rule_id", "checked")
    }),

    // P11 default-filter injection (FilterDefaults, filters.py:31-55):
    // three scenarios over the same defaults = {status: 'O'} — no
    // explicit params (default applies), an explicit filter on the SAME
    // key (replaces the default, does NOT AND with it — 'F' would be
    // empty under AND), and an explicit filter on a DIFFERENT key
    // (composes with the default).
    "q_filter_defaults" -> ((s, dir) => {
      import graft.crm.FilterDefaults.withDefaults
      val o = t(s, dir, "orders")
      val defaults = Map("status" -> (col("o_orderstatus") === "O"))
      Seq(
        ("default", withDefaults(o, Map.empty, defaults)),
        ("explicit_same_key", withDefaults(o,
          Map("status" -> (col("o_orderstatus") === "F")), defaults)),
        ("explicit_other_key", withDefaults(o,
          Map("prio" -> (col("o_orderpriority") === "1-URGENT")), defaults)))
        .map { case (scn, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(scn).as("scenario"),
            col("n"))
        }.reduce(_.unionByName(_))
    }),

    // A12 bulk overwrite as a graded row: write one slice of events into
    // the day-partitioned layout, then STATIC-overwrite it with a
    // disjoint slice — the read-back must equal the second slice exactly
    // (no leftovers from days only the FIRST slice touched, which is
    // precisely what dynamic partition overwrite would leave behind; the
    // reference analog is the dummydata wipe-and-reload).
    "q_bulk_overwrite" -> ((s, dir) => {
      import graft.sources.PagesTable
      val ev = t(s, dir, "events")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_bulk").toString + "/tbl"
      // slice A: first half of January; slice B: a disjoint sparse set
      PagesTable.write(ev.where(col("ts") < lit("2024-01-16").cast("timestamp"))
        .withColumnRenamed("ts", "warc_ts"), tmp)
      PagesTable.write(ev.where(col("event_id") % 11 === 0)
        .withColumnRenamed("ts", "warc_ts"), tmp)
      PagesTable.read(s, tmp)
        .select(col("event_id"), col("warc_ts").as("ts"), col("user_id"),
          col("event_type"))
    }),

    // P13 range filter (cost/max_pet RangeFilter, filters.py:136-138)
    // composed with P10 OR-of-Q-objects (booking.py:73-78): between on a
    // numeric column ORed with an equality arm, grouped per status so the
    // predicate's interaction with both arms is visible in the counts
    "q_or_between" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_totalprice").between(1000.0, 2000.0) ||
          col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L)).as("n_urgent"))
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

    // A13: exact per-group quantiles (the KLL/percentile role of the stats
    // pass; percentile() interpolation verified bit-identical to DuckDB's
    // quantile_cont)
    "q_quantiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D))")
            .as("qs"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          col("qs").getItem(0).as("p25"), col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"), col("qs").getItem(3).as("p99"),
          col("n"))
    }),

    // F19: ArrayType tags + array_contains (taggit M2M labels,
    // customer.py:97, api.py:373-380 — tag filter then per-tag counts)
    "q_array_tags" -> ((s, dir) => {
      t(s, dir, "part")
        .withColumn("tags", split(col("p_name"), " "))
        .where(array_contains(col("tags"), "small"))
        .select(col("p_partkey"), explode(col("tags")).as("tag"))
        .groupBy(col("tag")).agg(count(lit(1)).as("n"))
    }),

    // W5: offset/limit pagination (views/crud_views.py:216 paginate_by=25;
    // page 3 of the default ordering with a unique tie-break key)
    "q_pagination_offset" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .offset(50).limit(25)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    }),

    // full validation pass over the pages-shaped table (the flagship job).
    // Oracle: the whole verdict table re-derived in DuckDB SQL — pages CTE
    // mirrors documentsAsPages, each rule's violation count per partition,
    // plus the global uniqueness row.
    "q_pages_validate" -> ((s, dir) => {
      val pages = documentsAsPages(t(s, dir, "documents"))
      val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
        .where(col("host").isNotNull).distinct()
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")
      ValidationEngine.run(pages, PagesRules.catalog,
        dims = Map("hosts" -> hosts), cfg = cfg)
        .verdicts.stableSorted("part", "rule_id")
    }),

    // J6 referential-with-error-ROW: the engine's broadcast-left-join
    // referential pass emitting per-row violations (key/part/path/message),
    // not just verdict counts. The hosts dim deliberately omits two
    // sources, so exactly those sources' pages violate; the oracle
    // re-derives the violation rows with a plain NOT-IN.
    "q_referential_violations" -> ((s, dir) => {
      val pages = documentsAsPages(t(s, dir, "documents"))
      val hosts = pages.select(expr("try_parse_url(url, 'HOST')").as("host"))
        .where(col("host").isNotNull &&
          !col("host").isin("src7.example.com", "src13.example.com"))
        .distinct()
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")
      ValidationEngine.run(pages,
          PagesRules.catalog.collect { case r: graft.rules.Referential => r },
          dims = Map("hosts" -> hosts), cfg = cfg)
        .violations
        .stableSorted("key")
    }),

    // ------------- rows-only entries (no SQL-expressible oracle) --------

    // engine versus planted corruption (self-contained generator input)
    "q_pages_validate_planted" -> ((s, dir) => {
      val data = PagesGen.generate(s, nRows = 50000L, nDays = 5)
      val cfg = EngineConfig(keyExpr = "url",
        partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")
      ValidationEngine.run(data.pages, PagesRules.catalog,
        dims = Map("hosts" -> data.hosts), cfg = cfg)
        .violations.groupBy(col("rule_id")).agg(count(lit(1)).as("n"))
        .stableSorted("rule_id")
    }),

    // CRM replay: the reference error-fixture corpus as violation rows —
    // ALL check families CrmReplaySpec replays (9 per-entity rule runs +
    // every cross-row check incl. the W7 monitor-timestamp reconstruction),
    // compared against the checked-in golden VALUES
    "q_crm_replay" -> ((s, dir) => {
      val t = graft.fixtures.CrmFixtures.build(s)
      import graft.crm.{CrmCatalog, CrmChecks}
      import graft.fixtures.CrmFixtures.FrozenNowSql
      def run(df: DataFrame, rules: Seq[graft.rules.ValidationRule], e: String) =
        ValidationEngine.run(df, rules,
          Map("customers" -> t.customers, "services" -> t.services,
            "invoices" -> t.invoices),
          EngineConfig(s"concat('$e:', cast(id as string))",
            s"'$e'")).violations
      Seq(
        run(t.bookings, CrmCatalog.bookingRules, "booking"),
        run(t.bookingSlots, CrmCatalog.slotRules, "booking_slot"),
        run(t.customers, CrmCatalog.customerRules, "customer"),
        run(t.contacts, CrmCatalog.contactRules, "contact"),
        run(t.services, CrmCatalog.serviceRules, "service"),
        run(t.invoices, CrmCatalog.invoiceRules, "invoice"),
        run(t.charges, CrmCatalog.chargeRules, "charge"),
        run(t.payments, CrmCatalog.paymentRules, "payment"),
        run(t.pets, CrmCatalog.petRules, "pet"),
        CrmChecks.overlappingSlots(t.bookingSlots, t.bookings),
        CrmChecks.multipleServicesPerSlot(t.bookings),
        CrmChecks.capacity(t.bookings, t.bookingPets, t.services),
        CrmChecks.fsmLegality(t.stateLog, "booking"),
        CrmChecks.fsmLegality(t.stateLog, "invoice"),
        CrmChecks.fsmLegality(t.stateLog, "charge"),
        CrmChecks.completeRequiresPastEnd(t.bookings, FrozenNowSql),
        CrmChecks.invoiceSendGuard(t.invoices, t.customers),
        CrmChecks.accountingInvariants(t.invoices, t.charges, t.payments),
        CrmChecks.immutabilityDrift(t.invoices, t.invoicesAfter),
        CrmChecks.petOwnership(t.bookings, t.bookingPets, t.pets),
        CrmChecks.orphanSlots(t.bookingSlots, t.bookings),
        CrmChecks.monitorConsistency(t.invoices, t.stateLog,
          "invoice", "paid", "paid_on")
      ).map(_.coalesce(1))
        // coalesce(1) per branch BEFORE the union: a stage over the
        // 22-branch union ships the whole union's task binary to every
        // task, and the branches' post-shuffle segments total ~200
        // partitions — ~200 tasks × ~28 ms deserialization measured
        // (TailProbe), ~5.5 s of pure overhead for 41 result rows. One
        // partition per fixture-scale branch keeps the engine's internal
        // parallelism (coalesce only collapses the segment after each
        // branch's last exchange) and cuts the fan to 22 tasks.
        .reduce(_.unionByName(_))
        // stableSorted, NOT orderBy: a range sort would execute all 22
        // union branches a second time for boundary sampling (see helper)
        .stableSorted("key", "rule_id", "message")
    }),

    // MinHash-LSH near-dup pairs over the documents corpus.
    // ORACLE-CHECKED against exact all-pairs 3-gram Jaccard in DuckDB:
    // the corpus has a clean similarity gap (planted near-dups at j ≥ 0.9,
    // everything else below 0.2), and 21 bands × 3 rows give per-pair
    // recall 1 − (1 − 0.9³)²¹ ≈ 1 − 1e-12 at j = 0.9 — so the LSH result
    // EQUALS the exact set and the exact set is the oracle. The jaccard
    // value itself is int/int division → bit-identical across engines.
    "q_minhash_lsh" -> ((s, dir) => {
      graft.dedup.Dedup.minHashNearDups(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.35, numHashes = 64, bands = 21,
        maxBucketSize = 200)
        .stableSorted("a_id", "b_id")
    }),

    // C4/Gopher-style repetition signals over the documents corpus —
    // duplicate-line and duplicate-3-gram fractions, re-derived in DuckDB
    // via list_distinct over the same splits
    "q_repetition" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      t(s, dir, "documents").select(
        col("doc_id"),
        TF.duplicateLineFraction(col("text")).as("dup_line_frac"),
        TF.duplicateNgramFraction(col("text"), 3).as("dup_3gram_frac"))
        .stableSorted("doc_id")
    }),

    // EXACT connected components over the near-dup pair graph (the
    // alternative to greedy b-side dropping for chain-shaped clusters) —
    // min-label propagation in Spark, oracled against a DuckDB RECURSIVE
    // CTE computing min-reachable-id over the exact-Jaccard pair graph.
    "q_dedup_components" -> ((s, dir) => {
      val pairs = graft.dedup.Dedup.minHashNearDups(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.35, numHashes = 64, bands = 21,
        maxBucketSize = 200)
      graft.dedup.Dedup.connectedComponents(pairs, "a_id", "b_id")
        .stableSorted("id")
    }),

    // Quality-aware keeper selection per near-dup cluster (the FineWeb
    // refinement of min-id keeping): components over the same pair graph
    // as q_dedup_components, then keep the LONGEST member of each cluster
    // (score = char length, ties -> min id); singletons always kept. The
    // oracle re-derives the clusters with the recursive CTE and the
    // keeper with a (score DESC, id ASC) window — every doc graded, comp,
    // score and flag value-checked.
    "q_dedup_keeper" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = graft.dedup.Dedup.minHashNearDups(docs,
        "doc_id", "text", threshold = 0.35, numHashes = 64, bands = 21,
        maxBucketSize = 200)
      val comps = graft.dedup.Dedup.connectedComponents(pairs, "a_id", "b_id")
      graft.dedup.Dedup.bestKeeperPerComponent(docs, comps, "doc_id",
          length(coalesce(col("text"), lit(""))).cast("long"))
        .select(col("doc_id").as("id"), col("comp"), col("score"), col("keep"))
        .stableSorted("id")
    }),

    // Exact k-shingle Jaccard verify over an EXPLICIT pair list (the
    // post-LSH verify stage used standalone): deterministic pairs
    // (doc_id, doc_id + 3), UNthresholded so empty/null-text handling is
    // value-checked too (empty vs anything = 0.0, the union-0 guard).
    // The engine computes Jaccard over 64-bit shingle-hash sets; values
    // equal the string-shingle-set Jaccard the oracle re-derives absent
    // 2^-64 collisions (same argument as q_minhash_lsh).
    "q_jaccard_verify" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ids = docs.select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("a_id"),
          (col("doc_id") + 3L).as("b_id"))
        .join(ids.select(col("doc_id").as("b_id")), Seq("b_id"), "left_semi")
      graft.dedup.Dedup.jaccardVerify(docs, pairs, "doc_id", "text", k = 3)
        .stableSorted("a_id", "b_id")
    }),

    // Substring-level dedup (Lee et al. 2022 re-expressed as sliding-
    // window fingerprints): per-doc count/fraction of 8-token windows
    // whose exact token sequence appears in >= 2 distinct docs. The
    // engine groups 64-bit FNV window hashes; the oracle groups the
    // LITERAL window strings — values agree absent 2^-64 collisions
    // (same contract as q_jaccard_verify), so coverage counts and
    // fractions are value-graded, not just shapes.
    "q_repeated_spans" -> ((s, dir) => {
      graft.dedup.Dedup.repeatedSpans(t(s, dir, "documents"),
          "doc_id", "text", k = 8, minDocs = 2)
        .stableSorted("id")
    }),

    // Substring-level span REMOVAL (the rewrite form of q_repeated_spans,
    // Lee et al. 2022's keep-one-occurrence semantic): tokens covered by
    // a cross-doc duplicated 8-token window are deleted everywhere except
    // in the window's min-id owner doc. The oracle re-derives the rewrite
    // token-by-token in DuckDB over literal window strings.
    "q_span_removal" -> ((s, dir) => {
      graft.dedup.Dedup.removeRepeatedSpans(t(s, dir, "documents")
          .select("doc_id", "text"),
        "doc_id", "text", k = 8, minDocs = 2)
        .select(col("doc_id"), col("clean_text"), col("tokens_removed"))
        .stableSorted("doc_id")
    }),

    // The PARAGRAPH-granularity configuration (sep = "\n\n", CCNet's
    // unit) of the same pass: multi-line boilerplate paragraphs dedup as
    // whole units, incl. the exact-threshold banners; the oracle splits
    // on the literal double-newline and matches trimmed units.
    "q_paragraph_dedup" -> ((s, dir) => {
      val paraPool = array(
        lit("Follow us on social media\nAll rights reserved."),
        lit("Subscribe for updates\nUnsubscribe anytime"),
        lit("About us\nCareers\nContact"))
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n\n",
          element_at(paraPool, (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
          col("text"),
          when(col("doc_id") < 4, lit("Rare promo\nLimited time")),
          when(col("doc_id") < 5, lit("Five banner\nExactly five")),
          concat(lit("unique tail "), col("doc_id"))).as("text"))
      graft.dedup.Dedup.commonLineRemoval(docs, "doc_id", "text",
          minDocs = 5, sep = "\n\n")
        .select(col("doc_id"), col("clean_text"), col("n_removed"))
        .stableSorted("doc_id")
    }),

    // Duplicated-line removal (CCNet/RefinedWeb boilerplate pass) on a
    // planted multi-line corpus: the single-line testdata texts get a
    // deterministic header/footer frame — a 7-string nav pool (~71 docs
    // each), a 3-string footer pool (~167 each), a banner in exactly 4
    // docs (one BELOW the minDocs=5 threshold → must stay) and one in
    // exactly 5 (AT threshold → must go), a blank line (never removed),
    // and two unique lines. The rewritten text and removal counts are
    // re-derived line-by-line in DuckDB over the same construction.
    "q_line_dedup" -> ((s, dir) => {
      val pool7 = array(lit("Terms of service apply."),
        lit("All rights reserved."), lit("Privacy policy"),
        lit("Sign in to continue"), lit("Powered by ExampleCMS"),
        lit("Back to top"), lit("Share this page"))
      val pool3 = array(lit("Cookie notice"),
        lit("Subscribe to our newsletter"), lit("Contact us"))
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          element_at(pool7, (pmod(col("doc_id"), lit(7)) + 1).cast("int")),
          col("text"),
          lit(""),
          element_at(pool3, (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
          when(col("doc_id") < 4, lit("Rare banner line")),
          when(col("doc_id") < 5, lit("Exactly five banner")),
          concat(lit("doc "), col("doc_id"))).as("text"))
      graft.dedup.Dedup.commonLineRemoval(docs, "doc_id", "text", minDocs = 5)
        .select(col("doc_id"), col("clean_text"), col("n_removed"))
        .stableSorted("doc_id")
    }),

    // The two REWRITE operators composed in production (CCNet) order:
    // duplicated-line removal FIRST, then repeated-span removal over the
    // REWRITTEN texts — the shape where rewrite operators silently
    // disagree (trim/EOL/tokenization semantics), so the composition gets
    // its own oracle. Planted corpus: a 3-string common footer (removed
    // by the line pass), the unique corpus soup, a per-doc-unique line
    // carrying a SHARED 9-token promo prefix (survives the line pass —
    // the whole line is unique — but its 8-token windows repeat across
    // ~56 docs, so the span pass deletes them everywhere except the
    // owner), and a unique tail. The oracle re-derives both passes
    // literally: the span pass tokenizes the LINE-CLEANED text (newlines
    // are whitespace — windows legally straddle the lines the first pass
    // left), span-touched docs re-join with single spaces, untouched docs
    // keep the line-pass output byte-identical.
    "q_rewrite_compose" -> ((s, dir) => {
      val pool3 = array(lit("Cookie notice"),
        lit("Subscribe to our newsletter"), lit("Contact us"))
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          element_at(pool3, (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
          col("text"),
          when(pmod(col("doc_id"), lit(9)) === 0,
            concat(lit("promo alpha beta gamma delta epsilon zeta eta theta uniq"),
              col("doc_id").cast("string"))),
          concat(lit("tail "), col("doc_id").cast("string"))).as("text"))
      val lineClean = graft.dedup.Dedup.commonLineRemoval(
          docs, "doc_id", "text", minDocs = 5)
        .select(col("doc_id"), col("clean_text").as("text"),
          col("n_removed").as("lines_removed"))
      graft.dedup.Dedup.removeRepeatedSpans(lineClean, "doc_id", "text",
          k = 8, minDocs = 2)
        .select(col("doc_id"), col("clean_text"), col("lines_removed"),
          col("tokens_removed"))
        .stableSorted("doc_id")
    }),

    // Content fingerprints, value-checked end-to-end: canonical-text
    // xxhash64 (the exact-dedup key) and the 1-hash MinHash
    // (rollingMinShingleHash). The oracle re-implements XXH64 over UTF-8
    // BYTES (stripes, 8/4/1-byte tails, avalanche — the general
    // variable-length path, not q_sampling's long specialization) in
    // DuckDB HUGEINT arithmetic; generated and bit-validated against
    // Spark by tools/gen_xxh64_sql.py, so the 64-bit hash VALUES are
    // graded, not just group structure.
    "q_fingerprint" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      t(s, dir, "documents").select(col("doc_id"),
        TF.fingerprint(col("text")).as("fp"),
        TF.rollingMinShingleHash(col("text"), 3).as("min_shingle"))
        .stableSorted("doc_id")
    }),

    // JSONL ingest with corrupt-record quarantine: the documents table is
    // serialized to JSONL, deterministic garbage lines are interleaved
    // (one per doc_id % 50 == 0), and the PERMISSIVE+quarantine reader
    // must split good rows (schema intact, values round-tripped) from
    // quarantined raw lines — bad input is DATA, not an exception. The
    // oracle re-derives every count and the good-row n_chars sum from the
    // source table arithmetic.
    "q_jsonl_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val docs = t(s, dir, "documents")
      val jsonLines = docs.select(to_json(struct(
        col("doc_id"), col("text"), col("lang"), col("source"))).as("value"))
      val garbage = docs.where(pmod(col("doc_id"), lit(50)) === 0)
        .select(concat(lit("{broken json for doc "),
          col("doc_id").cast("string")).as("value"))
      val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      jsonLines.unionByName(garbage).write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType)))
      val ingest = graft.sources.JsonlFiles.read(s, out, schema)
      // ONE deferred action for all three metrics: each side collapses to
      // a 1-row agg, the 1x1 crossJoin stitches them, and the (metric, n)
      // rows are unpivoted by exploding a literal struct array — the
      // caller's single count()/dump executes one job over two plain text
      // scans (the JsonlFiles contract: nothing cached, nothing pinned)
      val g = ingest.good.agg(count(lit(1)).as("good_rows"),
        coalesce(sum(length(col("text"))), lit(0L)).cast("long")
          .as("good_nchars"))
      val q = ingest.quarantined.agg(count(lit(1)).as("quarantined"))
      g.crossJoin(q)
        .select(explode(array(
          struct(lit("good_rows").as("metric"), col("good_rows").as("n")),
          struct(lit("quarantined").as("metric"), col("quarantined").as("n")),
          struct(lit("good_nchars").as("metric"), col("good_nchars").as("n"))))
          .as("m"))
        .select(col("m.metric").as("metric"), col("m.n").as("n"))
        .stableSorted("metric")
    }),

    // WET (WARC conversion) source round trip: the documents table is
    // rendered as real Content-Length-framed WET files (deterministic
    // bytes), read back through the framed parser, and the reconstructed
    // rows are checked against the source table re-derived directly in
    // DuckDB — any framing, encoding or date-format error breaks the
    // match. The parser survives payloads containing WARC-lookalike
    // header lines (WetFilesSpec), which delimiter-split parsing cannot.
    "q_wet_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        concat(lit("https://"), col("source"), lit(".example.com/doc/"),
          col("doc_id")).as("url"),
        timestamp_seconds(lit(1704067200L) + col("doc_id") * 797L)
          .as("warc_ts"),
        coalesce(col("text"), lit("")).as("text"))
      val out = java.nio.file.Files.createTempDirectory("graft_wet").toString
      graft.sources.WetFiles.write(docs, out, nFiles = 4)
      graft.sources.WetFiles.read(s, out)
        .select(col("url"), col("warc_ts"),
          length(col("text")).cast("long").as("n_chars"))
        .stableSorted("url")
    }),

    // Unicode NFC normalization over deterministically mixed composed/
    // decomposed forms built from the documents table. The oracle runs
    // DuckDB's OWN nfc_normalize over the same construction — two
    // independent Unicode implementations (JDK Normalizer vs DuckDB's)
    // must produce identical strings, lengths and already-normalized
    // verdicts.
    "q_nfc_normalize" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      val acute = 0x0301.toChar // combining acute accent
      val eAcute = 0x00E9.toChar // precomposed e-acute
      val diaer = 0x0308.toChar // combining diaeresis
      val uUml = 0x00FC.toChar // precomposed u-umlaut
      val id = col("doc_id").cast("string")
      val raw = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("Cafe" + acute + " nr "), id))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit("Caf" + eAcute + " nr "), id))
        .otherwise(concat(lit("u" + diaer + "ber " + uUml + "ber "),
          col("source")))
      t(s, dir, "documents").select(
        col("doc_id"), TF.nfcNormalize(raw).as("norm"),
        length(raw).cast("long").as("len_raw"),
        length(TF.nfcNormalize(raw)).cast("long").as("len_norm"),
        (raw === TF.nfcNormalize(raw)).as("already_normalized"))
        .stableSorted("doc_id")
    }),

    // The END-TO-END corpus construction pass: exact dedup → near-dup
    // prune → quality gate → deterministic sample → stable shards, as one
    // composed pipeline with a per-stage survivor report. Every stage is
    // independently SQL-re-derivable (fingerprint groups == canonical-text
    // groups, LSH pairs == exact Jaccard on this gapped corpus, engine
    // fire conditions mirrored, the sampler's xxhash64 in HUGEINT SQL), so
    // the WHOLE pipeline is oracle-checked end to end.
    "q_corpus_pipeline" -> ((s, dir) => {
      // width pin for the same reason as q_docs_quality_filter: the local
      // sf-dir parquet is a 1-2-split file and every pipeline stage is
      // compute-dense per row
      val (kept, report) = graft.text.CorpusPipeline.build(
        t(s, dir, "documents").repartition(32),
        "doc_id", "text", "lang", "source")
      val shards = kept.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("docs"))
        .select(lit(5).as("ord"),
          concat(lit("shard_"), lpad(col("shard").cast("string"), 2, "0"))
            .as("stage"),
          col("docs"))
      report.unionByName(shards).stableSorted("ord", "stage")
    }),

    // The pipeline WITH the repeated-span boilerplate gate enabled, on a
    // planted corpus: every doc_id % 7 == 0 doc becomes 40 shared
    // boilerplate tokens + 60 doc-unique filler tokens — pairwise
    // 3-shingle Jaccard 38/158 ≈ 0.24 (below the 0.35 near-dup threshold
    // WITH a gap, so MinHash can't pair them) while span coverage is
    // 33/93 ≈ 0.355 at k=8 (> the 0.3 gate) — exactly the
    // boilerplate-paragraph shape the gate exists for. The oracle
    // re-derives the whole 6-stage funnel with the span stage computed
    // over LITERAL window strings (engine: 64-bit FNV hashes — values
    // agree modulo 2^-64 collisions, the q_repeated_spans contract).
    "q_corpus_pipeline_spans" -> ((s, dir) => {
      val boiler = array_join(
        transform(sequence(lit(1), lit(40)),
          i => concat(lit("boil"), i.cast("string"))), " ")
      val filler = array_join(
        transform(sequence(lit(1), lit(60)),
          i => concat(lit("u"), col("doc_id").cast("string"),
            lit("_"), i.cast("string"))), " ")
      val docs = t(s, dir, "documents").repartition(32)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(boiler, lit(" "), filler)).otherwise(col("text")))
      val (kept, report) = graft.text.CorpusPipeline.build(
        docs, "doc_id", "text", "lang", "source",
        maxRepeatedSpanFraction = Some(0.3), spanK = 8)
      val shards = kept.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("docs"))
        .select(lit(6).as("ord"),
          concat(lit("shard_"), lpad(col("shard").cast("string"), 2, "0"))
            .as("stage"),
          col("docs"))
      report.unionByName(shards).stableSorted("ord", "stage")
    }),

    // The FULL funnel — both round-7 stages enabled: canonical-url
    // uniqueness BEFORE the text passes and the per-host cap AFTER the
    // quality gate. Urls are planted so every doc pair (2g, 2g+1) is the
    // same page crawled twice through different raw forms — the even doc
    // carries an UPPERCASED host, a utm_campaign param and a fragment;
    // the odd doc an uppercase scheme and an explicit :443 — and BOTH
    // must canonicalize to https://h<g%20>.example.com/doc/<g> for the
    // url_dedup stage to halve the corpus (the oracle re-derives that
    // exact string from the construction, so a canon drift breaks the
    // count). Host cap: ≤8 quality survivors per h<k>.example.com host,
    // ordered by doc_id, via the SALTED exact top-k path.
    "q_corpus_pipeline_full" -> ((s, dir) => {
      val g = expr("doc_id div 2")
      val hostId = pmod(g, lit(20)).cast("string")
      val docs = t(s, dir, "documents").repartition(32)
        .withColumn("url",
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit("https://H"), hostId, lit(".EXAMPLE.com/doc/"),
              g.cast("string"), lit("?utm_campaign=c#sec")))
          .otherwise(
            concat(lit("HTTPS://h"), hostId, lit(".example.com:443/doc/"),
              g.cast("string"))))
      val (kept, report) = graft.text.CorpusPipeline.build(
        docs, "doc_id", "text", "lang", "source",
        canonicalizeUrlCol = Some("url"), maxDocsPerKey = Some(8))
      val shards = kept.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("docs"))
        .select(lit(7).as("ord"),
          concat(lit("shard_"), lpad(col("shard").cast("string"), 2, "0"))
            .as("stage"),
          col("docs"))
      report.unionByName(shards).stableSorted("ord", "stage")
    }),

    // Corpus filtering AS validation: the Gopher/C4-style quality gates
    // (length, repetition, language, quality score) expressed as the SAME
    // ValidationRule catalog the page validator runs, over the documents
    // corpus — per-(source, rule) verdicts with violation counts, the
    // report a training-data pipeline actually acts on. Every signal is
    // independently re-derived in the DuckDB oracle, so the whole verdict
    // table is value-checked.
    "q_docs_quality_filter" -> ((s, dir) => {
      // the signal projection is compute-dense (several regex passes per
      // doc) and the local sf-dir parquet is a 1-2-split file, so pin the
      // width before computing signals — a real corpus arrives in
      // thousands of splits and needs no such hint
      val docs = graft.text.QualityRules.withSignals(
        t(s, dir, "documents").repartition(32))
      // profile the derived SIGNALS, not raw text bodies: min/max/HLL over
      // document strings is wasted IO+CPU (and string agg buffers force
      // SortAggregate); the verdict's checked count is rowCount either way
      val cfg = EngineConfig(keyExpr = "cast(doc_id as string)",
        partExpr = "source",
        statsExprs = Seq("n_tokens" -> "n_tokens",
          "dup_line_frac" -> "dup_line_frac",
          "dup_3gram_frac" -> "dup_3gram_frac",
          "quality" -> "quality"))
      ValidationEngine.run(docs, graft.text.QualityRules.catalog(),
        Map.empty, cfg)
        .verdicts.stableSorted("part", "rule_id")
    }),

    // STREAMING as a graded row (batch ≡ stream, driver-checked): the SAME
    // quality-rule catalog runs through the foreachBatch streaming path in
    // real micro-batches (maxFilesPerTrigger=2 over an 8-file staging of
    // the documents table → 4 batches, Trigger.AvailableNow), violations
    // append to a parquet sink per batch, and the verdict table is
    // re-assembled from that sink — then graded by the SAME DuckDB SQL as
    // the batch q_docs_quality_filter. Any drift between the batch engine
    // and the streaming port (rule semantics, partition keying, violation
    // counts) breaks the hash match. Per-batch cost is fixed machinery
    // (plan + sink append + checkpoint commit), so batch COUNT, not data
    // volume, sets this row's wall — 4 batches demonstrate cross-batch
    // accumulation as well as 8 at half the cost.
    "q_stream_quality_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream").toString
      // 32-file staging at 8 files per trigger: the SAME 4 micro-batches
      // as the r7 8-file/2-per-trigger shape (batch boundaries and the
      // graded output are identical), but each batch's scan arrives in 8
      // splits instead of 2 — the signal projection is regex-dense per
      // row, and 2-task batches serialized it (StageProbe r8: ~0.5 s of
      // task time on 2 tasks per batch)
      docs.repartition(32).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 8).parquet(s"$tmp/in")
      val cfg = EngineConfig(keyExpr = "cast(doc_id as string)",
        partExpr = "source")
      // same width pin as streamedToParquet: each foreachBatch runs the
      // engine's uniqueness/verdict shuffles, and 4 micro-batches × the
      // session's full shuffle width is pure fixed machinery at batch
      // volume (the r7 32→8 stream measurements); a production stream
      // sizes the width to per-batch volume, not to this harness pin
      val prevW = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        graft.streaming.StreamingValidation.validateStream(
            graft.text.QualityRules.withSignals(stream),
            graft.text.QualityRules.catalog(), Map.empty, cfg,
            s"$tmp/vios", s"$tmp/ckpt")
          .start().awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevW)
      // verdicts from the STREAMED sink: per-(part, rule) violation counts
      // over the full rule × partition grid; checked = per-part row counts
      // of the same staged input
      import s.implicits._
      val parts = s.read.parquet(s"$tmp/in")
        .groupBy(col("source").as("part"))
        .agg(count(lit(1)).as("checked"))
      val ruleIds = graft.text.QualityRules.catalog().map(_.ruleId)
        .toDF("rule_id")
      val counts = s.read.parquet(s"$tmp/vios")
        .groupBy(col("part"), col("rule_id"))
        .agg(count(lit(1)).as("violations"))
      parts.crossJoin(ruleIds).join(counts, Seq("part", "rule_id"), "left")
        .select(col("part"), col("rule_id"), col("checked"),
          coalesce(col("violations"), lit(0L)).as("violations"),
          (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
        .stableSorted("part", "rule_id")
    }),

    // STATEFUL streaming (flatMapGroupsWithState) as a graded row: the
    // FSM legality stream runs over a transition-event table derived from
    // `events` (per-user event chains; source = previous type, with
    // planted forged sources at event_id % 97 and planted cross-batch
    // LATE arrivals at rn % 23 — each bumped one micro-batch later than
    // its neighbors) through a real 3-micro-batch MemoryStream run, and
    // the FULL violation set — rule ids AND messages, which embed the
    // state-store's view of the entity — is re-derived in DuckDB SQL
    // (running-max lateness + lag-over-applied-events current state).
    // Any drift in the state store's sequencing (late handling, state
    // advancement, within-batch event-time ordering) breaks the match.
    // MemoryStream is the one deliberately driver-resident source here:
    // it is Structured Streaming's canonical deterministic-batch test
    // source, and exact batch boundaries are the thing under test.
    "q_fsm_stateful" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingValidation
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val states = Seq("click", "error", "purchase", "signup", "view")
      val legal = (for {
        a <- "start" +: "forged" +: states
        b <- states
        if a != b && !(a == "signup" && b == "purchase")
      } yield (a, b)).toSet
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      // synthetic whole-second per-user timestamps (rn-spaced) make the
      // late-event MESSAGES — which embed Timestamp.toString — exactly
      // SQL-renderable; the real `ts` only fixes the per-user order
      val seq0 = t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("user_id"))))
        .withColumn("src0",
          coalesce(lag(col("event_type"), 1).over(w), lit("start")))
        .withColumn("src", when(col("event_id") % 97 === 0, lit("forged"))
          .otherwise(col("src0")))
        .withColumn("t3", expr("(cnt + 2) div 3"))
        .withColumn("b0", when(col("rn") <= col("t3"), lit(0))
          .when(col("rn") <= col("t3") * 2, lit(1)).otherwise(lit(2)))
        .withColumn("batch",
          when(col("rn") % 23 === 0 && col("b0") < 2, col("b0") + 1)
            .otherwise(col("b0")))
        .withColumn("ts_synth",
          timestamp_seconds(lit(1704067200L) + col("rn") * 60L))
      // harness-side collect ONLY: MemoryStream micro-batches are fed from
      // the driver by construction; production streams read a real source
      val byBatch = seq0.select("batch", "user_id", "ts_synth", "src",
          "event_type").collect()
        .map(r => (r.getInt(0), StreamingValidation.TransitionEvent(
          "user", r.getLong(1), r.getTimestamp(2), r.getString(3),
          r.getString(4))))
        .groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2).toSeq)
      val stream = MemoryStream[StreamingValidation.TransitionEvent]
      streamedToParquet(s,
        StreamingValidation.fsmLegalityStream(stream.toDS(), legal, "start")
          .toDF(), "graft_fsm_stateful") { step =>
        byBatch.foreach { b => stream.addData(b); step() }
      }
        .select(col("key"), col("ruleId").as("rule_id"), col("message"),
          col("ts"))
        .stableSorted("key", "ts", "rule_id")
    }),

    // Streaming EXACT dedup (dropDuplicatesWithinWatermark state store)
    // as a graded row: batch 0 ingests the corpus (doc-unique texts, with
    // every doc_id % 50 == 0 text NULLed — no content, must pass
    // through), batch 1 replays every doc_id % 5 == 0 text plus genuinely
    // fresh docs, batch 2 replays both earlier batches' content — so the
    // kept set exercises cross-batch state hits from BOTH prior batches,
    // null pass-through on every batch, and zero within-batch duplicate
    // texts (within-batch first-arrival is partition-order-dependent and
    // deliberately excluded; the batch pass owns within-batch ties). The
    // oracle re-derives the exact survivor set + timestamps arithmetic-
    // ally from the documents table.
    "q_dedup_stream" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      val base = 1704067200L
      // coalesce keeps NULL texts confined to the planted % 50 rows on
      // BOTH engine and oracle sides (a NULL corpus text elsewhere would
      // otherwise pass through the dedup as content-free while the oracle
      // models nulls only at % 50)
      val d = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 50 === 0, lit(null).cast("string"))
          .otherwise(concat(coalesce(col("text"), lit("")), lit(" #"),
            col("doc_id").cast("string"))).as("t"))
      // harness-side collect ONLY (MemoryStream fixture feeding, sf-bounded)
      def mk(df: DataFrame): Seq[(Long, java.sql.Timestamp, String)] =
        df.collect().map(r => (r.getLong(0), r.getTimestamp(1),
          if (r.isNullAt(2)) null else r.getString(2))).toSeq
      def tss(off: Column): Column = timestamp_seconds(lit(base) + off)
      val b0 = mk(d.select(col("doc_id"), tss(col("doc_id") % 400).as("ts"), col("t")))
      val b1 = mk(d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"),
          tss(lit(410L) + col("doc_id") % 60).as("ts"), col("t"))
        .unionByName(d.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000L).as("doc_id"),
            tss(lit(415L) + col("doc_id") % 60).as("ts"),
            concat(lit("fresh doc "), col("doc_id").cast("string")).as("t")))) :+
        ((30001L, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(base + 480L)), null: String))
      val b2 = mk(d.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 40000L).as("doc_id"),
          tss(lit(500L) + col("doc_id") % 60).as("ts"),
          concat(lit("fresh doc "), col("doc_id").cast("string")).as("t"))
        .unionByName(d.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 50000L).as("doc_id"),
            tss(lit(505L) + col("doc_id") % 60).as("ts"), col("t"))))
      val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
      streamedToParquet(s,
        graft.streaming.StreamingValidation.dedupStream(
          stream.toDF().toDF("doc_id", "ts", "t"), "t", "ts",
          lateness = "10 minutes"), "graft_dedup_stream") { step =>
        Seq(b0, b1, b2).foreach { b => stream.addData(b); step() }
      }
        .select(col("doc_id"), col("ts"),
          length(col("t")).cast("long").as("n_chars"))
        .stableSorted("doc_id")
    }),

    // Watermarked windowed violation counts (the streaming verdict feed)
    // as a graded row: the events table streams through 3 contiguous
    // time-slice micro-batches + one far-future flush event (its window
    // is violation-free and emits nothing, but its event time pushes the
    // watermark past every real window), so the emitted set is exactly
    // "every 10-minute window with >= 1 violation" — no watermark
    // boundary cases left to engine interpretation — and counts are
    // re-derived arithmetically in SQL. Late-drop semantics stay
    // exercised structurally (contiguous slices mean nothing is late;
    // StreamingSpec owns the drop case).
    "q_stream_windowed" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      // cast up front: the parquet column reads as TIMESTAMP_NTZ, whose
      // collected form (LocalDateTime) neither getTimestamp nor the
      // MemoryStream tuple encoder accepts; session tz is UTC so the cast
      // is instant-preserving
      val ev = t(s, dir, "events")
        .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
      // ONE harness-side collect (MemoryStream fixture feeding, sf-bounded)
      // instead of a min/max aggregate plus three per-slice collects that
      // each re-scanned the table — min/max and the slice membership are
      // derived driver-side from the same rows, so 4 scan jobs become 1
      // with byte-identical batches
      val all = ev.collect().map(r => (r.getTimestamp(0), r.getString(1))).toSeq
      val times = all.map(_._1.getTime)
      val (tmin, tmax) = (times.min, times.max)
      val (c1, c2) = (tmin + (tmax - tmin) / 3, tmin + 2 * (tmax - tmin) / 3)
      // second-resolution slicing keeps boundary rows in exactly one
      // slice (the original filtered on the SECOND-truncated timestamp:
      // cast(ts as long) * 1000); the final +1 s covers tmax itself
      def slice(lo: Long, hi: Long): Seq[(java.sql.Timestamp, String)] =
        all.filter { case (ts, _) =>
          val sec = ts.getTime / 1000 * 1000
          sec >= lo && sec < hi
        }
      val batches = Seq(slice(0L, c1), slice(c1, c2), slice(c2, tmax + 1000),
        Seq((new java.sql.Timestamp(tmax + 3600L * 1000), "click")))
      val rules: Seq[graft.rules.ValidationRule] = Seq(graft.rules.Allowed(
        "valid_type", "event_type", Seq("click", "view", "purchase", "signup")))
      val stream = MemoryStream[(java.sql.Timestamp, String)]
      streamedToParquet(s,
        graft.streaming.StreamingValidation.windowedViolationCounts(
          stream.toDF().toDF("ts", "event_type"), rules, "ts",
          windowLength = "10 minutes", lateness = "5 minutes"),
        "graft_stream_windowed") { step =>
        batches.foreach { b => stream.addData(b); step() }
      }
        .select(col("window.start").as("w_start"),
          col("window.end").as("w_end"), col("rule_id"), col("violations"))
        .stableSorted("w_start", "rule_id")
    }),

    // Deterministic sampling / stratification / sharding / shuffle over
    // the documents corpus — membership, stratum fate, shard id and global
    // order all decided ONLY by xxhash64(doc_id, 42), so every number here
    // is invariant to partitioning, retries and cluster size.
    // ORACLE: a true re-derivation, not a recorded golden — the exact
    // XXH64 8-byte-long specialization Spark's XxHash64 evaluates
    // (hashLong(key, 42) chained into hashLong(seed, ·)) is re-implemented
    // in DuckDB SQL as a CTE chain over HUGEINT modular arithmetic
    // (64×64-bit multiply split into 32-bit halves), validated bit-exact
    // against org.apache.spark XxHash64 across the signed-long range.
    "q_sampling" -> ((s, dir) => {
      import graft.text.Sampling
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      val rates = Map("en" -> 0.2, "de" -> 0.5, "fr" -> 0.05, "zh" -> 0.35)
      val r10 = Sampling.deterministicSample(docs, "doc_id", 0.10)
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("sample").as("family"), lit("r10").as("k"), col("n"))
      val r50 = Sampling.deterministicSample(docs, "doc_id", 0.50)
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("sample").as("family"), lit("r50").as("k"), col("n"))
      val strata = Sampling.stratifiedSample(docs, "doc_id", "lang", rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("stratum").as("family"), col("lang").as("k"), col("n"))
      val shards = docs
        .select(Sampling.shardColumn(col("doc_id"), 16).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(lit("shard").as("family"),
          lpad(col("shard").cast("string"), 2, "0").as("k"), col("n"))
      val shuffled = Sampling.deterministicShuffle(docs, "doc_id").limit(20)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(xxhash64(col("doc_id"), lit(42L)), col("doc_id")))
          .as("rk"))
        .select(lit("shuffle").as("family"),
          lpad(col("rk").cast("string"), 2, "0").as("k"),
          col("doc_id").cast("long").as("n"))
      r10.unionByName(r50).unionByName(strata).unionByName(shards)
        .unionByName(shuffled)
        .stableSorted("family", "k")
    }),

    // Per-host document cap (the Gopher/FineWeb "at most k docs per
    // host" rule) in its SALTED two-phase configuration — the skew-proof
    // scale path — value-graded against DuckDB's plain one-window
    // top-10: the two-phase form must be EXACTLY the top-10 per source
    // under (n_chars desc, doc_id), or the hashes differ.
    "q_host_cap" -> ((s, dir) => {
      graft.text.Sampling.capPerKey(t(s, dir, "documents"),
        Seq("source"), Seq(col("n_chars").desc, col("doc_id")), k = 10,
        saltOn = Some(col("doc_id")), nSalts = 8)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .stableSorted("source", "doc_id")
    }),

    // Sequence packing (the GPT-2/3 chunking recipe): concatenate docs +
    // one EOS separator each in deterministic hash order within hash
    // shards, chop the token stream into 128-token blocks, docs crossing
    // boundaries. Pure offset arithmetic — a per-shard prefix sum — so
    // the ORACLE re-derives every span: the same XXH64 HUGEINT chain as
    // q_sampling for shard + order, the same whitespace tokenizer as
    // q_token_count, then a window cumsum. Every doc graded on (shard,
    // n_tokens, offset, first_block, last_block).
    "q_sequence_pack" -> ((s, dir) => {
      import graft.text.{Packing, TextFunctions => TF}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Packing.packSequences(docs, "doc_id", TF.tokenCount(col("text")),
          blockLen = 128, nShards = 4)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("offset"), col("first_block"), col("last_block"))
        .stableSorted("doc_id")
    }),

    // the materialization map for the packed stream: one row per
    // (doc, block) with the doc-local token sub-range — the frame a
    // block writer groups by (shard, block); boundary-crossing docs
    // emit one row per spanned block, oracle-graded on the exact slice
    // arithmetic
    "q_pack_slices" -> ((s, dir) => {
      import graft.text.{Packing, TextFunctions => TF}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val packed = Packing.packSequences(docs, "doc_id",
        TF.tokenCount(col("text")), blockLen = 128, nShards = 4)
      Packing.blockSlices(packed, blockLen = 128)
        .select(col("doc_id"), col("shard"), col("block"),
          col("tok_start"), col("tok_len"))
        .stableSorted("doc_id", "block")
    }),

    // per-document sliding windows (the BERT/embedding chunking recipe,
    // the complement of cross-doc packing): 32-token windows every 24
    // tokens — short docs one window, the last window short, empty docs
    // nothing; pure per-row arithmetic the oracle reproduces exactly
    "q_doc_windows" -> ((s, dir) => {
      import graft.text.{Packing, TextFunctions => TF}
      Packing.docWindows(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          "doc_id", TF.tokenCount(col("text")),
          windowLen = 32, stride = 24)
        .select(col("doc_id"), col("win"), col("tok_start"),
          col("tok_len"))
        .stableSorted("doc_id", "win")
    }),

    // the packed blocks MATERIALIZED: every (shard, block) row carries
    // the actual token sequence in stream order (doc tokens + one <eos>
    // each) — the writer-stage proof that the offset map indexes the
    // stream it claims to; every block's full text is re-derived in
    // DuckDB ordered by the same stream positions
    "q_block_text" -> ((s, dir) => {
      import graft.text.{Packing, TextFunctions => TF}
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val packed = Packing.packSequences(docs, "doc_id",
        TF.tokenCount(col("text")), blockLen = 128, nShards = 4)
      Packing.blockTokens(packed, "text", blockLen = 128)
        .select(col("shard"), col("block"), col("n_filled"),
          col("block_text"))
        .stableSorted("shard", "block")
    }),

    // deterministic train/val/test split (80/10/10 by key hash):
    // same-key rows split together, assignment replays across
    // partitioning and reruns; the oracle reproduces the when-chain's
    // RUNNING cumulative thresholds ((0.8 + 0.1), not 0.9 — the double
    // sums must be the same bits)
    "q_split_assign" -> ((s, dir) => {
      import graft.text.Sampling
      t(s, dir, "documents").select(col("doc_id"),
          Sampling.splitColumn(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .stableSorted("doc_id")
    }),

    // tokenizer-training statistics: exact global top-10 vocabulary by
    // (count DESC, token ASC) — k chosen so the cut falls INSIDE a count
    // tie (merge/slow both at the boundary count), grading the
    // deterministic tie-break; plans as TakeOrderedAndProject
    // (per-partition top-k, driver merge), never a global sort
    "q_vocab_topk" -> ((s, dir) => {
      import graft.text.Vocab
      Vocab.topTokens(t(s, dir, "documents"), "text", 10)
        .stableSorted("token")
    }),

    // one BPE merge step's candidate ranking: top-20 adjacent token
    // pairs (k cuts through a 7-pair count-tie run — the alphabetic
    // boundary is graded), pairs built inside the token array before the
    // explode (one corpus scan, no positional self-join)
    "q_bpe_pairs" -> ((s, dir) => {
      import graft.text.Vocab
      Vocab.topPairs(t(s, dir, "documents"), "text", 20)
        .stableSorted("pair")
    }),

    // CCNet-style per-source terciles over a discrete score (n_chars):
    // the per-group value histogram is cumsum'd and broadcast back —
    // the corpus is never sorted; ties share a bucket by construction
    "q_score_buckets" -> ((s, dir) => {
      import graft.text.Sampling
      Sampling.quantileBuckets(
          t(s, dir, "documents").select(col("doc_id"), col("source"),
            col("n_chars")),
          "n_chars", Seq("source"), k = 3)
        .select(col("doc_id"), col("source"), col("n_chars"), col("bucket"))
        .stableSorted("doc_id")
    }),

    // DSIR importance-weighting integer core (Xie et al. 2023): hashed
    // unigram+bigram bucket counts (64 buckets — collisions are real and
    // graded) for the raw corpus (sources outside src0/src1), dotted
    // against the target and raw corpus bucket tables. The log-space
    // weight itself is spec-pinned (ImportanceSpec), not hash-graded —
    // this row grades the hashing, collision structure, and join core
    "q_dsir_features" -> ((s, dir) => {
      import graft.text.Importance
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val isTarget = col("source").isin("src0", "src1")
      val tf = Importance.hashedNgramCounts(
        docs.where(isTarget), "doc_id", "text", nBuckets = 64)
      // NOTE (r8): rf feeds two consumers (the rt broadcast build and
      // the probe side). An eager checkpoint was tried and REVERTED:
      // the blocking materialization of the corpus-sized feature frame
      // measured slower than recomputing the cheap explode+aggregate
      // (1.41 s vs ~1.05 s at sf0.1) — the repeatedSpans trade, not the
      // lshCandidates one
      val rf = Importance.hashedNgramCounts(
        docs.where(!isTarget), "doc_id", "text", nBuckets = 64)
      val tt = Importance.bucketTotals(tf).withColumnRenamed("total", "_t")
      val rt = Importance.bucketTotals(rf).withColumnRenamed("total", "_r")
      rf.join(broadcast(tt), Seq("bucket"), "left")
        .join(broadcast(rt), Seq("bucket"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_grams"),
          count(lit(1)).as("n_buckets"),
          sum(col("cnt") * coalesce(col("_t"), lit(0L))).as("dot_target"),
          sum(col("cnt") * coalesce(col("_r"), lit(0L))).as("dot_raw"))
        .stableSorted("doc_id")
    }),

    // Source mixing (the Pile / GPT-3 mixture-weights recipe): per-source
    // sampling rates derived from mixture weights + a 30k-token budget —
    // src0's rate saturates the maxRate=8 cap, src1/src2 upsample with a
    // hash-resolved fractional epoch, src3 downsamples, unweighted
    // sources keep copies=0 (drops are data). Graded per-doc (copies)
    // AND per-source realized token totals (sum copies×tokens, exact
    // BIGINT); the oracle re-derives the double-arithmetic rate chain
    // bit-for-bit ((budget*w)/T, least, floor) and the XXH64 coordinate.
    "q_source_mixing" -> ((s, dir) => {
      import graft.text.{Sampling, TextFunctions => TF}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val weights = Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.08,
        "src3" -> 0.02)
      val withCopies = Sampling.mixtureCopies(docs, "doc_id", "source",
        TF.tokenCount(col("text")), weights, tokenBudget = 30000L,
        maxRate = 8.0)
      val perDoc = withCopies.select(lit("doc").as("family"),
        lpad(col("doc_id").cast("string"), 6, "0").as("k"),
        col("copies").as("n"))
      val realized = withCopies
        .groupBy(col("source"))
        .agg(sum(col("copies") * TF.tokenCount(col("text")).cast("long"))
          .as("n"))
        .select(lit("realized").as("family"), col("source").as("k"),
          col("n"))
      perDoc.unionByName(realized).stableSorted("family", "k")
    }),

    // the end-to-end train-prep composition: 80/10/10 split → mixture
    // rates computed over the TRAIN split's token totals → epoch
    // explosion → packing on the composite epoch key (id·16 + epoch, so
    // upsampled copies spread through the stream). The oracle re-derives
    // every stage, hashing TWICE (doc id for split/mixing, epoch key for
    // pack order) via a second instantiation of the XXH64 chain
    "q_train_pipeline" -> ((s, dir) => {
      import graft.text.TrainPipeline
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val (packed, _) = TrainPipeline.build(docs, "doc_id", "text",
        "source",
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        trainSplit = "train",
        weights = Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.08,
          "src3" -> 0.02),
        tokenBudget = 30000L, maxRate = 8.0, blockLen = 128, nShards = 4)
      packed.select(col("doc_id"), col("epoch"), col("shard"),
          col("n_tokens"), col("offset"), col("first_block"),
          col("last_block"))
        .stableSorted("doc_id", "epoch")
    }),

    // Char-3-gram LM quality scoring (the CCNet KenLM-signal analog):
    // train on the doc_id%5==0 slice, score every doc. Graded on the
    // EXACT integer core of the score — positions, train-count mass of
    // the doc's grams and contexts, OOV positions — re-derived in
    // DuckDB with the same explode/join/aggregate; the transcendental
    // avg_logp ranking signal itself is spec-pinned (LangModelSpec)
    // because ln() bit-parity across engines isn't contractual.
    "q_charlm_score" -> ((s, dir) => {
      import graft.text.LangModel
      // width pin (the q_docs_quality_filter rationale): the local sf-dir
      // parquet is a 1-split file and BOTH the training aggregate and the
      // per-position scoring explode are compute-dense per row — unpinned,
      // the whole tokenizer-class pass serializes on one scan task
      // (StageProbe r8: 1.7 s single-task stage); a real corpus arrives in
      // thousands of splits and needs no such hint
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(32)
      val model = LangModel.trainCharLm(
        docs.where(pmod(col("doc_id"), lit(5)) === 0), "text", n = 3)
      // every 7th doc gets out-of-distribution chars appended, so the
      // graded row exercises the OOV/backoff branches (the raw corpus
      // is single-alphabet word soup: oov would be 0 everywhere)
      val scored = docs.withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(coalesce(col("text"), lit("")), lit(" €txt§")))
          .otherwise(col("text")))
      LangModel.scoreCharLm(scored, "doc_id", "text", model, n = 3)
        .select(col("doc_id"), col("n_pos"), col("sum_gram"),
          col("sum_ctx"), col("oov"))
        .stableSorted("doc_id")
    }),

    // URL canonicalization + PII scrub over deterministically-messied
    // inputs built from the documents table — the web-dedup prerequisite
    // (canonical url BEFORE uniqueness) and the corpus-scale anonymise
    // concern, both re-derived step-for-step in DuckDB (RE2-safe regexes
    // by construction).
    "q_url_canon" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      val messy = when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("HTTPS://"), upper(col("source")),
          lit(".Example.COM:443/doc/"), col("doc_id"), lit("/")))
        .otherwise(concat(lit("HTTP://"), upper(col("source")),
          lit(".Example.COM:80/doc/"), col("doc_id"),
          lit("/?utm_source=x&id="), pmod(col("doc_id"), lit(7)),
          lit("&utm_campaign=y#frag")))
      val raw = concat(lit("contact "), lower(col("source")),
        lit("@example.com or +44 1234 567890 re: "),
        substring(col("text"), 1, 40))
      t(s, dir, "documents").select(
        col("doc_id"), messy.as("url"),
        TF.canonicalUrl(messy).as("canonical"),
        TF.maskPii(raw).as("scrubbed"))
        .stableSorted("doc_id")
    }),

    // Decontamination: cross-corpus (train × eval) near-dup pairs. The
    // eval side is a deterministic slice of the corpus (doc_id % 17 = 0),
    // so every eval doc has a VERBATIM training copy (itself — all bands
    // match, recall exactly 1) and the planted near-dup families cross the
    // boundary at j ≥ 0.9 (band recall 1 − ~1e-12, same math as
    // q_minhash_lsh) — the LSH output EQUALS the exact cross-pair set and
    // DuckDB's exact cross Jaccard is the oracle.
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val ev = docs.where(pmod(col("doc_id"), lit(17)) === 0)
      graft.dedup.Dedup.crossCorpusNearDups(docs, ev, "doc_id", "text",
        threshold = 0.35, numHashes = 64, bands = 21, maxBucketSize = 200)
        .stableSorted("t_id", "e_id")
    }),

    // N-gram eval-contamination (GPT-3 Appendix-C protocol) at the
    // canonical n=13: train docs sharing any exact 13-token window with
    // the eval slice (doc_id % 17 = 0, the q_decontaminate split). The
    // oracle re-derives every window as its LITERAL token string; the
    // engine joins 64-bit FNV hashes — same contract as q_repeated_spans.
    "q_ngram_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.dedup.Dedup.ngramContamination(
        docs.where(pmod(col("doc_id"), lit(17)) =!= 0),
        docs.where(pmod(col("doc_id"), lit(17)) === 0),
        "doc_id", "text", n = 13)
        .stableSorted("t_id")
    }),

    // SimHash near-dup pairs (hamming ≤ 7 over 64-bit sketches; pigeonhole
    // bands give EXACT recall for the hamming predicate). Oracle: on this
    // corpus the simhash pair set equals the exact 3-gram-Jaccard near-dup
    // set (verified), so the same DuckDB SQL is ground truth; the hamming
    // values themselves are pinned in DedupSpec.
    "q_simhash_neardup" -> ((s, dir) => {
      graft.dedup.Dedup.simHashNearDups(t(s, dir, "documents"),
        "doc_id", "text", maxHamming = 7, maxBucketSize = 200)
        .select("a_id", "b_id")
        .stableSorted("a_id", "b_id")
    }),

    // Sharded SimHash (the capacity recipe past maxBucketSize × 2^width
    // rows, Dedup.scala scale-bound note) as a GRADED row: candidates
    // never cross shards, so the contract is exactly the unsharded pair
    // set restricted to same-shard pairs — the cross-shard remainder is
    // the documented recall trade (DedupSpec pins both halves). Oracle:
    // the q_simhash_neardup exact-Jaccard SQL with both members required
    // to share shard = XXH64(doc_id) mod 4, the same HUGEINT hash chain
    // the q_sampling oracle re-derives for Sampling.shardColumn.
    "q_simhash_sharded" -> ((s, dir) => {
      val (pairs, drops) = graft.dedup.Dedup.simHashNearDupsShardedWithDrops(
        t(s, dir, "documents"),
        "doc_id", "text", nShards = 4, maxHamming = 7, maxBucketSize = 200)
      // the oracle equality below is only valid while NO (band, shard)
      // bucket overflows the cap (the engine silently drops overflowing
      // buckets; the oracle doesn't model the cap) — assert the
      // precondition via the drop report so a future testdata regen
      // surfaces as a loud precondition failure, not an opaque hash
      // mismatch (ADVICE r6)
      val d = drops.first()
      require(d.getAs[Long]("dropped_buckets") == 0L,
        s"q_simhash_sharded precondition: stop-band cap engaged ($d) — " +
          "the DuckDB oracle does not model bucket drops")
      pairs.select("a_id", "b_id").stableSorted("a_id", "b_id")
    }),

    // brute-force cosine top-k (ANN baseline) for 5 query vectors.
    // Scores are fold-order double arithmetic — verified bit-identical to
    // DuckDB's list_dot_product formulation, so the oracle compares raw
    // doubles, not rounded ones.
    "q_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      graft.sim.Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10)
        .stableSorted("q_id", "rank")
    }),

    // LSH-bucketed ANN, PROVABLY-EXACT configuration (planes=0 → every row
    // lands in the single bucket → the candidate set is the whole corpus,
    // so the full LSH machinery — per-table bucketing, (table, bucket)
    // equi-join, per-pair max, windowed top-k — executes and its output
    // EQUALS brute force; the DuckDB brute-force SQL is therefore an exact
    // oracle). Honest approximate configs (recall < 1) are pinned against
    // brute force in SimilaritySpec instead: these testdata embeddings are
    // near-random (top cosine ~0.37), the adversarial case for SRP, where
    // any planes>0 config has data-dependent recall no oracle can fix.
    "q_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      graft.sim.Similarity.lshTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10,
        planes = 0, tables = 1)
        .stableSorted("q_id", "rank")
    }),

    // embedding-cosine near-duplicate pairs, EXACT configuration
    // (planes=0 → one cell → all-pairs verify): the operator's ground-truth
    // semantics, oracle-checked against DuckDB all-pairs cosine; the
    // SRP-bucketed approximate path of the same operator is pinned against
    // exact results in SimilaritySpec
    "q_cosine_neardups" -> ((s, dir) => {
      graft.sim.Similarity.cosineNearDups(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.4, planes = 0, tables = 1,
        maxBucketSize = Int.MaxValue)
        .stableSorted("a_id", "b_id")
    }),

    // embedding near-dup SCALE configuration (SRP-bucketed, 3 tables,
    // stop-band cap armed) — the headline similarity path. Oracle-EXACT by
    // construction: the corpus is embeddings ∪ exact copies of the first 30
    // vectors; identical vectors share every SRP bucket (recall 1 PROVABLY,
    // not probabilistically), and the only pairs with cosine ≥ 0.9 are
    // those copies (max non-identical pair: ≈0.51 at sf0.01, ≈0.60 at
    // sf0.1 — verified against DuckDB all-pairs at both scales), so
    // the bucketed output EQUALS the DuckDB all-pairs oracle while the
    // operator only compares within matching buckets — the templated/
    // duplicate-embedding dedup scenario at its real cost shape.
    // BOUND on the exactness claim: recall 1 additionally requires that no
    // shared (table, bucket) exceeds maxBucketSize=2000 — the stop-band
    // prunes whole buckets BEFORE pair generation. That holds here by
    // construction (≤ ~6k vectors over 2^10 buckets ≈ 6/bucket) but is NOT
    // scale-free: past ~2M uniformly-spread vectors, or on corpora where
    // many embeddings collapse into one bucket, pruning kicks in and the
    // output is a documented under-approximation (the cap exists precisely
    // to keep degenerate buckets from going quadratic — see
    // SimilaritySpec's degenerate-bucket test for the armed behavior).
    "q_cosine_neardups_bucketed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id"), col("embedding"))
        .unionByName(emb.where(col("vec_id") < 30)
          .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
      graft.sim.Similarity.cosineNearDups(corpus, "vec_id", "embedding",
        threshold = 0.9, planes = 10, tables = 3, maxBucketSize = 2000)
        .stableSorted("a_id", "b_id")
    }),

    // IVF ANN, PROVABLY-EXACT configuration (nProbe = nLists: every query
    // probes every cell, so the whole IVF pipeline — deterministic k-means
    // training, map-side cell assignment, inverted-file equi-join — runs
    // and its candidate set equals the corpus ⇒ output ≡ brute force
    // (pinned in SimilaritySpec "probing all cells equals brute force"),
    // making the DuckDB brute-force SQL an exact oracle). Approximate
    // nProbe < nLists recall is pinned vs brute in SimilaritySpec.
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      graft.sim.Similarity.ivfTopK(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10,
        nLists = 8, nProbe = 8, iters = 2)
        .stableSorted("q_id", "rank")
    }),

    // TWO-LEVEL IVF (the 10^6-list scale path: coarse closure + per-cell
    // fine-matrix join, nothing larger than one cell's matrix in one
    // place), again in its provably-exact probe-everything configuration
    // so the brute-force SQL is an exact oracle while the full coarse→
    // fine→inverted-file machinery executes. Approximate recall is pinned
    // vs brute in SimilaritySpec.
    "q_ann_ivf_hier" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      // iters=1: probe-all output is exact REGARDLESS of training quality
      // (the candidate set is the whole corpus), so the driver entry keeps
      // Lloyd passes minimal; training quality itself is SimilaritySpec's
      // business (recall tests at selective probes)
      graft.sim.Similarity.ivfTopKHierarchical(emb, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 10,
        nCoarse = 4, nFine = 3, nProbeCoarse = 4, nProbeFine = 3, iters = 1)
        .stableSorted("q_id", "rank")
    }),

    // text-quality profile: langId, quality score, token counts — all four
    // measures oracle-checked against a DuckDB re-derivation (regex counts
    // + the same fixed-order double arithmetic). The xxhash64 fingerprint
    // is not SQL-expressible and lives in TextFunctionsSpec instead.
    "q_text_quality" -> ((s, dir) => {
      import graft.text.{TextFunctions => TF}
      t(s, dir, "documents").select(
        col("doc_id"),
        TF.langId(col("text")).as("lang_id"),
        round(TF.qualityScore(col("text")), 4).as("quality"),
        TF.tokenCount(col("text")).cast("long").as("tokens"),
        TF.bpeishTokenCount(col("text")).cast("long").as("bpe_tokens"))
        .stableSorted("doc_id")
    }),

    // multimodal plumbing: stubbed decode over binary media columns. The
    // media identity is SQL-derivable (mediaFromDocs: id = doc_id, kind =
    // doc_id mod 3, payload = text bytes or NULL), so the whole
    // mapPartitions dataflow — typed Dataset encode, batched decode call,
    // ok/featureDim contract incl. the NULL-payload failure path — is
    // DuckDB-oracled; only the stub FNV feature VALUES stay ScalaTest-pinned
    // (MultimodalSpec), being the declared codec boundary.
    "q_multimodal_features" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.mediaFromDocs(
        t(s, dir, "documents"))
      graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
        .select(col("id"), col("kind"), col("ok"), col("featureDim"))
        .stableSorted("id")
    }),

    // S8 repair scan (fixcustomers): empty invoice_email + exactly one
    // email-classified contact → the repair plan row
    "q_repair_emails" -> ((s, dir) => {
      val tb = graft.fixtures.CrmFixtures.build(s)
      graft.crm.CrmRepairs.repairInvoiceEmails(tb.customers, tb.contacts)
        .orderBy("customer_id")
    }),

    // S3: primary-key point lookup (get(pk=…) / get_object_or_404) — the
    // filter is pushed to the scan (PhysicalPlanSpec pins PushedFilters)
    "q_point_lookup" -> ((s, dir) => {
      t(s, dir, "customer")
        .where(col("c_custkey") === 42L)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }),

    // F7/F9/F11/F12/F18 in one pass: every string helper applied to
    // deterministic inputs built from customer columns, each output
    // re-derived independently in DuckDB (RE2-compatible patterns; Spark
    // rlike anchored ^…$ ≡ full match)
    "q_string_functions" -> ((s, dir) => {
      import graft.functions.{StringFunctions => SF}
      val email = when(pmod(col("c_custkey"), lit(2)) === 0,
        concat(lower(regexp_replace(col("c_name"), "#", "")),
          lit("@pets.example"))).otherwise(col("c_name"))
      val multi = concat(col("c_name"), lit("\n"), col("c_mktsegment"),
        lit("\r\n tail"))
      val titled = when(pmod(col("c_custkey"), lit(3)) === 0,
          concat(lit("Dr. "), col("c_name")))
        .when(pmod(col("c_custkey"), lit(3)) === 1,
          concat(lit("Professor "), col("c_name")))
        .otherwise(col("c_name"))
      t(s, dir, "customer").select(
        col("c_custkey"),
        SF.emailValid(email).as("email_ok"),
        SF.mailto(email).as("mailto"),
        SF.truncate255(rpad(col("c_name"), 300, "x")).as("truncated"),
        SF.unslug(regexp_replace(col("c_name"), "#", "_")).as("unslugged"),
        SF.linebreakTo(multi, ", ").as("joined"),
        SF.minimizeWhitespace(multi).as("minimized"),
        SF.stripTitle(titled).as("stripped"))
        .orderBy("c_custkey")
    }),

    // multimodal resize: the BATCHED per-partition image pass end-to-end —
    // target geometry (aspect-preserving fit, never upscale) plus the
    // stub byte transform's size law are pure arithmetic over the
    // SQL-derivable media identity, so DuckDB re-derives every output row
    // of the real mapPartitions dataflow
    "q_multimodal_resize" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.mediaFromDocs(
        t(s, dir, "documents"))
      graft.multimodal.Multimodal.resizeImages(media, maxSide = 256)
        .select(col("id"), col("ok"), col("width"), col("height"),
          length(col("bytes")).as("n_bytes"))
        .stableSorted("id")
    }),

    // multimodal frame sampling: one frame per second of video duration —
    // the explode(sequence(...)) plan a real decoder consumes
    "q_frame_samples" -> ((s, dir) => {
      val media = graft.multimodal.Multimodal.mediaFromDocs(
        t(s, dir, "documents"))
      graft.multimodal.Multimodal.sampleFrames(media, everyMs = 1000L)
        .select(col("id"), col("frame_no"), col("ts_ms"))
        .stableSorted("id", "frame_no")
    }),

    // S9 read shape over the append-only event stream: opens per ENTITY +
    // first/last-open timestamps — the InvoiceOpen analytics shape
    // (cerberus/models/invoice.py:330-337 + api.py:255-263, "when was this
    // invoice first opened, how many times"). The events testdata has no
    // invoice FK, so user_id stands in as the grouping entity: same
    // count/min/max-per-key read-model, different key column — the
    // per-invoice variant is this exact plan with the FK swapped in. Raw
    // min/max timestamps are arithmetic-free → bit-identical across
    // engines.
    "q_invoice_opens" -> ((s, dir) => {
      t(s, dir, "events")
        .where(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_opens"),
          min(col("ts")).as("first_open"),
          max(col("ts")).as("last_open"))
    }),

    // S9 reference-exact: the InvoiceOpen read model keyed on the invoice
    // FK (invoice.py:329-337 — `related_name="opens"`), per invoice:
    // opens count and first/last opened, zero-open invoices included via
    // the left join like Django's `invoice.opens.count()`.
    "q_invoice_first_opens" -> ((s, dir) => {
      val tb = graft.fixtures.CrmFixtures.build(s)
      tb.invoices.alias("i")
        .join(tb.invoiceOpens.alias("o"),
          col("o.invoice_id") === col("i.id"), "left")
        .groupBy(col("i.id").as("invoice_id"), col("i.state"))
        .agg(count(col("o.id")).as("n_opens"),
          min(col("o.opened")).as("first_open"),
          max(col("o.opened")).as("last_open"))
        .orderBy("invoice_id")
    }),

    // S6: the invoice e-mail/PDF render sink as a batch job over the CRM
    // fixture (invoice.py:161-209 send/send_email + emails/invoice.txt) —
    // sendable set, due-defaulting, totals, and the full assembled body.
    // The pdf_bytes stub column is ScalaTest-pinned (InvoiceEmailSpec);
    // here the SQL-derivable surface is oracled end-to-end.
    "q_invoice_emails" -> ((s, dir) => {
      val tb = graft.fixtures.CrmFixtures.build(s)
      graft.crm.InvoiceEmail.renderEmails(tb.invoices, tb.charges,
        tb.customers, graft.fixtures.CrmFixtures.FrozenTodaySql)
        .select(col("invoice_id"), col("subject"), col("sent_to"),
          col("body"), col("total").cast("double").as("total"), col("due"))
        .orderBy("invoice_id")
    }),

    // The reference's DEFAULT customer queryset (customer.py:27-57 +
    // :125-128): per-customer unpaid balance (with the ORM's join-fanout
    // adjustment double-count replicated faithfully), distinct
    // unpaid/overdue invoice counts, uninvoiced charge count.
    "q_customer_balances" -> ((s, dir) => {
      val tb = graft.fixtures.CrmFixtures.build(s)
      graft.crm.CustomerLedger.customerBalances(tb.customers, tb.invoices,
        tb.charges, graft.fixtures.CrmFixtures.FrozenTodaySql)
        .withColumn("invoiced_unpaid",
          col("invoiced_unpaid").cast("double"))
        .orderBy("customer_id")
    }),

    // §3.1 nested serializer read-model (CustomerSerializer,
    // serializers.py:232-256): the customer document with
    // pets/contacts/bookings as SORTED array<struct> columns, built by
    // aggregate-then-join in one pass (no per-row lookups, no fanout).
    // The arrays are graded as their to_json rendering — Spark's compact
    // JSON of array<struct> and DuckDB's to_json(list(struct_pack(...)))
    // agree byte-for-byte on null-free fields, so element order, field
    // order and every value are hash-compared (the driver's sort cannot
    // order raw array<struct> columns).
    "q_customer_nested" -> ((s, dir) => {
      val tb = graft.fixtures.CrmFixtures.build(s)
      graft.crm.CustomerDoc.nestedCustomers(tb.customers, tb.pets,
          tb.contacts, tb.bookings)
        .select(col("customer_id"), col("name"), col("invoice_email"),
          to_json(col("pets")).as("pets_json"),
          to_json(col("contacts")).as("contacts_json"),
          to_json(col("bookings")).as("bookings_json"))
        .orderBy("customer_id")
    }),

    // F16: humanized dates/ages (humanize.naturaldate/naturaldelta,
    // booking.py:278 + pet.py:97-101) over orders with a frozen today
    // inside the data range — exercises today/tomorrow/yesterday, the
    // in-year "Mon dd" form, the cross-year "Mon dd yyyy" form, and the
    // day/month/year delta branches. Grouped so the result is the full
    // vocabulary with counts.
    "q_natural_dates" -> ((s, dir) => {
      val today = "date'1995-06-15'"
      val secs = datediff(expr(today), col("o_orderdate")).cast("long") * 86400L
      // render AFTER collapsing to distinct dates: the humanized strings
      // are functions of o_orderdate alone, so the (large) when-chains run
      // over ~2.4k distinct dates instead of every order row — the same
      // group-then-render shape a 10^12-row report job needs
      t(s, dir, "orders")
        .groupBy(col("o_orderdate")).agg(count(lit(1)).as("_n"))
        // pin the render's parallelism: the humanize chains are
        // COMPUTE-dense per row while the grouped rows are tiny in BYTES,
        // so AQE (which coalesces by size) would serialize the whole
        // render onto one task; an explicit width keeps it spread
        // (measured 2.6s → 0.7s at sf0.1, and the same effect holds for a
        // cluster-width render at 10^12 rows)
        .repartition(32)
        .select(
          graft.functions.StringFunctions
            .naturalDate(col("o_orderdate"), expr(today)).as("nat_date"),
          graft.functions.StringFunctions.naturalDelta(secs).as("age"),
          graft.functions.StringFunctions
            .preciseDelta(secs, "minutes").as("age_precise"),
          col("_n"))
        .groupBy("nat_date", "age", "age_precise")
        .agg(sum(col("_n")).cast("bigint").as("n"))
        // stableSorted, NOT orderBy: boundary sampling would run the
        // render pipeline a second time (see helper)
        .stableSorted("nat_date", "age", "age_precise")
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

  /** Golden oracle for the (sf-independent, fully deterministic) CRM
    * replay: the expected violation rows as a VALUES literal — the driver
    * compares the engine's replay of the reference error fixtures against
    * this checked-in ground truth (each row is independently pinned to the
    * reference semantics in CrmReplaySpec). `<US>` marks the 0x1f unit
    * separator used in composite uniqueness keys.
    *
    * COUPLING: these rows duplicate engine violation MESSAGE strings — any
    * message change in CrmChecks/RuleCompiler/CrmCatalog must be mirrored
    * here or the driver's row goes red while ScalaTest stays green. Do NOT
    * edit by hand: run `sbt "runMain graft.tools.CrmGoldenPrinter"` and
    * paste its output (it re-emits this literal, `<US>` included), then
    * justify any diff against CrmReplaySpec's expected map.
    */
  private val CrmReplayGolden: String = """SELECT * FROM (VALUES
         ('1<US>9', '(global)', 'unique_customer_slot', 'customer_id,booking_slot_id', 'duplicate value for unique(customer_id,booking_slot_id): n=2', 'error'),
         ('2017-05-20 10:00:00<US>2017-05-20 11:00:00', '(global)', 'unique_start_end', 'start,end', 'duplicate value for unique(start,end): n=2', 'error'),
         ('Home<US>1', '(global)', 'unique_name_customer', 'name,customer_id', 'duplicate value for unique(name,customer_id): n=2', 'error'),
         ('Walk<US>12.00<US>4<US>2<US>3600', '(global)', 'unique_service', 'name,cost,max_pet,max_customer,length_s', 'duplicate value for unique(name,cost,max_pet,max_customer,length_s): n=2', 'error'),
         ('booking:2', 'booking', 'active_has_slot', 'booking_slot_id', 'booking_slot_id dependency violated: (state != ''canceled'') requires (booking_slot_id IS NOT NULL)', 'error'),
         ('booking:20', 'booking', 'complete_requires_past_end', 'end', 'cannot complete a booking before its end', 'error'),
         ('booking:21', 'booking', 'booking_customer_fk', 'customer_id', 'booking_customer_fk', 'error'),
         ('booking:22', 'booking', 'pets_belong_to_customer', 'pets', 'pet 2 does not belong to booking customer', 'error'),
         ('booking:3', 'booking', 'canceled_has_no_slot', 'booking_slot_id', 'booking_slot_id dependency violated: (state = ''canceled'') requires (booking_slot_id IS NULL)', 'error'),
         ('booking:5', 'booking', 'start_before_end', 'start', 'start predicate failed: (start < end) OR start IS NULL OR end IS NULL', 'error'),
         ('booking:6', 'booking', 'fsm_legal', 'state', 'illegal transition preliminary -> completed', 'error'),
         ('booking:6', 'booking', 'valid_state', 'state', 'state not in allowed set {enquiry,preliminary,confirmed,canceled,completed}', 'error'),
         ('booking_slot:13', 'booking_slot', 'orphan_slot', 'id', 'slot has no bookings', 'warn'),
         ('booking_slot:2', 'booking_slot', 'no_overlap', 'start', 'BookingSlot overlaps another BookingSlot', 'error'),
         ('booking_slot:2', 'booking_slot', 'orphan_slot', 'id', 'slot has no bookings', 'warn'),
         ('booking_slot:3', 'booking_slot', 'orphan_slot', 'id', 'slot has no bookings', 'warn'),
         ('booking_slot:3', 'booking_slot', 'start_before_end', 'start', 'start predicate failed: (start < end) OR start IS NULL OR end IS NULL', 'error'),
         ('booking_slot:4', 'booking_slot', 'max_pets', 'pets', 'Booking has max pets for service, 4', 'error'),
         ('booking_slot:5', 'booking_slot', 'max_customers', 'customer_id', 'Booking has max customers for service, 2', 'error'),
         ('booking_slot:6', 'booking_slot', 'single_service', 'service_id', 'BookingSlot has multiple services', 'error'),
         ('booking_slot:7', 'booking_slot', 'no_overlap', 'start', 'BookingSlot overlaps another BookingSlot', 'error'),
         ('booking_slot:8', 'booking_slot', 'no_overlap', 'start', 'BookingSlot overlaps another BookingSlot', 'error'),
         ('charge:100', 'charge', 'fsm_legal', 'state', 'illegal transition paid -> unpaid', 'error'),
         ('charge:101', 'charge', 'refund_within_amount', 'line', 'Refund amount exceeds the refundable amount', 'error'),
         ('charge:106', 'charge', 'void_charge_detached', 'invoice_id', 'invoice_id predicate failed: state != ''void'' OR invoice_id IS NULL', 'error'),
         ('customer:2', 'customer', 'last_name_looks_wrong', 'last_name', 'last name doesn''t look right', 'warn'),
         ('customer:2', 'customer', 'no_invoice_email', 'invoice_email', 'no invoice email set', 'warn'),
         ('customer:3', 'customer', 'generated_name', 'name', 'generated column name inconsistent with recompute', 'error'),
         ('invoice:1', 'invoice', 'immutable_after_send', 'details', 'post-send edit to protected field details', 'error'),
         ('invoice:4', 'invoice', 'fsm_legal', 'state', 'illegal transition draft -> paid', 'error'),
         ('invoice:4', 'invoice', 'paid_equals_total', 'paid', 'paid 30.00 != total 40.00', 'error'),
         ('invoice:4', 'invoice', 'paid_on_consistent', 'paid_on', 'stored paid_on 2017-05-09 09:00:00 != audit-log reconstruction 2017-05-02 10:00:00', 'error'),
         ('invoice:4', 'invoice', 'send_guard', 'customer_id', 'sent to customer with issue: last name doesn''t look right', 'error'),
         ('invoice:4', 'invoice', 'send_guard', 'customer_id', 'sent to customer with issue: no invoice email set', 'error'),
         ('invoice:5', 'invoice', 'valid_state', 'state', 'state not in allowed set {draft,unpaid,paid,void}', 'error'),
         ('invoice:6', 'invoice', 'invoice_customer_fk', 'customer_id', 'invoice_customer_fk', 'error'),
         ('invoice:6', 'invoice', 'send_guard', 'customer_id', 'sent invoice has no customer', 'error'),
         ('payment:3', 'payment', 'amount_gte_0', 'amount', 'amount out of bounds [0, +inf]', 'error'),
         ('payment:4', 'payment', 'payment_invoice_fk', 'invoice_id', 'payment_invoice_fk', 'error'),
         ('pet:3', 'pet', 'pet_customer_fk', 'customer_id', 'pet_customer_fk', 'error'),
         ('pet:4', 'pet', 'valid_sex', 'sex', 'sex not in allowed set {male,female}', 'error'))
         AS t(key, part, rule_id, path, message, severity)"""
    .replace("<US>", "\u001f")

  /** Exact brute-force cosine top-k in DuckDB — the oracle for all three
    * ANN entries: q_ann_brute directly, and q_ann_lsh / q_ann_ivf because
    * their driver configurations are provably exact (single-bucket LSH,
    * probe-all IVF — see the query comments), so their output EQUALS brute
    * force while still executing the full bucketed machinery. Scores are
    * fold-order double arithmetic, bit-identical across engines.
    */
  private val AnnBruteSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] qv FROM embeddings
               WHERE vec_id < 5),
         scored AS (
           SELECT q.q_id, e.vec_id AS id,
             CASE WHEN sqrt(list_dot_product(e.v, e.v))
                       * sqrt(list_dot_product(q.qv, q.qv)) = 0 THEN 0
                  ELSE list_dot_product(e.v, q.qv) /
                       (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(q.qv, q.qv))) END AS score
           FROM e CROSS JOIN q)
         SELECT q_id, id, score, CAST(rank AS INT) AS rank FROM (
           SELECT q_id, id, score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, id ASC) AS rank
           FROM scored) WHERE rank <= 10"""

  /** Shared by q_docs_quality_filter (batch) and
    * q_stream_quality_filter (the foreachBatch streaming port of the
    * same catalog): ONE oracle, two execution paths — batch ≡ stream
    * graded by the driver.
    */
  private val DocsQualityOracleSql: String =
    """WITH m AS (SELECT source, text, lang,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                ELSE len(list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '')) END AS toks,
           list_filter(string_split(coalesce(text, ''), chr(10)),
             l -> trim(l) != '') AS lines,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN []::VARCHAR[]
                ELSE list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '') END AS ws,
           len(regexp_extract_all(coalesce(text,''), '(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|auf)\b'))
             + len(regexp_extract_all(coalesce(text,''), '(?i)\b(the|and|of|to|is|in|that|it|was|for)\b'))
             + len(regexp_extract_all(coalesce(text,''), '(?i)\b(el|los|las|es|una|en|que|por|con|para)\b'))
             + len(regexp_extract_all(coalesce(text,''), '(?i)\b(le|la|les|et|est|une|dans|que|pour|pas)\b')) AS sw,
           length(coalesce(text,'')) AS nch,
           len(regexp_extract_all(coalesce(text,''), '[^\p{L}\p{N} \t\n\v\f\r]')) AS punct,
           len(regexp_extract_all(coalesce(text,''), '[\p{N}]')) AS dig,
           len(regexp_extract_all(coalesce(text,''), '#'))
             + len(regexp_extract_all(coalesce(text,''), '\.\.\.'))
             + len(regexp_extract_all(coalesce(text,''), '…')) AS syms,
           len(regexp_extract_all(coalesce(text,''), '(?m)^[ \t\n\v\f\r]*\S')) AS nbl,
           len(regexp_extract_all(coalesce(text,''), '(?m)^[ \t]*[-*•]')) AS bul,
           len(regexp_extract_all(coalesce(text,''), '(?m)(\.\.\.|…)[ \t\r]*$')) AS ell,
           len(regexp_extract_all(coalesce(text,''), '(^|[ \t\n\v\f\r])[^ \t\n\v\f\r]*\p{L}')) AS alphaw
         FROM documents),
         sig AS (SELECT source, text, lang, toks,
           CASE WHEN toks = 0 THEN 0.0 ELSE syms * 1.0 / toks END AS symr,
           CASE WHEN nbl = 0 THEN 0.0 ELSE bul * 1.0 / nbl END AS bulf,
           CASE WHEN nbl = 0 THEN 0.0 ELSE ell * 1.0 / nbl END AS ellf,
           CASE WHEN toks = 0 THEN 1.0 ELSE alphaw * 1.0 / toks END AS alphaf,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines) END AS dlf,
           CASE WHEN len(ws) < 3 THEN 0.0
                ELSE (len(ws) - 2 - len(list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])))) * 1.0
                  / (len(ws) - 2) END AS dgf,
           round(least(CAST(toks AS DOUBLE)/100.0, 1.0) * 0.3
             + least((CASE WHEN toks = 0 THEN 0.0
                 ELSE CAST(sw AS DOUBLE)/toks END) * 4.0, 1.0) * 0.3
             + greatest(0.0, 1.0 - (CASE WHEN nch = 0 THEN 0.0
                 ELSE CAST(punct AS DOUBLE)/nch END) * 5.0) * 0.2
             + greatest(0.0, 1.0 - (CASE WHEN nch = 0 THEN 0.0
                 ELSE CAST(dig AS DOUBLE)/nch END) * 3.0) * 0.2, 4) AS q
         FROM m),
         per AS (SELECT source AS part,
           CAST(count(*) AS BIGINT) AS checked,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_req,
           CAST(sum(CASE WHEN NOT coalesce(toks >= 5, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_tok,
           CAST(sum(CASE WHEN NOT coalesce(dlf <= 0.3, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_dlf,
           CAST(sum(CASE WHEN NOT coalesce(dgf <= 0.3, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_dgf,
           CAST(sum(CASE WHEN lang IS NOT NULL
                AND lang NOT IN ('en','de','fr','es') THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
           CAST(sum(CASE WHEN NOT coalesce(q >= 0.25, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_q,
           CAST(sum(CASE WHEN NOT coalesce(symr <= 0.1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_sym,
           CAST(sum(CASE WHEN NOT coalesce(bulf <= 0.9, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_bul,
           CAST(sum(CASE WHEN NOT coalesce(ellf <= 0.3, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_ell,
           CAST(sum(CASE WHEN NOT coalesce(alphaf >= 0.8, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_alpha
         FROM sig GROUP BY 1)
         SELECT part, rule_id, checked, violations, violations = 0 AS pass
         FROM (
           SELECT part, 'text_required' AS rule_id, checked, v_req AS violations FROM per
           UNION ALL SELECT part, 'min_tokens', checked, v_tok FROM per
           UNION ALL SELECT part, 'max_dup_line_frac', checked, v_dlf FROM per
           UNION ALL SELECT part, 'max_dup_3gram_frac', checked, v_dgf FROM per
           UNION ALL SELECT part, 'lang_allowed', checked, v_lang FROM per
           UNION ALL SELECT part, 'min_quality', checked, v_q FROM per
           UNION ALL SELECT part, 'max_symbol_ratio', checked, v_sym FROM per
           UNION ALL SELECT part, 'max_bullet_lines', checked, v_bul FROM per
           UNION ALL SELECT part, 'max_ellipsis_lines', checked, v_ell FROM per
           UNION ALL SELECT part, 'min_alpha_words', checked, v_alpha FROM per)
         ORDER BY part, rule_id"""

  /** DuckDB re-derivation of Spark's XxHash64 LONG specialization at
    * seed 42 (hashLong(key, 42) chained into hashLong(seed, ·)) as a
    * CTE chain over HUGEINT modular arithmetic — the same generated,
    * bit-validated chain q_sampling inlines. Expects a CTE named `t`
    * exposing a BIGINT column `v` (plus any carried columns); emits
    * CTEs s1..s21, where s21 carries every `t` column plus `h` — the
    * signed-BIGINT Spark hash. Splice between the `WITH t AS (...)` and
    * the consumer by plain string concatenation (NOT s-interpolation:
    * the SQL contains regex backslashes downstream oracles rely on).
    */
  private val Xxh64LongCtes: String =
    """s1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM t),
         s2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k1 FROM s1),
         s3 AS (SELECT *, (((k1 << 31) & 18446744073709551615::HUGEINT) | (k1 >> 33)) AS k2 FROM s2),
         s4 AS (SELECT *, (((k2 * 2246822535::HUGEINT) + (((k2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k3 FROM s3),
         s5 AS (SELECT *, xor(2870177450012600311::HUGEINT, k3) AS b0 FROM s4),
         s6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM s5),
         s7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM s6),
         s8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM s7),
         s9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM s8),
         s10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM s9),
         s11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM s10),
         s12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM s11),
         s13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM s12),
         s14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM s13),
         s15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM s14),
         s16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM s15),
         s17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM s16),
         s18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM s17),
         s19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM s18),
         s20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM s19),
         s21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM s20)"""

  /** DuckDB port of Spark's XxHash64 over a STRING column (seed 42,
    * byte-exact, HUGEINT modular arithmetic): expects a CTE
    * `src(k, s)` (k an opaque struct key, s the string) and yields
    * `x_out(k, h)` with h = xxhash64(s) as BIGINT. Shared by
    * q_fingerprint and q_dsir_features.
    */
  private val Xxh64StrCtes: String =
    """ x_b AS (SELECT k, hex(encode(s)) AS hx,
     CAST(octet_length(encode(s)) AS BIGINT) AS n FROM src),
 x_bs AS (SELECT k, n, list_transform(generate_series(1, CAST(n AS INT)), i ->
     CAST(strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1 AS HUGEINT) * 16
       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bs
   FROM x_b),
 x_st AS (SELECT k, n, bs,
     list_reduce(list_prepend(
       {'w1': 6983438078262162944::HUGEINT, 'w2': 14029467366897019769::HUGEINT,
         'w3': 42::HUGEINT, 'w4': 7046029288634856867::HUGEINT},
       list_transform(generate_series(1, CAST(n // 32 AS INT)), t ->
         {'w1': (bs[(32*(t-1)) + 1] * 1::HUGEINT + bs[(32*(t-1)) + 2] * 256::HUGEINT + bs[(32*(t-1)) + 3] * 65536::HUGEINT + bs[(32*(t-1)) + 4] * 16777216::HUGEINT + bs[(32*(t-1)) + 5] * 4294967296::HUGEINT + bs[(32*(t-1)) + 6] * 1099511627776::HUGEINT + bs[(32*(t-1)) + 7] * 281474976710656::HUGEINT + bs[(32*(t-1)) + 8] * 72057594037927936::HUGEINT),
           'w2': (bs[(32*(t-1)+8) + 1] * 1::HUGEINT + bs[(32*(t-1)+8) + 2] * 256::HUGEINT + bs[(32*(t-1)+8) + 3] * 65536::HUGEINT + bs[(32*(t-1)+8) + 4] * 16777216::HUGEINT + bs[(32*(t-1)+8) + 5] * 4294967296::HUGEINT + bs[(32*(t-1)+8) + 6] * 1099511627776::HUGEINT + bs[(32*(t-1)+8) + 7] * 281474976710656::HUGEINT + bs[(32*(t-1)+8) + 8] * 72057594037927936::HUGEINT),
           'w3': (bs[(32*(t-1)+16) + 1] * 1::HUGEINT + bs[(32*(t-1)+16) + 2] * 256::HUGEINT + bs[(32*(t-1)+16) + 3] * 65536::HUGEINT + bs[(32*(t-1)+16) + 4] * 16777216::HUGEINT + bs[(32*(t-1)+16) + 5] * 4294967296::HUGEINT + bs[(32*(t-1)+16) + 6] * 1099511627776::HUGEINT + bs[(32*(t-1)+16) + 7] * 281474976710656::HUGEINT + bs[(32*(t-1)+16) + 8] * 72057594037927936::HUGEINT),
           'w4': (bs[(32*(t-1)+24) + 1] * 1::HUGEINT + bs[(32*(t-1)+24) + 2] * 256::HUGEINT + bs[(32*(t-1)+24) + 3] * 65536::HUGEINT + bs[(32*(t-1)+24) + 4] * 16777216::HUGEINT + bs[(32*(t-1)+24) + 5] * 4294967296::HUGEINT + bs[(32*(t-1)+24) + 6] * 1099511627776::HUGEINT + bs[(32*(t-1)+24) + 7] * 281474976710656::HUGEINT + bs[(32*(t-1)+24) + 8] * 72057594037927936::HUGEINT)})),
       (a, s) -> {'w1': ((((((((((a.w1) + (((s.w1) * 668265295::HUGEINT + (((s.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w1) + (((s.w1) * 668265295::HUGEINT + (((s.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((a.w1) + (((s.w1) * 668265295::HUGEINT + (((s.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w1) + (((s.w1) * 668265295::HUGEINT + (((s.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT), 'w2': ((((((((((a.w2) + (((s.w2) * 668265295::HUGEINT + (((s.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w2) + (((s.w2) * 668265295::HUGEINT + (((s.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((a.w2) + (((s.w2) * 668265295::HUGEINT + (((s.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w2) + (((s.w2) * 668265295::HUGEINT + (((s.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT), 'w3': ((((((((((a.w3) + (((s.w3) * 668265295::HUGEINT + (((s.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w3) + (((s.w3) * 668265295::HUGEINT + (((s.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((a.w3) + (((s.w3) * 668265295::HUGEINT + (((s.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w3) + (((s.w3) * 668265295::HUGEINT + (((s.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT), 'w4': ((((((((((a.w4) + (((s.w4) * 668265295::HUGEINT + (((s.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w4) + (((s.w4) * 668265295::HUGEINT + (((s.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((a.w4) + (((s.w4) * 668265295::HUGEINT + (((s.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((a.w4) + (((s.w4) * 668265295::HUGEINT + (((s.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)}) AS v
   FROM x_bs),
 x_h1 AS (SELECT k, n, bs,
     ((CASE WHEN n >= 32 THEN (((((xor(((((((xor(((((((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor(((((((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor(((((((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2246822535::HUGEINT + (((xor((((((((v.w1) << 1) & 18446744073709551615::HUGEINT) | ((v.w1) >> 63)) + ((((v.w2) << 7) & 18446744073709551615::HUGEINT) | ((v.w2) >> 57)) + ((((v.w3) << 12) & 18446744073709551615::HUGEINT) | ((v.w3) >> 52)) + ((((v.w4) << 18) & 18446744073709551615::HUGEINT) | ((v.w4) >> 46))) & 18446744073709551615::HUGEINT)), ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w1) * 668265295::HUGEINT + (((v.w1) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w2) * 668265295::HUGEINT + (((v.w2) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w3) * 668265295::HUGEINT + (((v.w3) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)), ((((((((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((v.w4) * 668265295::HUGEINT + (((v.w4) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)
            ELSE 2870177450012600303::HUGEINT END) + n) & 18446744073709551615::HUGEINT AS h1
   FROM x_st),
 x_h2 AS (SELECT k, n, bs,
     list_reduce(list_prepend(h1,
       list_transform(generate_series(1, CAST((n % 32) // 8 AS INT)), t ->
         (bs[(32*(n//32) + 8*(t-1)) + 1] * 1::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 2] * 256::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 3] * 65536::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 4] * 16777216::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 5] * 4294967296::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 6] * 1099511627776::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 7] * 281474976710656::HUGEINT + bs[(32*(n//32) + 8*(t-1)) + 8] * 72057594037927936::HUGEINT))),
       (a, w) -> (((((((((xor(a, ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) << 27) & 18446744073709551615::HUGEINT) | ((xor(a, ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) >> 37))) * 2246822535::HUGEINT + (((((((xor(a, ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) << 27) & 18446744073709551615::HUGEINT) | ((xor(a, ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2246822535::HUGEINT + ((((((((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) << 31) & 18446744073709551615::HUGEINT) | (((((w) * 668265295::HUGEINT + (((w) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) >> 33))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT))) >> 37))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT)) AS h2,
     32*(n//32) + 8*((n % 32)//8) AS o4
   FROM x_h1),
 x_h3 AS (SELECT k, n, bs,
     CASE WHEN (n % 8) >= 4
          THEN (((((((((xor(h2, (((bs[(o4) + 1] * 1::HUGEINT + bs[(o4) + 2] * 256::HUGEINT + bs[(o4) + 3] * 65536::HUGEINT + bs[(o4) + 4] * 16777216::HUGEINT)) * 11400714785074694791::HUGEINT) & 18446744073709551615::HUGEINT)) << 23) & 18446744073709551615::HUGEINT) | ((xor(h2, (((bs[(o4) + 1] * 1::HUGEINT + bs[(o4) + 2] * 256::HUGEINT + bs[(o4) + 3] * 65536::HUGEINT + bs[(o4) + 4] * 16777216::HUGEINT)) * 11400714785074694791::HUGEINT) & 18446744073709551615::HUGEINT)) >> 41))) * 668265295::HUGEINT + (((((((xor(h2, (((bs[(o4) + 1] * 1::HUGEINT + bs[(o4) + 2] * 256::HUGEINT + bs[(o4) + 3] * 65536::HUGEINT + bs[(o4) + 4] * 16777216::HUGEINT)) * 11400714785074694791::HUGEINT) & 18446744073709551615::HUGEINT)) << 23) & 18446744073709551615::HUGEINT) | ((xor(h2, (((bs[(o4) + 1] * 1::HUGEINT + bs[(o4) + 2] * 256::HUGEINT + bs[(o4) + 3] * 65536::HUGEINT + bs[(o4) + 4] * 16777216::HUGEINT)) * 11400714785074694791::HUGEINT) & 18446744073709551615::HUGEINT)) >> 41))) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) + 1609587929392839161::HUGEINT) & 18446744073709551615::HUGEINT
          ELSE h2 END AS h3
   FROM x_h2),
 x_h4 AS (SELECT k,
     list_reduce(list_prepend(h3,
       list_transform(generate_series(1, CAST(n % 4 AS INT)), t ->
         bs[CAST(n - (n % 4) AS INT) + t])),
       (a, b) -> (((((((xor(a, (b * 2870177450012600261::HUGEINT) & 18446744073709551615::HUGEINT)) << 11) & 18446744073709551615::HUGEINT) | ((xor(a, (b * 2870177450012600261::HUGEINT) & 18446744073709551615::HUGEINT)) >> 53))) * 2246822535::HUGEINT + (((((((xor(a, (b * 2870177450012600261::HUGEINT) & 18446744073709551615::HUGEINT)) << 11) & 18446744073709551615::HUGEINT) | ((xor(a, (b * 2870177450012600261::HUGEINT) & 18446744073709551615::HUGEINT)) >> 53))) * 2654435761::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT)) AS h4
   FROM x_h3),
 x_a1 AS (SELECT k, (((xor(h4, h4 >> 33)) * 668265295::HUGEINT + (((xor(h4, h4 >> 33)) * 3266489917::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS a2 FROM x_h4),
 x_a2 AS (SELECT k, (((xor(a2, a2 >> 29)) * 2654435833::HUGEINT + (((xor(a2, a2 >> 29)) * 374761393::HUGEINT & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS a4 FROM x_a1),
 x_out AS (SELECT k,
     CAST(CASE WHEN xor(a4, a4 >> 32) >= 9223372036854775808::HUGEINT
               THEN xor(a4, a4 >> 32) - 18446744073709551616::HUGEINT
               ELSE xor(a4, a4 >> 32) END AS BIGINT) AS h
   FROM x_a2)"""

  /** [[Xxh64LongCtes]] re-instantiated under u-prefixed CTE names
    * reading from a base CTE `t2(..., v)` — for oracles that hash twice
    * in one query (q_train_pipeline: doc id for split/mixing, epoch key
    * for packing order).
    */
  private val Xxh64LongCtes2: String =
    Xxh64LongCtes.replaceAll("\\bs(\\d+)\\b", "u$1").replace("FROM t)", "FROM t2)")

  /** The DuckDB twin of [[graft.text.TextFunctions.tokenCount]]:
    * trim every Java-\s whitespace class from both ends, split on
    * whitespace runs, count non-empty tokens; null/blank → 0.
    */
  private val TokenCountSql: String =
    """CASE WHEN trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) = '' THEN 0
            ELSE len(list_filter(string_split_regex(
              trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
              '[ \t\n\v\f\r]+'), x -> x != '')) END"""

  def oracleSql: Map[String, String] = Map(
    "q_crm_replay" -> CrmReplayGolden,
    // golden counts for the planted-corruption generator run (seeded,
    // sf-independent: PagesGen.generate(50000, 5 days) is bit-deterministic)
    "q_pages_validate_planted" ->
      """SELECT * FROM (VALUES
         ('host_in_dim', CAST(165 AS BIGINT)), ('html_when_text', 105),
         ('lang_allowed', 175), ('lang_present', 2060),
         ('text_required', 98), ('unique_url', 169),
         ('url_max_length', 51), ('url_regex', 271),
         ('url_required', 46), ('warc_ts_window', 107))
         AS t(rule_id, n)""",
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
    // StatsPass.profile's exact legs, re-derived per (part, column);
    // min/max aggregate in the NATIVE type and cast the result, matching
    // the engine's string-typed profile row
    "q_column_profile" ->
      """WITH p AS (SELECT source AS part, n_chars, lang,
                length(text) AS text_len FROM documents),
         m AS (
           SELECT part, 'n_chars' AS "column",
             count(*) AS rc,
             sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nc,
             CAST(min(n_chars) AS VARCHAR) AS mn,
             CAST(max(n_chars) AS VARCHAR) AS mx
           FROM p GROUP BY 1
           UNION ALL
           SELECT part, 'lang', count(*),
             sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
             CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
           FROM p GROUP BY 1
           UNION ALL
           SELECT part, 'text_len', count(*),
             sum(CASE WHEN text_len IS NULL THEN 1 ELSE 0 END),
             CAST(min(text_len) AS VARCHAR), CAST(max(text_len) AS VARCHAR)
           FROM p GROUP BY 1)
         SELECT part, "column",
           CAST(rc AS BIGINT) AS rowCount,
           CAST(nc AS BIGINT) AS nullCount,
           nc * 1.0 / rc AS nullRate,
           mn AS min, mx AS max
         FROM m ORDER BY part, "column"""",

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
         CAST(sum(length(regexp_split_to_array(trim(text), '[ \t\n\v\f\r]+'))) AS BIGINT) AS tokens,
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
    // Row-level exact dedup re-derived over the LITERAL canonical strings
    // (lowercase + \s+ collapse + trim — the fingerprint's exact
    // canonicalization); the filler suffix ' #doc_id' keeps every
    // non-planted doc group-free, so both engines agree on the group set
    // without needing whitespace-class parity over corpus text
    "q_dedup_rows" ->
      """WITH d AS (
           SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN
               CASE WHEN doc_id % 20 = 0 THEN 'Shared  Body ' || (doc_id // 100)
                    ELSE 'shared body ' || (doc_id // 100) END
             ELSE coalesce(text, '') || ' #' || doc_id END AS t
           FROM documents),
         c AS (SELECT doc_id,
             regexp_replace(lower(trim(t)), '\s+', ' ', 'g') AS ct
           FROM d),
         g AS (SELECT ct, count(*) AS n, min(doc_id) AS keep_id
           FROM c GROUP BY ct HAVING count(*) > 1)
         SELECT c.doc_id, g.n, g.keep_id, c.doc_id = g.keep_id AS keep
         FROM c JOIN g USING (ct) ORDER BY doc_id""",
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
    // timezone(tz, TIMESTAMP) interprets the naive value as tz wall time
    // (→ TIMESTAMPTZ); timezone(tz, TIMESTAMPTZ) renders the instant as tz
    // wall time (→ TIMESTAMP) — the pair is session-TimeZone-independent
    "q_make_aware" ->
      """SELECT event_id,
         timezone('UTC', timezone('Europe/Amsterdam', ts)) AS ts_utc,
         timezone('Europe/Amsterdam',
                  timezone('Europe/Amsterdam', ts)) AS ts_back
         FROM events WHERE event_id % 37 = 0""",
    "q_nested_path" ->
      """SELECT c_custkey AS key, c_name AS name, c_mktsegment AS segment,
         CAST(c_acctbal AS DOUBLE) AS balance
         FROM customer WHERE c_acctbal < 0""",
    "q_bulk_overwrite" ->
      """SELECT event_id, ts, user_id, event_type FROM events
         WHERE event_id % 11 = 0""",
    "q_filter_defaults" ->
      """SELECT 'default' AS scenario, count(*) AS n FROM orders
         WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT 'explicit_same_key', count(*) FROM orders
         WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT 'explicit_other_key', count(*) FROM orders
         WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'""",
    "q_upsert_merge" ->
      """WITH b1 AS (SELECT * FROM events WHERE event_id % 3 != 0),
              b2 AS (SELECT * FROM events WHERE event_id % 2 = 0),
              w1 AS (SELECT *, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC) rn FROM b1),
              w2 AS (SELECT *, row_number() OVER
                       (PARTITION BY user_id ORDER BY ts DESC) rn FROM b2)
         SELECT user_id, event_id, ts, event_type FROM w2 WHERE rn = 1
         UNION ALL
         SELECT user_id, event_id, ts, event_type FROM w1
          WHERE rn = 1
            AND user_id NOT IN (SELECT user_id FROM b2)""",
    "q_or_between" ->
      """SELECT o_orderstatus AS status, count(*) AS n,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_urgent
         FROM orders
         WHERE o_totalprice BETWEEN 1000 AND 2000
            OR o_orderpriority = '1-URGENT'
         GROUP BY 1""",
    "q_icontains" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE lower(c_name) LIKE '%er%'""",
    "q_search_multi" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE lower(coalesce(p_name, '')) LIKE '%ar%'
            OR lower(coalesce(p_type, '')) LIKE '%ar%'""",
    "q_filter_dispatch" ->
      """SELECT 'OPEN' AS status, count(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'O')
         UNION ALL
         SELECT 'ORDERS', count(*) FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         UNION ALL
         SELECT 'OVERDUE', count(*) FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'P'
                        AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00')
         UNION ALL
         SELECT 'PENDING', count(*) FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderstatus = 'P')
         UNION ALL
         SELECT 'NO_SUCH_STATUS', count(*) FROM customer""",
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
         FROM orders GROUP BY 1, 2""",
    "q_quantiles" ->
      """SELECT o_orderstatus,
         quantile_cont(o_totalprice, 0.25) AS p25,
         quantile_cont(o_totalprice, 0.5)  AS p50,
         quantile_cont(o_totalprice, 0.75) AS p75,
         quantile_cont(o_totalprice, 0.99) AS p99,
         count(*) AS n
         FROM orders GROUP BY 1""",
    "q_array_tags" ->
      """SELECT tag, count(*) AS n FROM (
           SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tag
           FROM part WHERE list_contains(string_split(p_name, ' '), 'small'))
         GROUP BY 1""",
    "q_pagination_offset" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 25 OFFSET 50""",
    "q_ann_brute" -> AnnBruteSql,
    "q_ann_lsh" -> AnnBruteSql,
    "q_ann_ivf" -> AnnBruteSql,
    "q_ann_ivf_hier" -> AnnBruteSql,
    "q_multimodal_features" ->
      """SELECT doc_id AS id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         text IS NOT NULL AS ok,
         CAST(CASE WHEN text IS NOT NULL THEN 8 ELSE 0 END AS INT) AS featureDim
         FROM documents""",
    "q_invoice_opens" ->
      """SELECT user_id, count(*) AS n_opens,
         min(ts) AS first_open, max(ts) AS last_open
         FROM events WHERE event_type = 'view' GROUP BY 1""",
    // fixture mirror (see CrmFixtures COUPLING note): invoices + opens as
    // VALUES, the read model re-derived with the same left join
    "q_invoice_first_opens" ->
      """WITH inv(id, state) AS (VALUES
           (1, 'unpaid'), (2, 'unpaid'), (3, 'paid'), (4, 'paid'),
           (5, 'bogus'), (6, 'unpaid'), (7, 'draft')),
         opens(id, invoice_id, opened) AS (VALUES
           (1, 1, TIMESTAMP '2017-05-18 09:00:00'),
           (2, 1, TIMESTAMP '2017-05-18 10:30:00'),
           (3, 1, TIMESTAMP '2017-05-20 08:00:00'),
           (4, 2, TIMESTAMP '2017-05-19 14:00:00'),
           (5, 4, TIMESTAMP '2017-05-10 12:00:00'),
           (6, 4, TIMESTAMP '2017-05-10 12:05:00'))
         SELECT CAST(i.id AS BIGINT) AS invoice_id, i.state,
           CAST(count(o.id) AS BIGINT) AS n_opens,
           min(o.opened) AS first_open, max(o.opened) AS last_open
         FROM inv i LEFT JOIN opens o ON o.invoice_id = i.id
         GROUP BY 1, 2 ORDER BY 1""",
    "q_point_lookup" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE c_custkey = 42""",
    // fixcustomers re-derived: fixture rows as VALUES (see CrmFixtures
    // COUPLING note), email classification via the same F6 regex
    "q_repair_emails" ->
      """WITH cust(id, name, invoice_email) AS (VALUES
           (1, 'Bob Smith', 'bob@x.com'),
           (2, 'Eve Jones&Co', ''),
           (3, 'WRONG NAME', 'al@x.com'),
           (4, 'Cy Dale', 'cy@x.com')),
         con(id, name, details, customer_id) AS (VALUES
           (1, 'Home', '01234 567890', 1),
           (2, 'Home', '07123 456789', 1),
           (3, 'Home', '01234 111222', 2),
           (4, 'Mail', 'eve@x.com', 2)),
         e AS (
           SELECT customer_id, count(*) AS n, max(details) AS email
           FROM con WHERE regexp_matches(details, '^[^@]+@[^@]+\.[^@]+')
           GROUP BY 1)
         SELECT c.id AS customer_id, c.name, e.email AS new_invoice_email
         FROM cust c JOIN e ON e.customer_id = c.id AND e.n = 1
         WHERE c.invoice_email = ''""",
    "q_string_functions" ->
      """WITH i AS (
           SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0
               THEN lower(replace(c_name, '#', '')) || '@pets.example'
               ELSE c_name END AS email,
             c_name || chr(10) || c_mktsegment || chr(13) || chr(10) || ' tail'
               AS multi,
             CASE WHEN c_custkey % 3 = 0 THEN 'Dr. ' || c_name
                  WHEN c_custkey % 3 = 1 THEN 'Professor ' || c_name
                  ELSE c_name END AS titled,
             c_name
           FROM customer)
         SELECT c_custkey,
           coalesce(regexp_matches(email, '^[^@\s]+@[^@\s]+\.[^@\s]+$'),
             FALSE) AS email_ok,
           CASE WHEN regexp_matches(email, '^[^@\s]+@[^@\s]+\.[^@\s]+$')
             THEN '<a href="mailto:' || email || '">' || email || '</a>'
             ELSE email END AS mailto,
           substring(rpad(c_name, 300, 'x'), 1, 255) AS truncated,
           replace(replace(c_name, '#', '_'), '_', ' ') AS unslugged,
           regexp_replace(multi, '\r\n|\r|\n', ', ', 'g') AS joined,
           trim(regexp_replace(multi, '(?m)(^\s+|[\n\r]+)', '', 'g'))
             AS minimized,
           regexp_replace(titled,
             '(?i)^(Sir|Madam|Mr|Mrs|Ms|Miss|Dr|Professor)\.?\s+', '')
             AS stripped
         FROM i""",
    // resize re-derivation: same double-precision fit arithmetic
    // (floor(x+0.5) == Java Math.round for positives; trunc == .toInt)
    "q_multimodal_resize" ->
      """WITH m AS (
           SELECT doc_id AS id, text,
             CAST(doc_id * 7 % 1920 + 1 AS INT) AS w,
             CAST(doc_id * 13 % 1080 + 1 AS INT) AS h,
             octet_length(encode(text)) AS len
           FROM documents WHERE doc_id % 3 = 0),
         s AS (
           SELECT id, text, w, h, len,
             least(1.0, 256.0 / greatest(w, h)) AS scale
           FROM m)
         SELECT id,
           text IS NOT NULL AS ok,
           CAST(CASE WHEN text IS NULL THEN 0
                ELSE greatest(1, CAST(floor(w * scale + 0.5) AS BIGINT)) END
             AS INT) AS width,
           CAST(CASE WHEN text IS NULL THEN 0
                ELSE greatest(1, CAST(floor(h * scale + 0.5) AS BIGINT)) END
             AS INT) AS height,
           CAST(CASE WHEN text IS NULL THEN 0
                ELSE greatest(1, least(len,
                  CAST(trunc(len * scale * scale) AS BIGINT))) END
             AS INT) AS n_bytes
         FROM s""",
    "q_frame_samples" ->
      """SELECT doc_id AS id,
         CAST(ts_ms // 1000 AS BIGINT) AS frame_no,
         CAST(ts_ms AS BIGINT) AS ts_ms
         FROM documents,
           unnest(range(0, CAST(doc_id * 17 % 60000 + 1 AS BIGINT), 1000))
             AS t(ts_ms)
         WHERE doc_id % 3 = 2""",
    // S6 invoice e-mail render, independently RE-DERIVED in SQL: the CRM
    // fixture rows ride along as VALUES (same golden-coupling discipline
    // as q_crm_replay) and DuckDB recomputes the sendable set, charge
    // totals, due-defaulting, and the full template body.
    // COUPLING: the inv/cust/chg VALUES mirror CrmFixtures.scala — edit
    // both together (see the warning on CrmFixtures' scaladoc). Same for
    // q_customer_balances below.
    "q_invoice_emails" ->
      """WITH inv(id, customer_id, state, due, adjustment) AS (VALUES
           (1, 1, 'unpaid', DATE '2017-05-20', CAST(0.00 AS DECIMAL(14,2))),
           (2, 1, 'unpaid', DATE '2017-05-22', CAST(0.00 AS DECIMAL(14,2))),
           (3, 1, 'paid',   DATE '2017-05-01', CAST(0.00 AS DECIMAL(14,2))),
           (4, 2, 'paid',   DATE '2017-05-01', CAST(10.00 AS DECIMAL(14,2))),
           (5, 1, 'bogus',  CAST(NULL AS DATE), CAST(0.00 AS DECIMAL(14,2))),
           (6, 999, 'unpaid', DATE '2017-05-25', CAST(0.00 AS DECIMAL(14,2))),
           (7, 1, 'draft',  CAST(NULL AS DATE), CAST(0.00 AS DECIMAL(14,2)))),
         cust(id, name, invoice_email, last_name) AS (VALUES
           (1, 'Bob Smith', 'bob@x.com', 'Smith'),
           (2, 'Eve Jones&Co', '', 'Jones&Co'),
           (3, 'WRONG NAME', 'al@x.com', 'Brown'),
           (4, 'Cy Dale', 'cy@x.com', 'Dale')),
         chg(invoice_id, line, quantity) AS (VALUES
           (1, CAST(5.00 AS DECIMAL(14,2)), 1),
           (1, CAST(15.00 AS DECIMAL(14,2)), 2),
           (3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (4, CAST(10.00 AS DECIMAL(14,2)), 1),
           (4, CAST(10.00 AS DECIMAL(14,2)), 1),
           (4, CAST(10.00 AS DECIMAL(14,2)), 1)),
         sub AS (SELECT invoice_id, sum(line*quantity) AS s FROM chg GROUP BY 1),
         r AS (
           SELECT i.id AS invoice_id,
             printf('INV-%03d', i.id) AS name,
             c.name AS cname, c.invoice_email AS email,
             coalesce(i.due, CAST(DATE '2017-05-21' + INTERVAL 7 DAY AS DATE)) AS due,
             CAST(coalesce(sub.s, 0) + i.adjustment AS DECIMAL(14,2)) AS total
           FROM inv i JOIN cust c ON i.customer_id = c.id
           LEFT JOIN sub ON sub.invoice_id = i.id
           WHERE i.state IN ('draft','unpaid')
             AND c.invoice_email <> '' AND c.last_name NOT LIKE '%&%')
         SELECT invoice_id,
           'Invoice ' || name || ' - Stretch there legs' AS subject,
           cname || ' <' || email || '>' AS sent_to,
           'Hi ' || cname || ',' || chr(10) || chr(10) ||
             'Please find attached your latest invoice ' || name || '.' || chr(10) ||
             'Payment of ' || CAST(total AS VARCHAR) || ' is due ' ||
             CAST(due AS VARCHAR) || '.' || chr(10) || chr(10) ||
             'Kind regards,' || chr(10) || 'Stef Dua' || chr(10) || chr(10) ||
             'Owner' || chr(10) || 'Stretch Their Legs' || chr(10) || chr(10) ||
             '07712 613 763' || chr(10) || 'stef@stretchtheirlegs.co.uk' ||
             chr(10) || 'www.stretchtheirlegs.co.uk' AS body,
           CAST(total AS DOUBLE) AS total, due
         FROM r""",
    // Default customer queryset re-derived: same VALUES fixture, same
    // joined-row semantics (the adjustment fanout double-count included)
    "q_customer_balances" ->
      """WITH inv(id, customer_id, state, due, adjustment) AS (VALUES
           (1, 1, 'unpaid', DATE '2017-05-20', CAST(0.00 AS DECIMAL(14,2))),
           (2, 1, 'unpaid', DATE '2017-05-22', CAST(0.00 AS DECIMAL(14,2))),
           (3, 1, 'paid',   DATE '2017-05-01', CAST(0.00 AS DECIMAL(14,2))),
           (4, 2, 'paid',   DATE '2017-05-01', CAST(10.00 AS DECIMAL(14,2))),
           (5, 1, 'bogus',  CAST(NULL AS DATE), CAST(0.00 AS DECIMAL(14,2))),
           (6, 999, 'unpaid', DATE '2017-05-25', CAST(0.00 AS DECIMAL(14,2))),
           (7, 1, 'draft',  CAST(NULL AS DATE), CAST(0.00 AS DECIMAL(14,2)))),
         cust(id, name) AS (VALUES
           (1, 'Bob Smith'), (2, 'Eve Jones&Co'),
           (3, 'WRONG NAME'), (4, 'Cy Dale')),
         chg(id, customer_id, invoice_id, line, quantity) AS (VALUES
           (100, 1, NULL, CAST(20.00 AS DECIMAL(14,2)), 1),
           (101, 1, NULL, CAST(50.00 AS DECIMAL(14,2)), 1),
           (102, 1, NULL, CAST(-30.00 AS DECIMAL(14,2)), 1),
           (103, 1, NULL, CAST(-30.00 AS DECIMAL(14,2)), 1),
           (104, 1, NULL, CAST(40.00 AS DECIMAL(14,2)), 1),
           (105, 1, NULL, CAST(-10.00 AS DECIMAL(14,2)), 1),
           (106, 1, 1, CAST(5.00 AS DECIMAL(14,2)), 1),
           (107, 1, 3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (108, 1, 3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (109, 1, 3, CAST(10.00 AS DECIMAL(14,2)), 1),
           (110, 2, 4, CAST(10.00 AS DECIMAL(14,2)), 1),
           (111, 2, 4, CAST(10.00 AS DECIMAL(14,2)), 1),
           (112, 2, 4, CAST(10.00 AS DECIMAL(14,2)), 1),
           (113, 1, 1, CAST(15.00 AS DECIMAL(14,2)), 2)),
         bal AS (
           SELECT c.id AS customer_id, c.name,
             CAST(coalesce(sum(i.adjustment), 0)
               + coalesce(sum(ch.line * ch.quantity)
                   FILTER (i.state = 'unpaid'), 0) AS DOUBLE)
               AS invoiced_unpaid,
             count(DISTINCT i.id) FILTER (i.state = 'unpaid')
               AS unpaid_count,
             count(DISTINCT i.id) FILTER (i.state = 'unpaid'
               AND i.due IS NOT NULL AND i.due < DATE '2017-05-21')
               AS overdue_count
           FROM cust c
           LEFT JOIN inv i ON i.customer_id = c.id
           LEFT JOIN chg ch ON ch.invoice_id = i.id
           GROUP BY 1, 2),
         uninv AS (
           SELECT customer_id, count(*) AS n FROM chg
           WHERE invoice_id IS NULL GROUP BY 1)
         SELECT b.customer_id, b.name, b.invoiced_unpaid, b.unpaid_count,
           b.overdue_count, coalesce(u.n, 0) AS uninvoiced_count
         FROM bal b LEFT JOIN uninv u ON u.customer_id = b.customer_id""",

    // §3.1 nested customer document re-derived: per-relation
    // list(struct_pack(...) ORDER BY id) rendered to JSON — byte-equal to
    // Spark's to_json(array<struct>) on null-free fields. Same VALUES
    // fixture rows as CrmFixtures (pet 3 / booking 21 belong to customer
    // 999 and vanish via the join; customer 4 has no children and gets
    // '[]' everywhere).
    "q_customer_nested" ->
      """WITH cust(id, name, invoice_email) AS (VALUES
           (1, 'Bob Smith', 'bob@x.com'), (2, 'Eve Jones&Co', ''),
           (3, 'WRONG NAME', 'al@x.com'), (4, 'Cy Dale', 'cy@x.com')),
         pets(id, name, customer_id, sex, neutered) AS (VALUES
           (1, 'Rex', 1, 'male', 'yes'), (2, 'Fi', 2, 'female', 'no'),
           (3, 'Gus', 999, 'male', 'yes'), (4, 'Hex', 1, 'other', 'yes'),
           (5, 'P5', 1, 'male', 'yes'), (6, 'P6', 1, 'female', 'yes'),
           (7, 'P7', 1, 'male', 'implant'), (8, 'P8', 1, 'female', 'yes'),
           (9, 'P9', 1, 'male', 'yes'), (10, 'P10', 3, 'female', 'yes')),
         con(id, name, details, customer_id) AS (VALUES
           (1, 'Home', '01234 567890', 1), (2, 'Home', '07123 456789', 1),
           (3, 'Home', '01234 111222', 2), (4, 'Mail', 'eve@x.com', 2)),
         bk(id, customer_id, s, e, state) AS (VALUES
           (1, 1, TIMESTAMP '2017-05-20 10:00:00', TIMESTAMP '2017-05-20 11:00:00', 'confirmed'),
           (2, 1, TIMESTAMP '2017-05-20 09:00:00', TIMESTAMP '2017-05-20 09:30:00', 'confirmed'),
           (3, 2, TIMESTAMP '2017-05-20 10:00:00', TIMESTAMP '2017-05-20 11:00:00', 'canceled'),
           (4, 2, TIMESTAMP '2017-05-20 09:00:00', TIMESTAMP '2017-05-20 09:30:00', 'canceled'),
           (5, 1, TIMESTAMP '2017-05-20 23:00:00', TIMESTAMP '2017-05-20 22:00:00', 'confirmed'),
           (6, 1, TIMESTAMP '2017-05-19 10:00:00', TIMESTAMP '2017-05-19 11:00:00', 'bogus'),
           (7, 1, TIMESTAMP '2017-05-20 14:00:00', TIMESTAMP '2017-05-20 15:00:00', 'confirmed'),
           (12, 1, TIMESTAMP '2017-05-20 16:00:00', TIMESTAMP '2017-05-20 17:00:00', 'confirmed'),
           (13, 2, TIMESTAMP '2017-05-20 16:00:00', TIMESTAMP '2017-05-20 17:00:00', 'confirmed'),
           (14, 3, TIMESTAMP '2017-05-20 16:00:00', TIMESTAMP '2017-05-20 17:00:00', 'confirmed'),
           (15, 1, TIMESTAMP '2017-05-20 18:00:00', TIMESTAMP '2017-05-20 19:00:00', 'confirmed'),
           (16, 2, TIMESTAMP '2017-05-20 18:00:00', TIMESTAMP '2017-05-20 19:00:00', 'confirmed'),
           (17, 1, TIMESTAMP '2017-05-20 20:00:00', TIMESTAMP '2017-05-20 20:30:00', 'confirmed'),
           (18, 2, TIMESTAMP '2017-05-20 20:15:00', TIMESTAMP '2017-05-20 20:45:00', 'confirmed'),
           (19, 1, TIMESTAMP '2017-05-20 22:00:00', TIMESTAMP '2017-05-20 23:00:00', 'confirmed'),
           (20, 3, TIMESTAMP '2017-05-22 10:00:00', TIMESTAMP '2017-05-22 11:00:00', 'completed'),
           (21, 999, TIMESTAMP '2017-05-19 10:00:00', TIMESTAMP '2017-05-19 11:00:00', 'confirmed'),
           (22, 1, TIMESTAMP '2017-05-19 12:00:00', TIMESTAMP '2017-05-19 13:00:00', 'confirmed')),
         pa AS (
           SELECT customer_id, to_json(list(struct_pack(
               pet_id := id, name := name, sex := sex, neutered := neutered)
             ORDER BY id)) AS pets_json
           FROM pets GROUP BY 1),
         ca AS (
           SELECT customer_id, to_json(list(struct_pack(
               contact_id := id, name := name, details := details)
             ORDER BY id)) AS contacts_json
           FROM con GROUP BY 1),
         ba AS (
           SELECT customer_id, to_json(list(struct_pack(
               booking_id := id,
               start := strftime(s, '%Y-%m-%d %H:%M:%S'),
               "end" := strftime(e, '%Y-%m-%d %H:%M:%S'),
               state := state)
             ORDER BY id)) AS bookings_json
           FROM bk GROUP BY 1)
         SELECT c.id AS customer_id, c.name, c.invoice_email,
           coalesce(pa.pets_json, '[]') AS pets_json,
           coalesce(ca.contacts_json, '[]') AS contacts_json,
           coalesce(ba.bookings_json, '[]') AS bookings_json
         FROM cust c
         LEFT JOIN pa ON pa.customer_id = c.id
         LEFT JOIN ca ON ca.customer_id = c.id
         LEFT JOIN ba ON ba.customer_id = c.id
         ORDER BY customer_id""",

    // F16 humanized dates — the humanize branch tree re-expressed as CASE
    "q_natural_dates" ->
      """WITH d AS (
           SELECT o_orderdate AS dt,
             datediff('day', DATE '1995-06-15', o_orderdate) AS delta
           FROM orders),
         n AS (
           SELECT
             CASE WHEN delta = 0 THEN 'today'
                  WHEN delta = 1 THEN 'tomorrow'
                  WHEN delta = -1 THEN 'yesterday'
                  WHEN abs(delta) >= 365 THEN strftime(dt, '%b %d %Y')
                  ELSE strftime(dt, '%b %d') END AS nat_date,
             abs(delta) AS days,
             abs(delta) // 365 AS years,
             abs(delta) % 365 AS rem,
             CAST(floor((abs(delta) % 365) / 30.5) AS BIGINT) AS months
           FROM d),
         a AS (
           SELECT nat_date,
             CASE
               WHEN days = 0 THEN 'a moment'
               WHEN years = 0 AND days = 1 THEN 'a day'
               WHEN years = 0 AND months = 0 THEN days || ' days'
               WHEN years = 0 AND months = 1 THEN 'a month'
               WHEN years = 0 THEN months || ' months'
               WHEN years = 1 AND months = 0 AND rem = 0 THEN 'a year'
               WHEN years = 1 AND months = 0 AND rem = 1 THEN '1 year, 1 day'
               WHEN years = 1 AND months = 0 THEN '1 year, ' || rem || ' days'
               WHEN years = 1 AND months = 1 THEN '1 year, 1 month'
               WHEN years = 1 THEN '1 year, ' || months || ' months'
               ELSE years || ' years' END AS age,
             -- precisedelta, min_unit=minutes: whole-day inputs have no
             -- hour/minute remainder, so components are years/months/days;
             -- dd is the %d-truncated fractional-month remainder
             CAST(floor((rem - months * 30.5)) AS BIGINT) AS dd,
             years, months, days
           FROM n),
         p AS (
           SELECT nat_date, age,
             concat_ws(', ',
               CASE WHEN years = 1 THEN '1 year'
                    WHEN years > 1 THEN years || ' years' END,
               CASE WHEN months = 1 THEN '1 month'
                    WHEN months > 1 THEN months || ' months' END,
               CASE WHEN dd = 1 THEN '1 day'
                    WHEN dd > 1 THEN dd || ' days' END) AS joined
           FROM a)
         SELECT nat_date, age,
           CASE WHEN joined = '' THEN '0 minutes'
                ELSE regexp_replace(joined, ',([^,]*)$', ' and\1') END
             AS age_precise,
           count(*) AS n
         FROM p GROUP BY 1, 2, 3""",
    // WHITESPACE PARITY (all text oracles): the engine's tokenizers use
    // Java regex \s = [ \t\n\x0B\f\r]; RE2's \s EXCLUDES vertical tab, so
    // every DuckDB-side split/trim/class below spells the Java set out
    // explicitly ('[ \t\n\v\f\r]+', trim char list with chr(11)/chr(12))
    // — a \x0B in a document diverges under a bare '\s' oracle.
    // exact all-pairs word-3-gram Jaccard — ground truth for the LSH paths
    // (see q_minhash_lsh comment for why recall is exactly 1 here)
    "q_minhash_lsh" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks),
         pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT a_id, b_id, i * 1.0 / u AS jaccard
         FROM pairs WHERE u > 0 AND i * 1.0 / u >= 0.35""",
    "q_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(string_split(coalesce(text, ''), chr(10)),
               l -> trim(l) != '') AS lines,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []::VARCHAR[]
                  ELSE list_filter(string_split_regex(
                    trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') END AS ws
           FROM documents),
         g AS (
           SELECT doc_id, lines,
             CASE WHEN len(ws) < 3 THEN []::VARCHAR[]
                  ELSE list_transform(generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END AS grams
           FROM t)
         SELECT doc_id,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines) END AS dup_line_frac,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE (len(grams) - len(list_distinct(grams))) * 1.0
                     / len(grams) END AS dup_3gram_frac
         FROM g""",
    // canonical-url + PII-mask chains re-derived step-for-step (DuckDB
    // regexp_replace needs the explicit 'g' flag where Spark is global)
    // corpus-filter verdict table re-derived per (source, rule): token
    // count (full-\s-trim split), dup-line/dup-3-gram fractions
    // (q_repetition's formulas), quality (q_text_quality's formula,
    // rounded to 4 so the threshold compares a bit-stable value), and the
    // engine's exact fire conditions (Required: IS NULL; Allowed: NOT NULL
    // AND NOT IN; ExprRule: NOT coalesce(pred, FALSE))
    // exact components as min-reachable-id via a RECURSIVE CTE over the
    // exact-Jaccard pair graph (same pair derivation as q_minhash_lsh)
    "q_dedup_components" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks),
         cp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         gp AS (SELECT a_id, b_id FROM cp
           WHERE u > 0 AND i * 1.0 / u >= 0.35),
         edges AS (SELECT a_id AS a, b_id AS b FROM gp
           UNION SELECT b_id, a_id FROM gp),
         nodes AS (SELECT DISTINCT a AS id FROM edges),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT rc.id, e.b FROM reach rc JOIN edges e ON e.a = rc.r)
         SELECT id, CAST(min(r) AS BIGINT) AS comp
         FROM reach GROUP BY id ORDER BY id""",

    // same cluster derivation as q_dedup_components, then the keeper:
    // highest char-length member per cluster (ties -> min id); docs
    // outside the pair graph are singleton clusters of themselves
    "q_dedup_keeper" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks),
         cp AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
         gp AS (SELECT a_id, b_id FROM cp
           WHERE u > 0 AND i * 1.0 / u >= 0.35),
         edges AS (SELECT a_id AS a, b_id AS b FROM gp
           UNION SELECT b_id, a_id FROM gp),
         nodes AS (SELECT DISTINCT a AS id FROM edges),
         reach(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT rc.id, e.b FROM reach rc JOIN edges e ON e.a = rc.r),
         comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         lab AS (SELECT d.doc_id AS id,
             CAST(coalesce(c.comp, d.doc_id) AS BIGINT) AS comp,
             CAST(length(coalesce(d.text, '')) AS BIGINT) AS score
           FROM documents d LEFT JOIN comps c ON c.id = d.doc_id)
         SELECT id, comp, score,
           (row_number() OVER (PARTITION BY comp ORDER BY score DESC, id ASC) = 1) AS keep
         FROM lab ORDER BY id""",

    // k=8 token windows as literal strings; a window is duplicated iff
    // its exact token sequence occurs in >= 2 DISTINCT docs (within-doc
    // repeats alone don't count). Docs with < 8 tokens have 0 windows.
    "q_repeated_spans" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM documents),
         wins AS (SELECT doc_id, unnest(list_transform(
             generate_series(1, len(ws) - 7),
             i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS span
           FROM toks WHERE len(ws) >= 8),
         docspans AS (SELECT DISTINCT doc_id, span FROM wins),
         dup AS (SELECT span FROM docspans GROUP BY span HAVING count(*) >= 2),
         cov AS (SELECT w.doc_id, count(*) AS dup_w FROM wins w
           JOIN dup USING (span) GROUP BY w.doc_id),
         tot AS (SELECT doc_id,
             CASE WHEN len(ws) >= 8 THEN len(ws) - 7 ELSE 0 END AS n_w
           FROM toks)
         SELECT t.doc_id AS id,
           CAST(t.n_w AS BIGINT) AS n_windows,
           CAST(coalesce(c.dup_w, 0) AS BIGINT) AS dup_windows,
           CASE WHEN t.n_w = 0 THEN 0.0
                ELSE coalesce(c.dup_w, 0) * 1.0 / t.n_w END AS dup_fraction
         FROM tot t LEFT JOIN cov c USING (doc_id) ORDER BY id""",

    // the rewrite re-derived literally: duplicated 8-token spans (>= 2
    // distinct docs), owner = min doc_id per span; removed = non-owner
    // covered positions MINUS owner-covered positions (ownership
    // protects); untouched docs pass through byte-identical, touched
    // docs re-join kept tokens by single spaces in position order
    "q_span_removal" ->
      """WITH toks0 AS (SELECT doc_id, text, list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM documents),
         w0 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i1
           FROM toks0 WHERE len(ws) >= 8),
         wins AS (SELECT doc_id, i1 - 1 AS i0,
             array_to_string(list_slice(ws, i1, i1 + 7), ' ') AS span FROM w0),
         dup AS (SELECT span, min(doc_id) AS owner
           FROM (SELECT DISTINCT doc_id, span FROM wins)
           GROUP BY span HAVING count(*) >= 2),
         cov AS (SELECT DISTINCT doc_id, pos FROM (
             SELECT w.doc_id, unnest(generate_series(w.i0, w.i0 + 7)) AS pos
             FROM wins w JOIN dup d USING (span) WHERE w.doc_id != d.owner)),
         ownp AS (SELECT DISTINCT doc_id, pos FROM (
             SELECT w.doc_id, unnest(generate_series(w.i0, w.i0 + 7)) AS pos
             FROM wins w JOIN dup d USING (span) WHERE w.doc_id = d.owner)),
         rem AS (SELECT c.doc_id, c.pos FROM cov c
           LEFT JOIN ownp o ON o.doc_id = c.doc_id AND o.pos = c.pos
           WHERE o.doc_id IS NULL),
         remc AS (SELECT doc_id, count(*) AS rm FROM rem GROUP BY doc_id),
         t1 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p1
           FROM toks0 WHERE doc_id IN (SELECT doc_id FROM remc)),
         toksp AS (SELECT doc_id, p1 - 1 AS pos, ws[p1] AS tok FROM t1),
         kept AS (SELECT t.doc_id, t.pos, t.tok FROM toksp t
           LEFT JOIN rem c ON c.doc_id = t.doc_id AND c.pos = t.pos
           WHERE c.doc_id IS NULL),
         agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*) AS keptn FROM kept GROUP BY doc_id)
         SELECT d.doc_id,
           CASE WHEN r.doc_id IS NOT NULL THEN coalesce(a.clean_text, '')
                ELSE d.text END AS clean_text,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE CAST(coalesce(r.rm, 0) AS BIGINT) END AS tokens_removed
         FROM toks0 d
         LEFT JOIN remc r USING (doc_id)
         LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // train-side 13-token windows vs the DISTINCT eval window set,
    // literal strings; counts are train-window OCCURRENCES (the
    // q_repeated_spans coverage semantics)
    "q_ngram_contamination" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM documents),
         wins AS (SELECT doc_id, unnest(list_transform(
             generate_series(1, len(ws) - 12),
             i -> array_to_string(list_slice(ws, i, i + 12), ' '))) AS span
           FROM toks WHERE len(ws) >= 13),
         ev AS (SELECT DISTINCT span FROM wins WHERE doc_id % 17 = 0),
         hit AS (SELECT doc_id, count(*) AS c FROM wins JOIN ev USING (span)
           WHERE doc_id % 17 != 0 GROUP BY doc_id),
         tot AS (SELECT doc_id, CASE WHEN len(ws) >= 13 THEN len(ws) - 12 ELSE 0 END AS n_w
           FROM toks WHERE doc_id % 17 != 0)
         SELECT t.doc_id AS t_id, CAST(t.n_w AS BIGINT) AS n_windows,
           CAST(coalesce(h.c, 0) AS BIGINT) AS shared_windows,
           coalesce(h.c, 0) > 0 AS contaminated
         FROM tot t LEFT JOIN hit h USING (doc_id) ORDER BY t_id""",

    // paragraph units = literal double-newline split, matched trimmed,
    // re-joined with the same separator; thresholds as in q_line_dedup
    "q_paragraph_dedup" ->
      """WITH docs AS (SELECT doc_id, concat_ws(chr(10) || chr(10),
             ['Follow us on social media' || chr(10) || 'All rights reserved.',
              'Subscribe for updates' || chr(10) || 'Unsubscribe anytime',
              'About us' || chr(10) || 'Careers' || chr(10) || 'Contact'][CAST(doc_id % 3 AS INT) + 1],
             text,
             CASE WHEN doc_id < 4 THEN 'Rare promo' || chr(10) || 'Limited time' END,
             CASE WHEN doc_id < 5 THEN 'Five banner' || chr(10) || 'Exactly five' END,
             'unique tail ' || doc_id) AS text
           FROM documents),
         ls AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ll FROM docs),
         l AS (SELECT doc_id, ll, unnest(generate_series(1, len(ll))) AS pos FROM ls),
         n AS (SELECT doc_id, pos, ll[pos] AS unit, trim(ll[pos]) AS nrm FROM l),
         common AS (SELECT nrm FROM (SELECT DISTINCT doc_id, nrm FROM n WHERE nrm != '')
           GROUP BY nrm HAVING count(*) >= 5),
         kept AS (SELECT doc_id, pos, unit FROM n
           WHERE nrm = '' OR nrm NOT IN (SELECT nrm FROM common)),
         agg AS (SELECT doc_id,
             string_agg(unit, chr(10) || chr(10) ORDER BY pos) AS clean_text,
             count(*) AS keptn FROM kept GROUP BY doc_id)
         SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
           CAST(len(string_split(d.text, chr(10) || chr(10))) - coalesce(a.keptn, 0) AS BIGINT) AS n_removed
         FROM docs d LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // line-level removal re-derived literally: same planted construction
    // (concat_ws skips the NULL CASE arms on both engines), lines =
    // split on \n, a line is removed iff its trimmed text occurs in
    // >= 5 distinct docs, blanks never matched, order preserved
    "q_line_dedup" ->
      """WITH docs AS (SELECT doc_id, concat_ws(chr(10),
             ['Terms of service apply.','All rights reserved.','Privacy policy','Sign in to continue','Powered by ExampleCMS','Back to top','Share this page'][CAST(doc_id % 7 AS INT) + 1],
             text, '',
             ['Cookie notice','Subscribe to our newsletter','Contact us'][CAST(doc_id % 3 AS INT) + 1],
             CASE WHEN doc_id < 4 THEN 'Rare banner line' END,
             CASE WHEN doc_id < 5 THEN 'Exactly five banner' END,
             'doc ' || doc_id) AS text
           FROM documents),
         ls AS (SELECT doc_id, string_split(text, chr(10)) AS ll FROM docs),
         l AS (SELECT doc_id, ll, unnest(generate_series(1, len(ll))) AS pos FROM ls),
         n AS (SELECT doc_id, pos, ll[pos] AS line, trim(ll[pos]) AS nrm FROM l),
         common AS (SELECT nrm FROM (SELECT DISTINCT doc_id, nrm FROM n WHERE nrm != '')
           GROUP BY nrm HAVING count(*) >= 5),
         kept AS (SELECT doc_id, pos, line FROM n
           WHERE nrm = '' OR nrm NOT IN (SELECT nrm FROM common)),
         agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS keptn FROM kept GROUP BY doc_id)
         SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
           CAST(len(string_split(d.text, chr(10))) - coalesce(a.keptn, 0) AS BIGINT) AS n_removed
         FROM docs d LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // the composed rewrite: the q_line_dedup pass (minDocs=5 footer
    // removal) feeds the q_span_removal pass (k=8 windows over the
    // line-cleaned token stream) — both re-derived literally in sequence
    "q_rewrite_compose" ->
      """WITH docs AS (SELECT doc_id, concat_ws(chr(10),
             ['Cookie notice','Subscribe to our newsletter','Contact us'][CAST(doc_id % 3 AS INT) + 1],
             text,
             CASE WHEN doc_id % 9 = 0 THEN
               'promo alpha beta gamma delta epsilon zeta eta theta uniq' || doc_id END,
             'tail ' || doc_id) AS text
           FROM documents),
         ls AS (SELECT doc_id, string_split(text, chr(10)) AS ll FROM docs),
         l AS (SELECT doc_id, ll, unnest(generate_series(1, len(ll))) AS pos FROM ls),
         n AS (SELECT doc_id, pos, ll[pos] AS line, trim(ll[pos]) AS nrm FROM l),
         common AS (SELECT nrm FROM (SELECT DISTINCT doc_id, nrm FROM n WHERE nrm != '')
           GROUP BY nrm HAVING count(*) >= 5),
         kept AS (SELECT doc_id, pos, line FROM n
           WHERE nrm = '' OR nrm NOT IN (SELECT nrm FROM common)),
         agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS keptn FROM kept GROUP BY doc_id),
         lc AS (SELECT d.doc_id, coalesce(a.clean_text, '') AS text,
             CAST(len(string_split(d.text, chr(10))) - coalesce(a.keptn, 0) AS BIGINT) AS lines_removed
           FROM docs d LEFT JOIN agg a USING (doc_id)),
         toks0 AS (SELECT doc_id, text, lines_removed, list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM lc),
         w0 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i1
           FROM toks0 WHERE len(ws) >= 8),
         wins AS (SELECT doc_id, i1 - 1 AS i0,
             array_to_string(list_slice(ws, i1, i1 + 7), ' ') AS span FROM w0),
         dup AS (SELECT span, min(doc_id) AS owner
           FROM (SELECT DISTINCT doc_id, span FROM wins)
           GROUP BY span HAVING count(*) >= 2),
         cov AS (SELECT DISTINCT doc_id, pos FROM (
             SELECT w.doc_id, unnest(generate_series(w.i0, w.i0 + 7)) AS pos
             FROM wins w JOIN dup d USING (span) WHERE w.doc_id != d.owner)),
         ownp AS (SELECT DISTINCT doc_id, pos FROM (
             SELECT w.doc_id, unnest(generate_series(w.i0, w.i0 + 7)) AS pos
             FROM wins w JOIN dup d USING (span) WHERE w.doc_id = d.owner)),
         rem AS (SELECT c.doc_id, c.pos FROM cov c
           LEFT JOIN ownp o ON o.doc_id = c.doc_id AND o.pos = c.pos
           WHERE o.doc_id IS NULL),
         remc AS (SELECT doc_id, count(*) AS rm FROM rem GROUP BY doc_id),
         t1 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS p1
           FROM toks0 WHERE doc_id IN (SELECT doc_id FROM remc)),
         toksp AS (SELECT doc_id, p1 - 1 AS pos, ws[p1] AS tok FROM t1),
         kept2 AS (SELECT t.doc_id, t.pos, t.tok FROM toksp t
           LEFT JOIN rem c ON c.doc_id = t.doc_id AND c.pos = t.pos
           WHERE c.doc_id IS NULL),
         agg2 AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*) AS keptn FROM kept2 GROUP BY doc_id)
         SELECT d.doc_id,
           CASE WHEN r.doc_id IS NOT NULL THEN coalesce(a2.clean_text, '')
                ELSE d.text END AS clean_text,
           d.lines_removed,
           CAST(coalesce(r.rm, 0) AS BIGINT) AS tokens_removed
         FROM toks0 d
         LEFT JOIN remc r USING (doc_id)
         LEFT JOIN agg2 a2 USING (doc_id)
         ORDER BY d.doc_id""",

    // exact string-shingle Jaccard over the same (doc_id, doc_id+3)
    // pairs; empty/null texts shingle to the EMPTY set (not [''])
    "q_jaccard_verify" ->
      """WITH ids AS (SELECT doc_id FROM documents),
         pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
           FROM ids a JOIN ids b ON b.doc_id = a.doc_id + 3),
         toks AS (SELECT doc_id, list_filter(string_split_regex(
             trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
             '[ \t\n\v\f\r]+'), t -> t != '') AS ws
           FROM documents),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
                  WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks),
         j AS (SELECT p.a_id, p.b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM pairs p
           JOIN sh a ON a.doc_id = p.a_id
           JOIN sh b ON b.doc_id = p.b_id)
         SELECT a_id, b_id,
           CASE WHEN u = 0 THEN 0.0 ELSE i * 1.0 / u END AS jaccard
         FROM j ORDER BY a_id, b_id""",

    // XXH64-over-UTF-8-bytes re-derived in HUGEINT SQL (see the query
    // comment; generator: tools/gen_xxh64_sql.py)
    "q_fingerprint" ->
      ("""WITH docs0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
 canon AS (SELECT doc_id,
     regexp_replace(lower(trim(text)), '[ \t\n\v\f\r]+', ' ', 'g') AS c
   FROM docs0),
 toks AS (SELECT doc_id, list_filter(string_split_regex(
     trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
     '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM docs0),
 sh AS (SELECT doc_id,
     CASE WHEN len(ws) = 0 THEN []::VARCHAR[]
          WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          ELSE list_distinct(list_transform(
            generate_series(1, len(ws) - 2),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
   FROM toks),
 units AS (
   SELECT doc_id AS did, 0 AS kind, c AS s FROM canon
   UNION ALL
   SELECT doc_id, 1, unnest(s) FROM sh
   UNION ALL
   SELECT d.doc_id, 1, d.text FROM docs0 d
   JOIN sh ON sh.doc_id = d.doc_id WHERE len(sh.s) = 0
 ),
 src AS (SELECT {'d': did, 'kind': kind} AS k, s FROM units),
""" + Xxh64StrCtes + """
 SELECT k.d AS doc_id,
   max(CASE WHEN k.kind = 0 THEN h END) AS fp,
   min(CASE WHEN k.kind = 1 THEN h END) AS min_shingle
 FROM x_out GROUP BY 1 ORDER BY doc_id"""),

    // ingest-stats arithmetic straight off the source table: every doc is
    // one good line, every doc_id % 50 == 0 adds one garbage line
    "q_jsonl_ingest" ->
      """SELECT metric, n FROM (
           SELECT 'good_rows' AS metric, CAST(count(*) AS BIGINT) AS n
           FROM documents
           UNION ALL
           SELECT 'quarantined', CAST(count(*) AS BIGINT)
           FROM documents WHERE doc_id % 50 = 0
           UNION ALL
           SELECT 'good_nchars',
             CAST(coalesce(sum(length(text)), 0) AS BIGINT)
           FROM documents)
         ORDER BY metric""",

    // the WET round trip must land exactly on the source table re-derived
    // directly (url construction, epoch-arithmetic timestamps, text
    // lengths) — no WET parsing in the oracle, the FORMAT is what's tested
    "q_wet_roundtrip" ->
      """SELECT 'https://' || source || '.example.com/doc/'
           || CAST(doc_id AS VARCHAR) AS url,
         make_timestamp((1704067200 + doc_id * 797) * 1000000) AS warc_ts,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars
         FROM documents ORDER BY url""",

    // DuckDB's independent NFC implementation over the same construction
    "q_nfc_normalize" ->
      """WITH m AS (SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'Cafe' || chr(769) || ' nr ' || CAST(doc_id AS VARCHAR)
                WHEN doc_id % 3 = 1
                THEN 'Caf' || chr(233) || ' nr ' || CAST(doc_id AS VARCHAR)
                ELSE 'u' || chr(776) || 'ber ' || chr(252) || 'ber ' || source
           END AS raw
         FROM documents)
         SELECT doc_id, nfc_normalize(raw) AS norm,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_norm,
           raw = nfc_normalize(raw) AS already_normalized
         FROM m ORDER BY doc_id""",

    // the end-to-end pipeline funnel re-derived stage by stage:
    // canonical-text groups (== fingerprint groups absent 2^-64
    // collisions), greedy b-side near-dup drops from exact Jaccard
    // pairs, the error-severity quality gate, then the HUGEINT xxhash64
    // chain for sample membership and shard ids (see q_sampling)
    "q_corpus_pipeline" ->
      """WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source
                FROM documents),
         ce AS (SELECT *, regexp_replace(lower(trim(coalesce(text,''))),
                  '[ \t\n\v\f\r]+', ' ', 'g') AS ctext FROM d0),
         k1 AS (SELECT doc_id, text, lang, source FROM ce
                QUALIFY doc_id = min(doc_id) OVER (PARTITION BY ctext)),
         ntoks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') tw
               FROM k1
               WHERE text IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         nsh AS (SELECT doc_id,
             CASE WHEN len(tw) < 3 THEN [array_to_string(tw, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(tw) - 2),
                    i -> tw[i] || ' ' || tw[i+1] || ' ' || tw[i+2])) END AS s
           FROM ntoks),
         npairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM nsh a JOIN nsh b ON a.doc_id < b.doc_id),
         ndrop AS (SELECT DISTINCT b_id AS doc_id FROM npairs
           WHERE u > 0 AND i * 1.0 / u >= 0.35),
         k2 AS (SELECT * FROM k1
                WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
         qm AS (SELECT doc_id, text, lang,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                ELSE len(list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '')) END AS toks,
           list_filter(string_split(coalesce(text, ''), chr(10)),
             l -> trim(l) != '') AS lines,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN []::VARCHAR[]
                ELSE list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '') END AS qws
         FROM k2),
         qsig AS (SELECT doc_id, text, lang, toks,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines) END AS dlf,
           CASE WHEN len(qws) < 3 THEN 0.0
                ELSE (len(qws) - 2 - len(list_distinct(list_transform(
                    generate_series(1, len(qws) - 2),
                    i -> qws[i] || ' ' || qws[i+1] || ' ' || qws[i+2])))) * 1.0
                  / (len(qws) - 2) END AS dgf
         FROM qm),
         qdrop AS (SELECT doc_id FROM qsig
           WHERE text IS NULL
              OR NOT coalesce(toks >= 5, FALSE)
              OR NOT coalesce(dlf <= 0.3, FALSE)
              OR NOT coalesce(dgf <= 0.3, FALSE)
              OR (lang IS NOT NULL AND lang NOT IN ('en','de','fr','es'))),
         k3 AS (SELECT * FROM k2
                WHERE doc_id NOT IN (SELECT doc_id FROM qdrop)),
         ht AS (SELECT doc_id, doc_id AS v FROM k3),
         hs1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM ht),
         hs2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk1 FROM hs1),
         hs3 AS (SELECT *, (((hk1 << 31) & 18446744073709551615::HUGEINT) | (hk1 >> 33)) AS hk2 FROM hs2),
         hs4 AS (SELECT *, (((hk2 * 2246822535::HUGEINT) + (((hk2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk3 FROM hs3),
         hs5 AS (SELECT *, xor(2870177450012600311::HUGEINT, hk3) AS b0 FROM hs4),
         hs6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM hs5),
         hs7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM hs6),
         hs8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM hs7),
         hs9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM hs8),
         hs10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM hs9),
         hs11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM hs10),
         hs12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM hs11),
         hs13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM hs12),
         hs14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM hs13),
         hs15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM hs14),
         hs16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM hs15),
         hs17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM hs16),
         hs18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM hs17),
         hs19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM hs18),
         hs20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM hs19),
         hs21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM hs20),
         hx AS MATERIALIZED (SELECT doc_id, h,
                  ((h % 1000000000) + 1000000000) % 1000000000 AS pm
                FROM hs21),
         k4 AS (SELECT doc_id, h FROM hx WHERE pm / 1000000000.0 < 0.5)
         SELECT ord, stage, docs FROM (
           SELECT 0 AS ord, 'input' AS stage,
             CAST(count(*) AS BIGINT) AS docs FROM d0
           UNION ALL SELECT 1, 'exact_dedup', count(*) FROM k1
           UNION ALL SELECT 2, 'near_dedup', count(*) FROM k2
           UNION ALL SELECT 3, 'quality', count(*) FROM k3
           UNION ALL SELECT 4, 'sample', count(*) FROM k4
           UNION ALL SELECT 5,
             'shard_' || lpad(CAST(((h % 8) + 8) % 8 AS VARCHAR), 2, '0'),
             count(*) FROM k4 GROUP BY 2)
         ORDER BY ord, stage""",

    // the gated pipeline over the planted-boilerplate corpus: same funnel
    // as q_corpus_pipeline plus a span_gate stage between near-dedup and
    // quality, with the span coverage computed over literal k=8 token
    // window strings
    "q_corpus_pipeline_spans" ->
      """WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                CASE WHEN doc_id % 7 = 0 THEN
                  array_to_string(list_transform(generate_series(1, 40),
                    i -> 'boil' || i), ' ') || ' ' ||
                  array_to_string(list_transform(generate_series(1, 60),
                    i -> 'u' || doc_id || '_' || i), ' ')
                ELSE text END AS text, lang, source
                FROM documents),
         ce AS (SELECT *, regexp_replace(lower(trim(coalesce(text,''))),
                  '[ \t\n\v\f\r]+', ' ', 'g') AS ctext FROM d0),
         k1 AS (SELECT doc_id, text, lang, source FROM ce
                QUALIFY doc_id = min(doc_id) OVER (PARTITION BY ctext)),
         ntoks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') tw
               FROM k1
               WHERE text IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         nsh AS (SELECT doc_id,
             CASE WHEN len(tw) < 3 THEN [array_to_string(tw, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(tw) - 2),
                    i -> tw[i] || ' ' || tw[i+1] || ' ' || tw[i+2])) END AS s
           FROM ntoks),
         npairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM nsh a JOIN nsh b ON a.doc_id < b.doc_id),
         ndrop AS (SELECT DISTINCT b_id AS doc_id FROM npairs
           WHERE u > 0 AND i * 1.0 / u >= 0.35),
         k2 AS (SELECT * FROM k1
                WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
         sw AS (SELECT doc_id, list_filter(string_split_regex(
                  trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
                  '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM k2),
         swin AS (SELECT doc_id, unnest(list_transform(
               generate_series(1, len(ws) - 7),
               i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS span
             FROM sw WHERE len(ws) >= 8),
         sds AS (SELECT DISTINCT doc_id, span FROM swin),
         sdup AS (SELECT span FROM sds GROUP BY span HAVING count(*) >= 2),
         scov AS (SELECT w.doc_id, count(*) AS dup_w FROM swin w
             JOIN sdup USING (span) GROUP BY w.doc_id),
         stot AS (SELECT doc_id,
               CASE WHEN len(ws) >= 8 THEN len(ws) - 7 ELSE 0 END AS n_w
             FROM sw),
         sdrop AS (SELECT t.doc_id FROM stot t LEFT JOIN scov c USING (doc_id)
             WHERE t.n_w > 0
               AND coalesce(c.dup_w, 0) * 1.0 / t.n_w > 0.3),
         k2b AS (SELECT * FROM k2
                 WHERE doc_id NOT IN (SELECT doc_id FROM sdrop)),
         qm AS (SELECT doc_id, text, lang,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                ELSE len(list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '')) END AS toks,
           list_filter(string_split(coalesce(text, ''), chr(10)),
             l -> trim(l) != '') AS lines,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN []::VARCHAR[]
                ELSE list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '') END AS qws
         FROM k2b),
         qsig AS (SELECT doc_id, text, lang, toks,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines) END AS dlf,
           CASE WHEN len(qws) < 3 THEN 0.0
                ELSE (len(qws) - 2 - len(list_distinct(list_transform(
                    generate_series(1, len(qws) - 2),
                    i -> qws[i] || ' ' || qws[i+1] || ' ' || qws[i+2])))) * 1.0
                  / (len(qws) - 2) END AS dgf
         FROM qm),
         qdrop AS (SELECT doc_id FROM qsig
           WHERE text IS NULL
              OR NOT coalesce(toks >= 5, FALSE)
              OR NOT coalesce(dlf <= 0.3, FALSE)
              OR NOT coalesce(dgf <= 0.3, FALSE)
              OR (lang IS NOT NULL AND lang NOT IN ('en','de','fr','es'))),
         k3 AS (SELECT * FROM k2b
                WHERE doc_id NOT IN (SELECT doc_id FROM qdrop)),
         ht AS (SELECT doc_id, doc_id AS v FROM k3),
         hs1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM ht),
         hs2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk1 FROM hs1),
         hs3 AS (SELECT *, (((hk1 << 31) & 18446744073709551615::HUGEINT) | (hk1 >> 33)) AS hk2 FROM hs2),
         hs4 AS (SELECT *, (((hk2 * 2246822535::HUGEINT) + (((hk2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk3 FROM hs3),
         hs5 AS (SELECT *, xor(2870177450012600311::HUGEINT, hk3) AS b0 FROM hs4),
         hs6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM hs5),
         hs7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM hs6),
         hs8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM hs7),
         hs9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM hs8),
         hs10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM hs9),
         hs11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM hs10),
         hs12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM hs11),
         hs13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM hs12),
         hs14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM hs13),
         hs15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM hs14),
         hs16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM hs15),
         hs17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM hs16),
         hs18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM hs17),
         hs19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM hs18),
         hs20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM hs19),
         hs21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM hs20),
         hx AS MATERIALIZED (SELECT doc_id, h,
                  ((h % 1000000000) + 1000000000) % 1000000000 AS pm
                FROM hs21),
         k4 AS (SELECT doc_id, h FROM hx WHERE pm / 1000000000.0 < 0.5)
         SELECT ord, stage, docs FROM (
           SELECT 0 AS ord, 'input' AS stage,
             CAST(count(*) AS BIGINT) AS docs FROM d0
           UNION ALL SELECT 1, 'exact_dedup', count(*) FROM k1
           UNION ALL SELECT 2, 'near_dedup', count(*) FROM k2
           UNION ALL SELECT 3, 'span_gate', count(*) FROM k2b
           UNION ALL SELECT 4, 'quality', count(*) FROM k3
           UNION ALL SELECT 5, 'sample', count(*) FROM k4
           UNION ALL SELECT 6,
             'shard_' || lpad(CAST(((h % 8) + 8) % 8 AS VARCHAR), 2, '0'),
             count(*) FROM k4 GROUP BY 2)
         ORDER BY ord, stage""",

    // the FULL funnel: url_dedup derives the canonical url DIRECTLY from
    // the planted construction ('https://h<g%20>.example.com/doc/<g>' for
    // g = doc_id // 2) — both raw variants the engine canonicalizes must
    // land on exactly that string or the stage count diverges; host_cap
    // re-derives the per-host ≤8 rule with a row_number window keyed on
    // the same g-derived host, ordered by doc_id
    "q_corpus_pipeline_full" ->
      """WITH d0 AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source
                FROM documents),
         u0 AS (SELECT *, 'https://h' || CAST((doc_id // 2) % 20 AS VARCHAR)
                  || '.example.com/doc/' || CAST(doc_id // 2 AS VARCHAR) AS curl
                FROM d0),
         ku AS (SELECT doc_id, text, lang, source FROM u0
                QUALIFY doc_id = min(doc_id) OVER (PARTITION BY curl)),
         ce AS (SELECT *, regexp_replace(lower(trim(coalesce(text,''))),
                  '[ \t\n\v\f\r]+', ' ', 'g') AS ctext FROM ku),
         k1 AS (SELECT doc_id, text, lang, source FROM ce
                QUALIFY doc_id = min(doc_id) OVER (PARTITION BY ctext)),
         ntoks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') tw
               FROM k1
               WHERE text IS NOT NULL AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         nsh AS (SELECT doc_id,
             CASE WHEN len(tw) < 3 THEN [array_to_string(tw, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(tw) - 2),
                    i -> tw[i] || ' ' || tw[i+1] || ' ' || tw[i+2])) END AS s
           FROM ntoks),
         npairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM nsh a JOIN nsh b ON a.doc_id < b.doc_id),
         ndrop AS (SELECT DISTINCT b_id AS doc_id FROM npairs
           WHERE u > 0 AND i * 1.0 / u >= 0.35),
         k2 AS (SELECT * FROM k1
                WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
         qm AS (SELECT doc_id, text, lang,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                ELSE len(list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '')) END AS toks,
           list_filter(string_split(coalesce(text, ''), chr(10)),
             l -> trim(l) != '') AS lines,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN []::VARCHAR[]
                ELSE list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'),
                  t -> t != '') END AS qws
         FROM k2),
         qsig AS (SELECT doc_id, text, lang, toks,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE (len(lines) - len(list_distinct(lines))) * 1.0
                     / len(lines) END AS dlf,
           CASE WHEN len(qws) < 3 THEN 0.0
                ELSE (len(qws) - 2 - len(list_distinct(list_transform(
                    generate_series(1, len(qws) - 2),
                    i -> qws[i] || ' ' || qws[i+1] || ' ' || qws[i+2])))) * 1.0
                  / (len(qws) - 2) END AS dgf
         FROM qm),
         qdrop AS (SELECT doc_id FROM qsig
           WHERE text IS NULL
              OR NOT coalesce(toks >= 5, FALSE)
              OR NOT coalesce(dlf <= 0.3, FALSE)
              OR NOT coalesce(dgf <= 0.3, FALSE)
              OR (lang IS NOT NULL AND lang NOT IN ('en','de','fr','es'))),
         k3 AS (SELECT * FROM k2
                WHERE doc_id NOT IN (SELECT doc_id FROM qdrop)),
         kc AS (SELECT * FROM k3
                QUALIFY row_number() OVER (
                  PARTITION BY (doc_id // 2) % 20 ORDER BY doc_id) <= 8),
         ht AS (SELECT doc_id, doc_id AS v FROM kc),
         hs1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM ht),
         hs2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk1 FROM hs1),
         hs3 AS (SELECT *, (((hk1 << 31) & 18446744073709551615::HUGEINT) | (hk1 >> 33)) AS hk2 FROM hs2),
         hs4 AS (SELECT *, (((hk2 * 2246822535::HUGEINT) + (((hk2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS hk3 FROM hs3),
         hs5 AS (SELECT *, xor(2870177450012600311::HUGEINT, hk3) AS b0 FROM hs4),
         hs6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM hs5),
         hs7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM hs6),
         hs8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM hs7),
         hs9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM hs8),
         hs10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM hs9),
         hs11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM hs10),
         hs12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM hs11),
         hs13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM hs12),
         hs14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM hs13),
         hs15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM hs14),
         hs16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM hs15),
         hs17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM hs16),
         hs18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM hs17),
         hs19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM hs18),
         hs20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM hs19),
         hs21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM hs20),
         hx AS MATERIALIZED (SELECT doc_id, h,
                  ((h % 1000000000) + 1000000000) % 1000000000 AS pm
                FROM hs21),
         k4 AS (SELECT doc_id, h FROM hx WHERE pm / 1000000000.0 < 0.5)
         SELECT ord, stage, docs FROM (
           SELECT 0 AS ord, 'input' AS stage,
             CAST(count(*) AS BIGINT) AS docs FROM d0
           UNION ALL SELECT 1, 'url_dedup', count(*) FROM ku
           UNION ALL SELECT 2, 'exact_dedup', count(*) FROM k1
           UNION ALL SELECT 3, 'near_dedup', count(*) FROM k2
           UNION ALL SELECT 4, 'quality', count(*) FROM k3
           UNION ALL SELECT 5, 'host_cap', count(*) FROM kc
           UNION ALL SELECT 6, 'sample', count(*) FROM k4
           UNION ALL SELECT 7,
             'shard_' || lpad(CAST(((h % 8) + 8) % 8 AS VARCHAR), 2, '0'),
             count(*) FROM k4 GROUP BY 2)
         ORDER BY ord, stage""",

    "q_docs_quality_filter" -> DocsQualityOracleSql,
    "q_stream_quality_filter" -> DocsQualityOracleSql,

    // Stateful FSM stream re-derived: processing order is (batch, ts) per
    // entity; an event is LATE iff its ts is under the running max of all
    // earlier-processed events (late events never raise that max, so the
    // plain running max equals the applied-events max); the entity's
    // current state at a non-late event is the previous non-late event's
    // target (lag over the late-filtered set). Messages are rebuilt
    // verbatim, including the state-store timestamps ('.0' is
    // java.sql.Timestamp.toString's whole-second rendering).
    "q_fsm_stateful" ->
      """WITH seq AS (
           SELECT user_id, event_id, event_type AS dst,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY user_id) AS cnt,
             coalesce(lag(event_type) OVER w, 'start') AS src0
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         b AS (
           SELECT user_id, rn,
             make_timestamp((1704067200 + rn * 60) * 1000000) AS ts,
             dst,
             CASE WHEN event_id % 97 = 0 THEN 'forged' ELSE src0 END AS src,
             CASE WHEN rn <= (cnt + 2) // 3 THEN 0
                  WHEN rn <= ((cnt + 2) // 3) * 2 THEN 1 ELSE 2 END AS b0
           FROM seq),
         o AS (
           SELECT *, CASE WHEN rn % 23 = 0 AND b0 < 2 THEN b0 + 1 ELSE b0 END
             AS batch FROM b),
         f AS (
           SELECT *, max(ts) OVER (PARTITION BY user_id ORDER BY batch, ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
           FROM o),
         fl AS (SELECT *, (prev_max IS NOT NULL AND ts < prev_max) AS late FROM f),
         nl AS (
           SELECT *, coalesce(lag(dst) OVER (PARTITION BY user_id ORDER BY batch, ts),
             'start') AS cur
           FROM fl WHERE NOT late)
         SELECT 'user:' || user_id AS key, 'fsm_late_event' AS rule_id,
           'event at ' || strftime(ts, '%Y-%m-%d %H:%M:%S')
             || '.0 arrived after state advanced at '
             || strftime(prev_max, '%Y-%m-%d %H:%M:%S') || '.0' AS message, ts
         FROM fl WHERE late
         UNION ALL
         SELECT 'user:' || user_id, 'fsm_source_mismatch',
           'event claims source ' || src || ' but entity is in ' || cur, ts
         FROM nl WHERE src <> cur
         UNION ALL
         SELECT 'user:' || user_id, 'fsm_legal',
           'illegal transition ' || src || ' -> ' || dst, ts
         FROM fl WHERE src = dst OR (src = 'signup' AND dst = 'purchase')
         ORDER BY key, ts, rule_id""",

    // Watermarked windowed counts re-derived: the flush event pushes the
    // final watermark past every real window, so emitted == every
    // 10-minute epoch-aligned window holding >= 1 disallowed event type
    // ('error' is the only one in the table); the flush window itself is
    // violation-free and emits nothing
    "q_stream_windowed" ->
      """SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000)
             AS w_start,
           make_timestamp((epoch_us(ts) // 600000000) * 600000000 + 600000000)
             AS w_end,
           'valid_type' AS rule_id,
           count(*) AS violations
         FROM events
         WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
         GROUP BY 1, 2
         ORDER BY w_start""",

    // Streaming dedup survivors re-derived arithmetically: batch 0 rows
    // all survive (doc-unique texts), later batches survive only if
    // genuinely fresh ('fresh doc N' in batch 1) or content-free (NULL
    // text passes through on every batch); every replayed text hits the
    // state store and is dropped.
    "q_dedup_stream" ->
      """WITH d AS (
           SELECT doc_id AS id,
             CASE WHEN doc_id % 50 = 0 THEN NULL
                  ELSE coalesce(text, '') || ' #' || doc_id END AS t
           FROM documents),
         out AS (
           SELECT id AS doc_id, 1704067200 + id % 400 AS sec, t FROM d
           UNION ALL
           SELECT id + 10000, 1704067200 + 410 + id % 60, NULL FROM d
           WHERE id % 50 = 0
           UNION ALL
           SELECT id + 20000, 1704067200 + 415 + id % 60,
             'fresh doc ' || id FROM d WHERE id % 7 = 0
           UNION ALL
           SELECT 30001, 1704067200 + 480, NULL
           UNION ALL
           SELECT id + 50000, 1704067200 + 505 + id % 60, NULL FROM d
           WHERE id % 550 = 0)
         SELECT doc_id, make_timestamp(sec * 1000000) AS ts,
           CAST(length(t) AS BIGINT) AS n_chars
         FROM out ORDER BY doc_id""",

    // Deterministic sampling family: a TRUE re-derivation, not a recorded
    // golden — Spark's XxHash64 8-byte-long specialization (hashLong
    // chained key-then-seed, init 42) re-implemented as a DuckDB CTE
    // chain over HUGEINT modular arithmetic; 64x64-bit multiplies are
    // split into 32-bit halves so products stay inside signed 128-bit.
    // hx is MATERIALIZED: five consumers would otherwise re-inline the
    // 21-step chain and blow up DuckDB's optimizer.
    "q_sampling" ->
      """WITH t AS (SELECT doc_id, lang, doc_id AS v FROM documents),
         s1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM t),
         s2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k1 FROM s1),
         s3 AS (SELECT *, (((k1 << 31) & 18446744073709551615::HUGEINT) | (k1 >> 33)) AS k2 FROM s2),
         s4 AS (SELECT *, (((k2 * 2246822535::HUGEINT) + (((k2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k3 FROM s3),
         s5 AS (SELECT *, xor(2870177450012600311::HUGEINT, k3) AS b0 FROM s4),
         s6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM s5),
         s7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM s6),
         s8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM s7),
         s9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM s8),
         s10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM s9),
         s11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM s10),
         s12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM s11),
         s13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM s12),
         s14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM s13),
         s15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM s14),
         s16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM s15),
         s17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM s16),
         s18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM s17),
         s19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM s18),
         s20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM s19),
         s21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM s20),
         hx AS MATERIALIZED (SELECT doc_id, lang, h,
                  ((h % 1000000000) + 1000000000) % 1000000000 AS pm
                FROM s21)
         SELECT 'sample' AS family, 'r10' AS k, CAST(count(*) AS BIGINT) AS n
         FROM hx WHERE pm / 1000000000.0 < 0.10
         UNION ALL
         SELECT 'sample', 'r50', CAST(count(*) AS BIGINT)
         FROM hx WHERE pm / 1000000000.0 < 0.50
         UNION ALL
         SELECT 'stratum', lang, CAST(count(*) AS BIGINT)
         FROM hx
         WHERE pm / 1000000000.0 < CASE lang WHEN 'en' THEN 0.2
           WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.05 WHEN 'zh' THEN 0.35
           ELSE 0.0 END
         GROUP BY lang
         UNION ALL
         SELECT 'shard', lpad(CAST(((h % 16) + 16) % 16 AS VARCHAR), 2, '0'),
           CAST(count(*) AS BIGINT)
         FROM hx GROUP BY 2
         UNION ALL
         SELECT 'shuffle', lpad(CAST(rk AS VARCHAR), 2, '0'), doc_id
         FROM (SELECT doc_id,
                 row_number() OVER (ORDER BY h, doc_id) AS rk
               FROM hx)
         WHERE rk <= 20
         ORDER BY 1, 2""",

    "q_host_cap" ->
      """SELECT source, doc_id, n_chars
         FROM (SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rn
               FROM documents)
         WHERE rn <= 10
         ORDER BY source, doc_id""",

    // packed-stream block map re-derived end-to-end: XXH64(doc_id, 42)
    // HUGEINT chain for shard + order, the Spark tokenizer twin for
    // counts, a per-shard window prefix sum for offsets
    "q_sequence_pack" ->
      ("""WITH t AS (SELECT doc_id, text, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         tk AS (SELECT doc_id, h, ((h % 4) + 4) % 4 AS shard,
             """ + TokenCountSql + """ AS n_tokens
           FROM s21),
         p AS (SELECT doc_id, shard, n_tokens,
             coalesce(sum(n_tokens + 1) OVER (PARTITION BY shard
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS "offset"
           FROM tk)
         SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST("offset" AS BIGINT) AS "offset",
           CAST(floor("offset" / 128.0) AS BIGINT) AS first_block,
           CAST(CASE WHEN n_tokens > 0
               THEN floor(("offset" + n_tokens - 1) / 128.0)
               ELSE floor("offset" / 128.0) END AS BIGINT) AS last_block
         FROM p ORDER BY doc_id"""),

    // the q_sequence_pack block map exploded into per-(doc, block) token
    // sub-ranges with the same greatest/least slice arithmetic
    "q_pack_slices" ->
      ("""WITH t AS (SELECT doc_id, text, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         tk AS (SELECT doc_id, h, ((h % 4) + 4) % 4 AS shard,
             """ + TokenCountSql + """ AS n_tokens
           FROM s21),
         p AS (SELECT doc_id, shard, n_tokens,
             coalesce(sum(n_tokens + 1) OVER (PARTITION BY shard
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS "offset"
           FROM tk),
         pb AS (SELECT doc_id, shard, n_tokens, "offset",
             CAST(floor("offset" / 128.0) AS BIGINT) AS fb,
             CAST(CASE WHEN n_tokens > 0
                 THEN floor(("offset" + n_tokens - 1) / 128.0)
                 ELSE floor("offset" / 128.0) END AS BIGINT) AS lb
           FROM p),
         ex AS (SELECT doc_id, shard, n_tokens, "offset",
             unnest(generate_series(fb, lb)) AS block
           FROM pb)
         SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(block AS BIGINT) AS block,
           CAST(greatest(0, block * 128 - "offset") AS BIGINT) AS tok_start,
           CAST(least(n_tokens, (block + 1) * 128 - "offset")
             - greatest(0, block * 128 - "offset") AS BIGINT) AS tok_len
         FROM ex ORDER BY doc_id, block"""),

    // the window-start arithmetic verbatim: starts every 24 tokens,
    // last window reaches the final token, n<=32 one window, n=0 none
    "q_doc_windows" ->
      ("""WITH tk AS (SELECT doc_id,
           """ + TokenCountSql + """ AS n FROM documents),
         w AS (SELECT doc_id, n,
             unnest(generate_series(0,
               (greatest(n - 32, 0) + 23) // 24)) AS win
           FROM tk WHERE n > 0)
         SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(win * 24 AS BIGINT) AS tok_start,
           CAST(least(32, n - win * 24) AS BIGINT) AS tok_len
         FROM w ORDER BY doc_id, win"""),

    // the same shard/cumsum chain as q_sequence_pack, then every stream
    // element (token or the per-doc <eos>) placed at offset + i and the
    // block text string_agg'd in stream order
    "q_block_text" ->
      ("""WITH t AS (SELECT doc_id, text, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         tk AS (SELECT doc_id, h, ((h % 4) + 4) % 4 AS shard,
             CASE WHEN trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) = ''
                  THEN []::VARCHAR[]
                  ELSE list_filter(string_split_regex(
                    trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
                    '[ \t\n\v\f\r]+'), x -> x != '') END AS ws
           FROM s21),
         p AS (SELECT doc_id, shard, ws,
             coalesce(sum(len(ws) + 1) OVER (PARTITION BY shard
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS "offset"
           FROM tk),
         el AS (SELECT shard,
             unnest(list_transform(generate_series(1, len(ws) + 1),
               i -> {'spos': "offset" + i - 1,
                     'tok': CASE WHEN i <= len(ws) THEN ws[CAST(i AS INT)]
                                 ELSE '<eos>' END})) AS e
           FROM p)
         SELECT CAST(shard AS INT) AS shard,
           CAST(e.spos // 128 AS BIGINT) AS block,
           CAST(count(*) AS BIGINT) AS n_filled,
           string_agg(e.tok, ' ' ORDER BY e.spos) AS block_text
         FROM el GROUP BY 1, 2 ORDER BY shard, block"""),

    // the split thresholds written as the SAME running double sums the
    // when-chain evaluates: 0.8, then (0.8 + 0.1) — NOT the decimal 0.9
    "q_split_assign" ->
      ("""WITH t AS (SELECT doc_id, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         hx AS (SELECT doc_id,
             (((h % 1000000000) + 1000000000) % 1000000000)
               / 1000000000.0 AS c
           FROM s21)
         SELECT doc_id,
           CASE WHEN c < 0.8 THEN 'train'
                WHEN c < (0.8 + 0.1) THEN 'val'
                ELSE 'test' END AS split
         FROM hx ORDER BY doc_id"""),

    // exact global vocabulary: the whitespace-tokenizer twin, count per
    // token, top 10 by (n DESC, token ASC) — ASCII word-soup tokens, so
    // the two engines' string orders agree
    "q_vocab_topk" ->
      ("""WITH toks AS (SELECT unnest(list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '')) AS token FROM documents),
         c AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
         SELECT token, CAST(n AS BIGINT) AS n FROM c
         ORDER BY n DESC, token LIMIT 10"""),

    // adjacent-pair counts from the same token arrays: ws[i] || ' ' ||
    // ws[i+1] for i in [1, len-1], then the same ranking cut at 20
    "q_bpe_pairs" ->
      ("""WITH tk AS (SELECT list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM documents),
         p AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
             i -> ws[i] || ' ' || ws[i+1])) AS pair
           FROM tk WHERE len(ws) >= 2),
         c AS (SELECT pair, count(*) AS n FROM p GROUP BY pair)
         SELECT pair, CAST(n AS BIGINT) AS n FROM c
         ORDER BY n DESC, pair LIMIT 20"""),

    // the histogram-cumsum bucket map re-derived with the same integer
    // arithmetic: bucket = (3 * rows_below_value) div group_total
    "q_score_buckets" ->
      ("""WITH h AS (SELECT source, n_chars, count(*) AS n
           FROM documents GROUP BY source, n_chars),
         c AS (SELECT source, n_chars,
             coalesce(sum(n) OVER (PARTITION BY source ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             sum(n) OVER (PARTITION BY source) AS total
           FROM h)
         SELECT d.doc_id, d.source, d.n_chars,
           CAST((c.below * 3) // c.total AS INT) AS bucket
         FROM documents d
         JOIN c ON d.source = c.source AND d.n_chars = c.n_chars
         ORDER BY d.doc_id"""),

    // every unigram AND bigram pushed through the byte-exact string-hash
    // port, folded mod 64, then the same integer dot-product core —
    // collision structure has to match bit-for-bit
    "q_dsir_features" ->
      ("""WITH base AS (SELECT doc_id, source, list_filter(string_split_regex(
           trim(coalesce(text, ''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
           '[ \t\n\v\f\r]+'), t -> t != '') AS ws FROM documents),
         grams AS (
           SELECT doc_id, source, unnest(ws) AS s FROM base
           UNION ALL
           SELECT doc_id, source, unnest(list_transform(
               generate_series(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1]))
           FROM base WHERE len(ws) >= 2),
         src AS (SELECT {'d': doc_id,
             'tgt': source IN ('src0', 'src1')} AS k, s FROM grams),
         """ + Xxh64StrCtes + """,
         f AS (SELECT k.d AS doc_id, k.tgt AS tgt,
             ((h % 64) + 64) % 64 AS bucket, count(*) AS cnt
           FROM x_out GROUP BY 1, 2, 3),
         tt AS (SELECT bucket, sum(cnt) AS t FROM f WHERE tgt GROUP BY 1),
         rt AS (SELECT bucket, sum(cnt) AS r FROM f WHERE NOT tgt GROUP BY 1)
         SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(f.cnt * coalesce(tt.t, 0)) AS BIGINT) AS dot_target,
           CAST(sum(f.cnt * coalesce(rt.r, 0)) AS BIGINT) AS dot_raw
         FROM f LEFT JOIN tt ON f.bucket = tt.bucket
         LEFT JOIN rt ON f.bucket = rt.bucket
         WHERE NOT f.tgt
         GROUP BY f.doc_id ORDER BY f.doc_id"""),

    // mixture rates re-derived with the SAME fixed-order double
    // arithmetic as Sampling.mixtureCopies — (budget * w) / T, least
    // with the cap, floor + hash-coordinate fractional epoch — then
    // graded per doc (copies) and per source (realized token total)
    "q_source_mixing" ->
      ("""WITH t AS (SELECT doc_id, source, text, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         tk AS (SELECT doc_id, source,
             ((h % 1000000000) + 1000000000) % 1000000000 AS pm,
             """ + TokenCountSql + """ AS n_tokens
           FROM s21),
         tot AS (SELECT source, sum(n_tokens) AS tt FROM tk GROUP BY source),
         rt AS (SELECT source,
             least((30000.0 * CASE source WHEN 'src0' THEN 0.5
                 WHEN 'src1' THEN 0.2 WHEN 'src2' THEN 0.08
                 WHEN 'src3' THEN 0.02 ELSE 0.0 END) / CAST(tt AS DOUBLE),
               8.0) AS rate
           FROM tot),
         cp AS (SELECT tk.doc_id, tk.source, tk.n_tokens,
             CAST(floor(rate) AS BIGINT)
               + CASE WHEN pm / 1000000000.0 < rate - floor(rate)
                 THEN 1 ELSE 0 END AS copies
           FROM tk JOIN rt USING (source))
         SELECT family, k, n FROM (
           SELECT 'doc' AS family, lpad(CAST(doc_id AS VARCHAR), 6, '0') AS k,
             CAST(copies AS BIGINT) AS n
           FROM cp
           UNION ALL
           SELECT 'realized', source, CAST(sum(copies * n_tokens) AS BIGINT)
           FROM cp GROUP BY source)
         ORDER BY family, k"""),

    // the whole train-prep funnel re-derived: split threshold, the
    // mixture rate double chain over TRAIN-split totals, epoch
    // explosion, then the packing cumsum ordered by the SECOND hash
    // chain over epoch keys (u-prefixed instantiation). sp/pk are
    // MATERIALIZED: a filter/window referencing the hash output would
    // otherwise be pushed down THROUGH the 21 projection stages,
    // re-substituting the chain expression at each step — >600 s vs
    // 0.6 s measured for this query
    "q_train_pipeline" ->
      ("""WITH t AS (SELECT doc_id, source, text, doc_id AS v FROM documents),
         """ + Xxh64LongCtes + """,
         sp AS MATERIALIZED (SELECT doc_id, source, text,
             (((h % 1000000000) + 1000000000) % 1000000000) AS pm,
             """ + TokenCountSql + """ AS n_tokens
           FROM s21),
         tr AS (SELECT * FROM sp WHERE pm / 1000000000.0 < 0.8),
         tot AS (SELECT source, sum(n_tokens) AS tt FROM tr GROUP BY source),
         rt AS (SELECT source,
             least((30000.0 * CASE source WHEN 'src0' THEN 0.5
                 WHEN 'src1' THEN 0.2 WHEN 'src2' THEN 0.08
                 WHEN 'src3' THEN 0.02 ELSE 0.0 END) / CAST(tt AS DOUBLE),
               8.0) AS rate
           FROM tot),
         cp AS (SELECT tr.doc_id, tr.source, tr.n_tokens,
             CAST(floor(rate) AS BIGINT)
               + CASE WHEN pm / 1000000000.0 < rate - floor(rate)
                 THEN 1 ELSE 0 END AS copies
           FROM tr JOIN rt USING (source)),
         ep AS (SELECT doc_id, source, n_tokens,
             unnest(generate_series(1, copies)) AS epoch
           FROM cp WHERE copies > 0),
         t2 AS (SELECT doc_id, epoch, n_tokens,
             doc_id * 16 + epoch AS ek, doc_id * 16 + epoch AS v FROM ep),
         """ + Xxh64LongCtes2 + """,
         pk AS MATERIALIZED (SELECT doc_id, epoch, n_tokens, ek, h,
             ((h % 4) + 4) % 4 AS shard FROM u21),
         p AS (SELECT doc_id, epoch, shard, n_tokens,
             coalesce(sum(n_tokens + 1) OVER (PARTITION BY shard
               ORDER BY h, ek
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS "offset"
           FROM pk)
         SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
           CAST(shard AS INT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST("offset" AS BIGINT) AS "offset",
           CAST(floor("offset" / 128.0) AS BIGINT) AS first_block,
           CAST(CASE WHEN n_tokens > 0
               THEN floor(("offset" + n_tokens - 1) / 128.0)
               ELSE floor("offset" / 128.0) END AS BIGINT) AS last_block
         FROM p ORDER BY doc_id, epoch"""),

    // the same train slice, gram/context count tables, and per-position
    // left joins as LangModel.trainCharLm/scoreCharLm; zero-position
    // docs (null/short text) join back with zeroed features
    "q_charlm_score" ->
      """WITH tr AS (SELECT coalesce(text, '') AS txt FROM documents
             WHERE doc_id % 5 = 0),
         g AS (SELECT unnest(list_transform(generate_series(1,
               CASE WHEN length(txt) >= 3 THEN length(txt) - 2 ELSE 0 END),
             i -> substr(txt, i, 3))) AS gram
           FROM tr),
         gc AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_gram
           FROM g GROUP BY gram),
         cc AS (SELECT substr(gram, 1, 2) AS ctx,
             CAST(sum(n_gram) AS BIGINT) AS n_ctx
           FROM gc GROUP BY 1),
         sc AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
               THEN coalesce(text, '') || ' €txt§'
               ELSE coalesce(text, '') END AS txt
           FROM documents),
         d AS (SELECT doc_id, unnest(list_transform(generate_series(1,
               CASE WHEN length(txt) >= 3 THEN length(txt) - 2 ELSE 0 END),
             i -> substr(txt, i, 3))) AS gram
           FROM sc),
         j AS (SELECT d.doc_id, gc.n_gram, cc.n_ctx
           FROM d LEFT JOIN gc USING (gram)
             LEFT JOIN cc ON substr(d.gram, 1, 2) = cc.ctx),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
             CAST(sum(coalesce(n_gram, 0)) AS BIGINT) AS sum_gram,
             CAST(sum(coalesce(n_ctx, 0)) AS BIGINT) AS sum_ctx,
             CAST(count(*) FILTER (n_gram IS NULL) AS BIGINT) AS oov
           FROM j GROUP BY doc_id)
         SELECT dd.doc_id,
           CAST(coalesce(a.n_pos, 0) AS BIGINT) AS n_pos,
           CAST(coalesce(a.sum_gram, 0) AS BIGINT) AS sum_gram,
           CAST(coalesce(a.sum_ctx, 0) AS BIGINT) AS sum_ctx,
           CAST(coalesce(a.oov, 0) AS BIGINT) AS oov
         FROM documents dd LEFT JOIN agg a ON a.doc_id = dd.doc_id
         ORDER BY dd.doc_id""",

    "q_url_canon" ->
      """WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
               THEN 'HTTPS://' || upper(source) || '.Example.COM:443/doc/'
                    || doc_id || '/'
               ELSE 'HTTP://' || upper(source) || '.Example.COM:80/doc/'
                    || doc_id || '/?utm_source=x&id=' || (doc_id % 7)
                    || '&utm_campaign=y#frag' END AS url,
             'contact ' || lower(source)
               || '@example.com or +44 1234 567890 re: '
               || substring(text, 1, 40) AS raw
           FROM documents),
         c AS (
           SELECT doc_id, url, raw,
             lower(regexp_extract(url, '^([^/?#]*//[^/?#]*)', 1))
               || regexp_replace(url, '^[^/?#]*//[^/?#]*', '') AS u0
           FROM m),
         c2 AS (SELECT doc_id, url, raw,
             -- mirror canonicalUrl exactly: anchored [?&]-prefixed
             -- tracking params (keeping the separator), then ?&/&& debris
             -- cleanup, then the dangling-separator trim
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(u0, '#.*$', ''),
                     '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*', '\1', 'g'),
                   '&&+', '&', 'g'),
                 '\?&', '?', 'g'),
               '[?&]$', '') AS u1
           FROM c),
         c3 AS (SELECT doc_id, url, raw,
             -- scheme-paired default ports: http only swallows :80,
             -- https only :443 (https:80 is a distinct endpoint)
             regexp_replace(
               regexp_replace(
                 regexp_replace(u1,
                   '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
                 '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
               '(//[^/]+(/.*[^/]))/$', '\1') AS canonical
           FROM c2)
         SELECT doc_id, url, canonical,
           regexp_replace(
             regexp_replace(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
               '<EMAIL>', 'g'),
             '(\+[0-9]{1,3}[ -]?)?(\(0\)[ -]?)?([0-9][ -]?){9,12}[0-9]',
             '<PHONE>', 'g') AS scrubbed
         FROM c3""",
    // exact cross-corpus 3-gram Jaccard (train = all docs, eval = the
    // doc_id % 17 slice) — ground truth for the decontamination pairs
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks),
         pairs AS (SELECT a.doc_id AS t_id, b.doc_id AS e_id,
             len(list_intersect(a.s, b.s)) AS i,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS u
           FROM sh a JOIN sh b ON b.doc_id % 17 = 0)
         SELECT t_id, e_id, i * 1.0 / u AS jaccard
         FROM pairs WHERE u > 0 AND i * 1.0 / u >= 0.35""",
    "q_pages_validate" ->
      """WITH p AS (
           SELECT strftime(make_timestamp((1704067200 + doc_id * 797) * 1000000),
                    '%Y-%m-%d') AS part,
                  'https://' || source || '.example.com/doc/' || doc_id AS url,
                  make_timestamp((1704067200 + doc_id * 797) * 1000000) AS warc_ts,
                  text, lang
           FROM documents),
         parts AS (SELECT part, count(*) AS checked FROM p GROUP BY 1),
         counts AS (
           SELECT part, 'url_required' AS rule_id,
             CAST(sum(CASE WHEN url IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM p GROUP BY 1
           UNION ALL SELECT part, 'text_required',
             CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'warc_ts_required',
             CAST(sum(CASE WHEN warc_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'lang_present',
             CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'url_regex',
             CAST(sum(CASE WHEN url IS NOT NULL
               AND NOT regexp_matches(url, '^https?://[^ ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'lang_allowed',
             CAST(sum(CASE WHEN lang IS NOT NULL
               AND lang NOT IN ('en','de','fr','es','zh','ja','ru','pt') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'warc_ts_window',
             CAST(sum(CASE WHEN warc_ts IS NOT NULL
               AND (warc_ts < TIMESTAMP '2024-01-01 00:00:00'
                 OR warc_ts > TIMESTAMP '2024-02-01 00:00:00') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'html_when_text',
             CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0
               AND ('<html><body>' || text || '</body></html>') IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'url_max_length',
             CAST(sum(CASE WHEN url IS NOT NULL AND length(url) > 2083
               THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'host_in_dim',
             CAST(0 AS BIGINT) FROM p GROUP BY part)
         SELECT parts.part AS part, rule_id, checked, violations,
                violations = 0 AS pass
         FROM counts JOIN parts USING (part)
         UNION ALL
         SELECT '(global)', 'unique_url',
           (SELECT count(*) FROM p),
           (SELECT CAST(count(*) AS BIGINT) FROM
             (SELECT url FROM p WHERE url IS NOT NULL
              GROUP BY url HAVING count(*) > 1)),
           (SELECT count(*) FROM
             (SELECT url FROM p WHERE url IS NOT NULL
              GROUP BY url HAVING count(*) > 1)) = 0""",

    // S4 resume ≡ from-scratch: the per-day grid is the q_pages_validate
    // SQL verbatim; the two "(global)" uniqueness rows describe what each
    // incremental run actually scanned (arrival-1 subset, full table)
    "q_audit_resume" ->
      """WITH p AS (
           SELECT * FROM (
             SELECT strftime(make_timestamp((1704067200 + doc_id * 797) * 1000000),
                      '%Y-%m-%d') AS part,
                    'https://' || source || '.example.com/doc/' || doc_id AS url,
                    make_timestamp((1704067200 + doc_id * 797) * 1000000) AS warc_ts,
                    text, lang
             FROM documents)
           WHERE part <= '2024-01-06'),
         parts AS (SELECT part, count(*) AS checked FROM p GROUP BY 1),
         counts AS (
           SELECT part, 'url_required' AS rule_id,
             CAST(sum(CASE WHEN url IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM p GROUP BY 1
           UNION ALL SELECT part, 'text_required',
             CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'warc_ts_required',
             CAST(sum(CASE WHEN warc_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'lang_present',
             CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'url_regex',
             CAST(sum(CASE WHEN url IS NOT NULL
               AND NOT regexp_matches(url, '^https?://[^ ]+$') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'lang_allowed',
             CAST(sum(CASE WHEN lang IS NOT NULL
               AND lang NOT IN ('en','de','fr','es','zh','ja','ru','pt') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'warc_ts_window',
             CAST(sum(CASE WHEN warc_ts IS NOT NULL
               AND (warc_ts < TIMESTAMP '2024-01-01 00:00:00'
                 OR warc_ts > TIMESTAMP '2024-02-01 00:00:00') THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'html_when_text',
             CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0
               AND ('<html><body>' || text || '</body></html>') IS NULL
               THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'url_max_length',
             CAST(sum(CASE WHEN url IS NOT NULL AND length(url) > 2083
               THEN 1 ELSE 0 END) AS BIGINT) FROM p GROUP BY 1
           UNION ALL SELECT part, 'host_in_dim',
             CAST(0 AS BIGINT) FROM p GROUP BY part)
         SELECT parts.part AS part, rule_id, checked, violations,
                violations = 0 AS pass
         FROM counts JOIN parts USING (part)
         UNION ALL
         SELECT '(global)', 'unique_url',
           (SELECT count(*) FROM p WHERE part <= '2024-01-03'),
           (SELECT CAST(count(*) AS BIGINT) FROM
             (SELECT url FROM p WHERE url IS NOT NULL AND part <= '2024-01-03'
              GROUP BY url HAVING count(*) > 1)),
           (SELECT count(*) FROM
             (SELECT url FROM p WHERE url IS NOT NULL AND part <= '2024-01-03'
              GROUP BY url HAVING count(*) > 1)) = 0
         UNION ALL
         SELECT '(global)', 'unique_url',
           (SELECT count(*) FROM p),
           (SELECT CAST(count(*) AS BIGINT) FROM
             (SELECT url FROM p WHERE url IS NOT NULL
              GROUP BY url HAVING count(*) > 1)),
           (SELECT count(*) FROM
             (SELECT url FROM p WHERE url IS NOT NULL
              GROUP BY url HAVING count(*) > 1)) = 0
         ORDER BY part, rule_id, checked""",

    // J6: the referential pass's per-row violation output. url host is
    // source || '.example.com' by construction, so "host not in dim" ==
    // "source in the omitted set"; message defaults to the rule id.
    "q_referential_violations" ->
      """SELECT 'https://' || source || '.example.com/doc/' || doc_id AS key,
                strftime(make_timestamp((1704067200 + doc_id * 797) * 1000000),
                  '%Y-%m-%d') AS part,
                'host_in_dim' AS rule_id,
                'url' AS path,
                'host_in_dim' AS message,
                'error' AS severity
         FROM documents
         WHERE source IN ('src7', 'src13')
         ORDER BY key""",

    "q_cosine_neardups" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v)) != 0
           AND list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.4""",
    "q_cosine_neardups_bucketed" ->
      """WITH c AS (
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 10000000, embedding::DOUBLE[] FROM embeddings
           WHERE vec_id < 30)
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS cosine
         FROM c a JOIN c b ON a.vec_id < b.vec_id
         WHERE sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v)) != 0
           AND list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))) >= 0.9""",
    "q_text_quality" ->
      """WITH m AS (SELECT doc_id,
           len(regexp_extract_all(coalesce(text,''), '(?i)\b(der|die|das|und|ist|nicht|ein|eine|mit|auf)\b')) AS h_de,
           len(regexp_extract_all(coalesce(text,''), '(?i)\b(the|and|of|to|is|in|that|it|was|for)\b')) AS h_en,
           len(regexp_extract_all(coalesce(text,''), '(?i)\b(el|los|las|es|una|en|que|por|con|para)\b')) AS h_es,
           len(regexp_extract_all(coalesce(text,''), '(?i)\b(le|la|les|et|est|une|dans|que|pour|pas)\b')) AS h_fr,
           CASE WHEN length(trim(coalesce(text,''))) = 0 THEN 0
                ELSE len(list_filter(string_split_regex(
                  trim(coalesce(text,''), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '')) END AS toks,
           len(regexp_extract_all(coalesce(text,''), '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N} \t\n\v\f\r]')) AS bpe,
           length(coalesce(text,'')) AS nch,
           len(regexp_extract_all(coalesce(text,''), '[^\p{L}\p{N} \t\n\v\f\r]')) AS punct,
           len(regexp_extract_all(coalesce(text,''), '[\p{N}]')) AS dig
         FROM documents)
         SELECT doc_id,
           CASE WHEN greatest(h_de,h_en,h_es,h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de,h_en,h_es,h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de,h_en,h_es,h_fr) THEN 'es'
                WHEN h_en = greatest(h_de,h_en,h_es,h_fr) THEN 'en'
                ELSE 'de' END AS lang_id,
           round(least(CAST(toks AS DOUBLE)/100.0, 1.0) * 0.3
             + least((CASE WHEN toks = 0 THEN 0.0
                 ELSE CAST(h_de+h_en+h_es+h_fr AS DOUBLE)/toks END) * 4.0, 1.0) * 0.3
             + greatest(0.0, 1.0 - (CASE WHEN nch = 0 THEN 0.0
                 ELSE CAST(punct AS DOUBLE)/nch END) * 5.0) * 0.2
             + greatest(0.0, 1.0 - (CASE WHEN nch = 0 THEN 0.0
                 ELSE CAST(dig AS DOUBLE)/nch END) * 3.0) * 0.2, 4) AS quality,
           CAST(toks AS BIGINT) AS tokens, CAST(bpe AS BIGINT) AS bpe_tokens
         FROM m""",
    "q_drift_report" ->
      """WITH h AS (SELECT source AS part,
             CAST(floor(n_chars / 25.0) AS BIGINT) AS bin, count(*) AS n
           FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT part,
             CAST(CASE WHEN sum(n) > 1 THEN sum(n) ELSE 1 END AS DOUBLE) AS t
           FROM h GROUP BY 1),
         parts AS (SELECT DISTINCT part FROM h WHERE part != 'src0'),
         base AS (SELECT bin, n FROM h WHERE part = 'src0'),
         bins AS (SELECT part, bin FROM h WHERE part != 'src0'
           UNION SELECT p.part, b.bin FROM parts p CROSS JOIN base b),
         joined AS (
           SELECT bins.part, bins.bin,
                  CAST(coalesce(b.n, 0) AS DOUBLE) / bt.t AS pb,
                  CAST(coalesce(c.n, 0) AS DOUBLE) / ct.t AS qc
           FROM bins
           LEFT JOIN base b ON b.bin = bins.bin
           LEFT JOIN h c ON c.part = bins.part AND c.bin = bins.bin
           JOIN tot ct ON ct.part = bins.part
           CROSS JOIN (SELECT t FROM tot WHERE part = 'src0') bt),
         smoothed AS (
           SELECT part, bin, pb, qc,
                  CASE WHEN pb > 1e-6 THEN pb ELSE 1e-6 END AS p,
                  CASE WHEN qc > 1e-6 THEN qc ELSE 1e-6 END AS q
           FROM joined),
         psi AS (SELECT part, 'psi' AS metric, sum((q - p) * ln(q / p)) AS value
           FROM smoothed GROUP BY 1),
         cums AS (SELECT part, bin,
             sum(pb) OVER (PARTITION BY part ORDER BY bin) AS cb,
             sum(qc) OVER (PARTITION BY part ORDER BY bin) AS cc
           FROM smoothed),
         ks AS (SELECT part, 'ks' AS metric, max(abs(cb - cc)) AS value
           FROM cums GROUP BY 1)
         SELECT part, metric, round(value, 6) AS value, value <= 0.2 AS pass
         FROM (SELECT * FROM psi UNION ALL SELECT * FROM ks)""",
    "q_simhash_neardup" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
           AND len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35""",

    "q_simhash_sharded" ->
      """WITH t AS (SELECT doc_id, doc_id AS v FROM documents),
         s1 AS (SELECT *, (CAST(v AS HUGEINT) & 18446744073709551615::HUGEINT) AS x0 FROM t),
         s2 AS (SELECT *, (((x0 * 668265295::HUGEINT) + (((x0 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k1 FROM s1),
         s3 AS (SELECT *, (((k1 << 31) & 18446744073709551615::HUGEINT) | (k1 >> 33)) AS k2 FROM s2),
         s4 AS (SELECT *, (((k2 * 2246822535::HUGEINT) + (((k2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS k3 FROM s3),
         s5 AS (SELECT *, xor(2870177450012600311::HUGEINT, k3) AS b0 FROM s4),
         s6 AS (SELECT *, (((b0 << 27) & 18446744073709551615::HUGEINT) | (b0 >> 37)) AS b1 FROM s5),
         s7 AS (SELECT *, (((((b1 * 2246822535::HUGEINT) + (((b1 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS b2 FROM s6),
         s8 AS (SELECT *, xor(b2, b2 >> 33) AS f1 FROM s7),
         s9 AS (SELECT *, (((f1 * 668265295::HUGEINT) + (((f1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f2 FROM s8),
         s10 AS (SELECT *, xor(f2, f2 >> 29) AS f3 FROM s9),
         s11 AS (SELECT *, (((f3 * 2654435833::HUGEINT) + (((f3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS f4 FROM s10),
         s12 AS (SELECT *, xor(f4, f4 >> 32) AS c1 FROM s11),
         s13 AS (SELECT *, xor((c1 + 2870177450012600269::HUGEINT) & 18446744073709551615::HUGEINT, 1279370338401826588::HUGEINT) AS g1 FROM s12),
         s14 AS (SELECT *, (((g1 << 27) & 18446744073709551615::HUGEINT) | (g1 >> 37)) AS g2 FROM s13),
         s15 AS (SELECT *, (((((g2 * 2246822535::HUGEINT) + (((g2 * 2654435761::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) + 9650029242287828579::HUGEINT) & 18446744073709551615::HUGEINT) AS g3 FROM s14),
         s16 AS (SELECT *, xor(g3, g3 >> 33) AS h1 FROM s15),
         s17 AS (SELECT *, (((h1 * 668265295::HUGEINT) + (((h1 * 3266489917::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h2 FROM s16),
         s18 AS (SELECT *, xor(h2, h2 >> 29) AS h3 FROM s17),
         s19 AS (SELECT *, (((h3 * 2654435833::HUGEINT) + (((h3 * 374761393::HUGEINT) & 4294967295::HUGEINT) << 32)) & 18446744073709551615::HUGEINT) AS h4 FROM s18),
         s20 AS (SELECT *, xor(h4, h4 >> 32) AS h5 FROM s19),
         s21 AS (SELECT *, CAST(CASE WHEN h5 >= 9223372036854775808::HUGEINT THEN h5 - 18446744073709551616::HUGEINT ELSE h5 END AS BIGINT) AS h FROM s20),
         shards AS MATERIALIZED (SELECT doc_id, ((h % 4) + 4) % 4 AS shard FROM s21),
         toks AS (SELECT doc_id, list_filter(string_split_regex(
                 trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '[ \t\n\v\f\r]+'), t -> t != '') ws
               FROM documents
               WHERE text IS NOT NULL
                 AND trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) != ''),
         sh AS (SELECT doc_id,
             CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                  ELSE list_distinct(list_transform(
                    generate_series(1, len(ws) - 2),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) END AS s
           FROM toks)
         SELECT a.doc_id AS a_id, b.doc_id AS b_id
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         JOIN shards sa ON sa.doc_id = a.doc_id
         JOIN shards sb ON sb.doc_id = b.doc_id
         WHERE sa.shard = sb.shard
           AND len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0
           AND len(list_intersect(a.s, b.s)) * 1.0 /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35"""
  )
}
