package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.engine._
import graft.fixtures.{PagesGen, PagesRules}
import graft.sources.PagesTable

/** The plans the engine produces must be the plans we'd want at 100 TB:
  * broadcast joins for dims, partition pruning for incremental reads,
  * pushed filters, whole-stage codegen in the hot path, and no shuffle in
  * the row pass. These assertions pin that down so a regression (e.g. a
  * dim silently falling back to sort-merge join) fails CI, not production.
  */
class PhysicalPlanSpec extends SparkSuite {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE shows codegen stages only once the plan is final — execute THIS
    * QueryExecution's plan (a fresh action like count() would build its
    * own plan and leave this one unfinalized).
    */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    qe.executedPlan.execute().foreachPartition(_ => ())
    qe.executedPlan.toString
  }

  // materialize generated pages to parquet: the generator's own expressions
  // contain transform() lambdas that would otherwise pollute plan checks
  private lazy val data = {
    val d = PagesGen.generate(spark, nRows = 5000L, nDays = 4)
    val dir = Files.createTempDirectory("plan_pages").toString
    d.pages.write.mode("overwrite").parquet(s"$dir/pages")
    d.hosts.write.mode("overwrite").parquet(s"$dir/hosts")
    d.copy(pages = spark.read.parquet(s"$dir/pages"),
      hosts = spark.read.parquet(s"$dir/hosts"))
  }
  private val cfg = EngineConfig(keyExpr = "url",
    partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")

  test("referential checks compile to BroadcastHashJoin, never SortMergeJoin") {
    val vios = ValidationEngine.rowPass(data.pages, PagesRules.catalog,
      Map("hosts" -> data.hosts), cfg)
    val plan = planOf(vios)
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"), "dim join fell back to SMJ")
  }

  test("row pass has no Exchange (zero shuffle before the sink)") {
    // dims excluded: their one-time distinct-prep may shuffle inside the
    // broadcast subtree, which is fine; the STREAM side must not shuffle
    val rowOnly = PagesRules.catalog
      .filterNot(r => r.isInstanceOf[graft.rules.Referential] ||
        r.isInstanceOf[graft.rules.Unique])
    val vios = ValidationEngine.rowPass(data.pages, rowOnly, Map.empty, cfg)
    val plan = planOf(vios)
    assert(!plan.contains("Exchange"),
      s"row pass shuffles:\n${plan.take(800)}")
  }

  test("row pass stays inside WholeStageCodegen (rule array is not a CodegenFallback HOF)") {
    val vios = ValidationEngine.rowPass(data.pages, PagesRules.catalog,
      Map("hosts" -> data.hosts), cfg)
    val plan = finalPlanOf(vios)
    // codegen stages print as "*(n) Operator" in the finalized plan; the
    // Generate carrying the rule array must be starred
    assert("\\*\\(\\d+\\) Generate".r.findFirstIn(plan).nonEmpty, plan.take(600))
    // regression guard: the rule array must never be built via the
    // higher-order filter() (CodegenFallback — drops the whole projection
    // to interpreted evaluation)
    assert(!plan.contains("lambdafunction"), plan.take(600))
  }

  test("partitioned table: day filter lands in PartitionFilters and prunes files") {
    val dir = Files.createTempDirectory("pages_tbl").toString + "/pages"
    PagesTable.write(data.pages.where(year($"warc_ts") === 2024), dir)
    val days = spark.read.parquet(dir)
      .select(PagesTable.PartitionCol).distinct().as[String].collect().sorted
    assert(days.length === 4)

    val pruned = PagesTable.readDays(spark, dir, Seq(days.head))
    val plan = planOf(pruned.select("url"))
    assert(plan.contains("PartitionFilters") &&
      plan.contains(days.head), plan.take(800))
    // pruning is real: row counts match exactly the one day
    val want = data.pages
      .where(date_format($"warc_ts", "yyyy-MM-dd") === days.head).count()
    assert(pruned.count() === want)
  }

  test("predicate pushdown reaches the parquet scan") {
    val dir = Files.createTempDirectory("pages_pf").toString + "/pages"
    PagesTable.write(data.pages.where(year($"warc_ts") === 2024), dir)
    val q = spark.read.parquet(dir).where($"lang" === "en").select("url")
    val plan = planOf(q)
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(lang)"),
      plan.take(800))
    // and column pruning: scan schema must not include text/html
    assert(plan.contains("ReadSchema"))
    val readSchema = plan.split("ReadSchema:")(1).split("\n")(0)
    assert(!readSchema.contains("text") && !readSchema.contains("html"),
      readSchema)
  }

  test("multi-field OR search stays a single pushed scan-filter (no shuffle, codegen'd)") {
    val dir = Files.createTempDirectory("search_any").toString
    data.pages.select($"url", $"lang", $"text")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(graft.functions.StringFunctions.searchAny("en",
        $"url", $"lang"))
      .select("url")
    val plan = finalPlanOf(q)
    // one scan, one filter, zero exchanges — the OR is row-local
    assert(!plan.contains("Exchange"), plan.take(800))
    assert(plan.split("Scan parquet").length == 2, plan.take(800))
    // codegen stages print as "*(n) Operator" in the finalized plan —
    // the OR-of-Contains filter must be starred, not interpreted
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(plan).nonEmpty, plan.take(800))
    // column pruning survives the multi-column predicate: text not read
    val readSchema = plan.split("ReadSchema:")(1).split("\n")(0)
    assert(!readSchema.contains("text"), readSchema)
  }

  test("uniqueness is partial+final hash aggregation (map-side combine splits hot keys)") {
    val vio = Uniqueness.duplicateKeyViolations(data.pages,
      graft.rules.Unique("u", Seq("url")))
    val plan = planOf(vio)
    // one partial+final pair for counting, one for the exact verify — and
    // NOT the old salted double-aggregation (its second full exchange and
    // extra agg passes were ~35% of the phase's cpu/row)
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs === 4, s"expected counting + verify partial/final pairs, got $aggs:\n${plan.take(800)}")
  }

  test("uniqueness counting shuffles 8-byte key hashes, never the key strings") {
    val vio = Uniqueness.duplicateKeyViolations(data.pages,
      graft.rules.Unique("u", Seq("url")))
    val plan = planOf(vio)
    // the counting exchanges partition on the xxhash64 of the key (_kh);
    // an exchange keyed on _ukey would ship full url strings at 10^12 rows
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, plan.take(800))
    val countingExchanges = exchanges.filter(_.contains("_kh"))
    assert(countingExchanges.nonEmpty,
      s"counting shuffle not keyed on _kh:\n${exchanges.mkString("\n")}")
    assert(!countingExchanges.exists(_.contains("_ukey")),
      s"counting shuffle ships key strings:\n${countingExchanges.mkString("\n")}")
  }

  test("stableSorted dumps never range-partition (no second execution of the pipeline)") {
    // round-4 fix: a trailing global orderBy runs a range-boundary
    // sampling job that re-executes the whole upstream; the stableSorted
    // dump (one hash exchange + in-partition sort) must stay range-free
    val sfDir = "/root/testdata/sf0.001"
    assert(new java.io.File(sfDir).isDirectory,
      s"test data missing at $sfDir (see TESTDATA.md)")
    for (q <- Seq("q_natural_dates", "q_crm_replay", "q_minhash_lsh")) {
      val plan = finalPlanOf(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.toLowerCase.contains("rangepartitioning"),
        s"$q plan re-grew a range sort")
    }
  }

  test("stableSorted stays out of production paths (dump layer only)") {
    // stableSorted = repartition(1).sortWithinPartitions — a deliberate
    // single-task funnel for kilobyte verdict dumps. It is a private
    // implicit of SparkEntry's dump layer; this pins that no engine /
    // text / dedup / crm / sources / sim / streaming source ever grows
    // its own copy (SparkEntry and the bench probes under tools/ are the
    // only allowed sites)
    // resolve from the sbt working dir but fail loudly if launched from
    // elsewhere — an empty walk would make this guard silently vacuous
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"source root not found from cwd ${System.getProperty("user.dir")}")
    val offenders = scala.util.Using.resource(java.nio.file.Files.walk(root)) {
      walk =>
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          .filterNot(p => p.endsWith("SparkEntry.scala") ||
            p.toString.contains("/tools/"))
          .filter(p => new String(java.nio.file.Files.readAllBytes(p))
            .contains("stableSorted"))
          .toList
    }
    assert(offenders.isEmpty, s"stableSorted leaked into: $offenders")
  }

  test("banded self range join is an equi-join on (key, bucket), no cartesian") {
    val plan = finalPlanOf(
      SparkEntry.queries("q_self_range_join")(spark, "/root/testdata/sf0.001"))
    val lower = plan.toLowerCase
    assert(!lower.contains("cartesianproduct") &&
      !lower.contains("broadcastnestedloop"), plan.take(2000))
    // the join keys carry the time bucket, so per-key fanout never goes
    // quadratic (x20 wall at x10 input before the fix)
    assert(lower.contains("bucket"), plan.take(2000))
  }

  test("nested customer doc: aggregate-then-join — one shuffle per child relation, customers scanned once") {
    val tb = graft.fixtures.CrmFixtures.build(spark)
    val doc = graft.crm.CustomerDoc.nestedCustomers(
      tb.customers, tb.pets, tb.contacts, tb.bookings)
    // AQE prints Final + Initial sections — count exchanges in the FINAL
    // plan only or every node is double-counted
    val plan = finalPlanOf(doc).split("== Initial Plan ==")(0)
    // each child relation pays exactly its own pre-join aggregation
    // shuffle on customer_id; the collapsed (customer_id, array) sides are
    // tiny and must broadcast, so the customer side NEVER shuffles and the
    // N+1 shape (join-then-fanout-then-dedup would add exchanges and a
    // distinct) is structurally excluded
    val hashExchanges = plan.split("\n")
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 3, s"$hashExchanges hash exchanges:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan.take(2000))
    // the customer side is scanned exactly once (its invoice_email column
    // appears in no child relation)
    val custScans = plan.split("\n")
      .count(l => l.contains("LocalTableScan") && l.contains("invoice_email"))
    assert(custScans === 1, s"$custScans customer scans:\n$plan")
    // no fanout-dedup: aggregate-then-join needs exactly one partial +
    // one final collect_list aggregate per child relation and nothing
    // after the joins — a join-then-fanout-then-dedup regression would
    // add post-join aggregates/distincts and break this count
    val aggs = plan.split("\n").count(_.contains("Aggregate(keys=["))
    assert(aggs === 6, s"$aggs aggregate nodes (expected 3 partial + 3 final):\n$plan")
  }

  test("staged projection is all fixed-width scalars + key strings (no nested types)") {
    val sink = Files.createTempDirectory("plan_sink").toString
    spark.conf.set("spark.graft.keepStage", "true") // else cleaned post-run
    try ValidationEngine.runToSink(data.pages, PagesRules.catalog,
      Map("hosts" -> data.hosts),
      cfg.copy(statsExprs = PagesRules.statsExprs,
        histograms = Seq(("text_len", "length(text)", 25.0))), sink)
    finally spark.conf.unset("spark.graft.keepStage")
    val stage = spark.read.parquet(s"$sink/_stage")
    // the violations travel as a LONG bitmask — the nested array<struct>
    // form measured ~0.8 ms/row through the columnar cache in round 1
    import org.apache.spark.sql.types._
    val byName = stage.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("_vb0") === LongType)
    assert(stage.schema.fields.forall(f => !f.dataType.isInstanceOf[ArrayType] &&
      !f.dataType.isInstanceOf[StructType] && !f.dataType.isInstanceOf[MapType] &&
      f.dataType != BinaryType),
      stage.schema.treeString)
    // and no document bodies: the widest column is the url-derived key
    assert(!byName.contains("_s_text") && !byName.contains("_s_html"),
      stage.schema.treeString)
    // uniqueness travels as an 8-byte key HASH (_uh_i), never raw key
    // strings: phase-1 counting reads 16 fixed bytes per row and the exact
    // verify re-derives key values from the source for candidates only
    assert(byName("_uh_0") === LongType, stage.schema.treeString)
    assert(!byName.keys.exists(_.startsWith("_u_")), stage.schema.treeString)
  }

  test("packSequences: exactly one exchange (shard hash-partitioning) + per-shard sort — the block map never re-shuffles") {
    val docs = spark.range(2000).select($"id".as("doc_id"),
      concat(lit("w "), $"id").as("text"))
    val plan = planOf(graft.text.Packing.packSequences(docs, "doc_id",
      graft.text.TextFunctions.tokenCount(col("text")), 128, 8))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("rangepartitioning"),
      "block map must not global-sort") // the window is per-shard
    assert(plan.contains("Window"), plan.take(400))
  }

  test("mixtureCopies: totals join back as a broadcast; the corpus stream never sort-merge-joins or re-shuffles after the agg") {
    val docs = spark.range(2000).select($"id".as("doc_id"),
      concat(lit("s"), pmod($"id", lit(7))).as("source"), lit(3L).as("toks"))
    val plan = planOf(graft.text.Sampling.mixtureCopies(docs, "doc_id",
      "source", col("toks"), Map("s0" -> 0.5, "s1" -> 0.5), 1000L))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), "totals join fell back to SMJ")
  }

  test("scoreCharLm: model and context lookups are broadcast joins (the LM is alphabet-bounded); no sort-merge join anywhere") {
    val docs = spark.range(500).select($"id".as("doc_id"),
      concat(lit("abcabc"), $"id").as("text"))
    val model = graft.text.LangModel.trainCharLm(docs, "text", n = 3)
    val plan = planOf(graft.text.LangModel.scoreCharLm(
      docs, "doc_id", "text", model, n = 3))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), "model join fell back to SMJ")
    // the only stream-side exchange is the final per-doc aggregate; the
    // model/ctx/vocab subtrees may shuffle internally (they are
    // model-sized), so pin the join strategy, not a global count
  }
}
