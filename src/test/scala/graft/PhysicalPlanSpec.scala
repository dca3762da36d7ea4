package graft

import java.nio.file.Files
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
    partExpr = "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts", uniquenessSalts = 4)

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

  test("uniqueness is a two-phase aggregation (partial then final over salt)") {
    val vio = Uniqueness.duplicateKeyViolations(data.pages,
      graft.rules.Unique("u", Seq("url")), cfg)
    val plan = planOf(vio)
    // two HashAggregate pairs: (ukey, salt) then (ukey)
    val aggs = "HashAggregate".r.findAllIn(plan).size
    assert(aggs >= 4, s"expected partial+final x2 phases, got $aggs:\n${plan.take(800)}")
  }
}
