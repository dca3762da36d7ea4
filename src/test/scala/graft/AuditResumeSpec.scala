package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine._
import graft.fixtures.{PagesGen, PagesRules}

/** Resumability (north_rule: "resumable from checkpoint with per-partition
  * lineage + metrics"): a run validates only partitions absent from the
  * audit; re-running after success is a no-op; a later run picks up only
  * newly-arrived partitions.
  */
class AuditResumeSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = EngineConfig(
    keyExpr = "url", partExpr = "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts",
    uniquenessSalts = 4)

  test("incremental run validates only new partitions, idempotently") {
    val dir = Files.createTempDirectory("audit").toString
    val data = PagesGen.generate(spark, nRows = 4000L, nDays = 4)
    val inWindow = data.pages.where(year($"warc_ts") === 2024)
    val parts = inWindow.select(date_format($"warc_ts", "yyyy-MM-dd"))
      .distinct().as[String].collect().sorted
    assert(parts.length === 4)

    // first run: only the first 2 days have "arrived"
    val firstTwo = inWindow
      .where(date_format($"warc_ts", "yyyy-MM-dd").isin(parts.take(2): _*))
    val r1 = Audit.runIncremental(firstTwo, PagesRules.catalog,
      Map("hosts" -> data.hosts), cfg, dir, "run1")
    assert(r1.isDefined)
    val audit = new AuditLog(dir, spark)
    assert(audit.validatedParts() === parts.take(2).toSet)

    // re-run on the same input: nothing to do
    val r2 = Audit.runIncremental(firstTwo, PagesRules.catalog,
      Map("hosts" -> data.hosts), cfg, dir, "run2")
    assert(r2.isEmpty)

    // full table arrives: only the 2 new partitions are validated
    val r3 = Audit.runIncremental(inWindow, PagesRules.catalog,
      Map("hosts" -> data.hosts), cfg, dir, "run3")
    assert(r3.isDefined)
    val newParts = r3.get.verdicts.select("part").distinct()
      .as[String].collect().toSet - graft.engine.ValidationEngine.GlobalPart
    assert(newParts === parts.drop(2).toSet)
    assert(audit.validatedParts() === parts.toSet)

    // lineage: every verdict row carries its run_id
    val runs = audit.verdicts().select("run_id").distinct()
      .as[String].collect().toSet
    assert(runs === Set("run1", "run3"))
  }
}
