package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine._
import graft.fixtures.{PagesGen, PagesRules}
import graft.sources.PagesTable

/** End-to-end daily crawl pipeline: partitioned table on disk → incremental
  * (resumable) validation of newly-arrived days → drift verdicts per day →
  * byte-identity across a re-crawl. The integration shape of the whole
  * engine, on files, the way production would run it.
  */
class DailyPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("ingest days incrementally, validate only new ones, flag the drift day") {
    val root = Files.createTempDirectory("daily").toString
    val tableDir = s"$root/pages"
    val auditDir = s"$root/audit"
    val data = PagesGen.generate(spark, nRows = 20000L, nDays = 5)
    val inWindow = data.pages.where(year($"warc_ts") === 2024)
    val days = inWindow.select(date_format($"warc_ts", "yyyy-MM-dd").as("d"))
      .distinct().as[String].collect().sorted
    assert(days.length === 5)
    val cfg = EngineConfig("url", "date_format(warc_ts, 'yyyy-MM-dd')",
      statsExprs = PagesRules.statsExprs)

    // day-by-day arrival: append each day's partition, re-run incrementally
    days.zipWithIndex.foreach { case (day, i) =>
      PagesTable.write(
        inWindow.where(date_format($"warc_ts", "yyyy-MM-dd") === day),
        tableDir, org.apache.spark.sql.SaveMode.Append)
      val table = PagesTable.read(spark, tableDir)
        .drop(PagesTable.PartitionCol)
      val res = Audit.runIncremental(table, PagesRules.catalog,
        Map("hosts" -> data.hosts), cfg, auditDir, s"run_$i")
      assert(res.isDefined, s"day $day should be new")
      val newParts = res.get.verdicts.select("part").distinct()
        .as[String].collect().toSet - ValidationEngine.GlobalPart
      assert(newParts === Set(day), s"expected only $day, got $newParts")
    }
    val audit = new AuditLog(auditDir, spark)
    assert(audit.validatedParts() === days.toSet)

    // drift: per-day text-length histograms over the full table flag the
    // planted last-day length shift
    val table = PagesTable.read(spark, tableDir).drop(PagesTable.PartitionCol)
    val hist = StatsPass.histogram(table, cfg, "length(text)", 25.0)
    val psi = Drift.againstPrevious(hist, "length(text)")
      .filter(_.metric == "psi").sortBy(_.part)
    assert(psi.last.pass === false, s"drift day not flagged: $psi")
    assert(psi.init.forall(_.pass))

    // re-crawl with mutated texts: byte-identity catches exactly the plants
    val base = table.where($"url".isNotNull).dropDuplicates("url")
    val (recrawl, expected) = PagesGen.mutateSnapshot(base)
    val got = CrossSnapshot.byteIdentity(base, recrawl, "url", "text")
      .where($"severity" === "error").select("key").as[String].collect().toSet
    assert(got === expected.as[String].collect().toSet && got.nonEmpty)
  }

  test("filesPerDay spreads a day's write across tasks; default stays one file per day") {
    // a single task per day is a serialization funnel at crawl scale —
    // the knob must actually fan the write out, and the layout/content
    // must be identical either way
    val root = Files.createTempDirectory("spread").toString
    val data = PagesGen.generate(spark, nRows = 6000L, nDays = 3)
    val pages = data.pages.where(year($"warc_ts") === 2024)

    def filesPerDayDirs(dir: String): Map[String, Int] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith(PagesTable.PartitionCol + "="))
        .map(p => p.getName ->
          p.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }

    PagesTable.write(pages, s"$root/one")
    val one = filesPerDayDirs(s"$root/one")
    assert(one.nonEmpty && one.values.forall(_ === 1), one.toString)

    PagesTable.write(pages, s"$root/four", filesPerDay = 4)
    val four = filesPerDayDirs(s"$root/four")
    assert(four.keySet === one.keySet)
    // "UP TO filesPerDay" is the write contract: distinct (day, bucket)
    // keys can hash-collide into one reducer at this tiny shuffle width,
    // so a per-day n > 1 assertion would be betting on collision-free
    // hashing of 4 keys (fragile under any schema/content/width change).
    // Assert the hard bound per day plus spread-happened-at-all across
    // the table — the latter fails only if EVERY day collapsed to one
    // file simultaneously (~4e-6 under a uniform hash, vs ~1.6% per day
    // for the old per-day form).
    assert(four.values.forall(_ <= 4), four.toString)
    assert(four.values.sum > one.values.sum, four.toString)

    // identical table content regardless of the file spread
    val a = spark.read.parquet(s"$root/one").drop(PagesTable.PartitionCol)
    val b = spark.read.parquet(s"$root/four").drop(PagesTable.PartitionCol)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("keyed upsert (S4 MERGE): idempotent re-ingest, latest-per-url wins, untouched days intact") {
    val dir = s"${Files.createTempDirectory("upsert")}/pages"
    val data = PagesGen.generate(spark, nRows = 6000L, nDays = 3)
    val pages = data.pages
      .where(year($"warc_ts") === 2024 && $"url".isNotNull)
      .dropDuplicates("url")
    val days = pages.select(date_format($"warc_ts", "yyyy-MM-dd").as("d"))
      .distinct().as[String].collect().sorted
    val dayOf = (d: String) => pages.where(date_format($"warc_ts", "yyyy-MM-dd") === d)

    days.foreach(d => PagesTable.upsert(spark, dir, dayOf(d)))
    def snapshot() = PagesTable.read(spark, dir)
      .select($"url", $"warc_ts", xxhash64($"text").as("th"))
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    val s1 = snapshot()
    assert(s1.size === pages.count())

    // idempotent: re-ingesting day 2 unchanged is a no-op
    PagesTable.upsert(spark, dir, dayOf(days(1)))
    assert(snapshot() === s1)

    // re-crawl of day 2 with mutated text: the update wins per url,
    // row count is unchanged, other days byte-identical
    val (mutated, expectedKeys) = PagesGen.mutateSnapshot(dayOf(days(1)))
    PagesTable.upsert(spark, dir, mutated)
    val s2 = snapshot()
    assert(s2.size === s1.size)
    val changedUrls = (s1 -- s2).map(_._1)
    assert(changedUrls === expectedKeys.as[String].collect().toSet)
    assert(changedUrls.nonEmpty)
    // byte-identity check across the merge flags exactly the mutation set
    val after = PagesTable.read(spark, dir).drop(PagesTable.PartitionCol)
    val flagged = CrossSnapshot.byteIdentity(
        pages, after, "url", "text")
      .where($"severity" === "error").select("key").as[String].collect().toSet
    assert(flagged === changedUrls)

    // CROSS-DAY re-crawl: the same urls arrive with a NEW crawl timestamp
    // on a different day — MERGE is keyed on url, so the old day's stale
    // rows must disappear (no cross-day duplicates) and, if emptied, the
    // old partition's files must be gone
    val moved = dayOf(days(0))
      .withColumn("warc_ts", $"warc_ts" + expr("INTERVAL 10 DAYS"))
    PagesTable.upsert(spark, dir, moved)
    val t3 = PagesTable.read(spark, dir)
    assert(t3.count() === s1.size) // still one row per url
    val dups = t3.groupBy("url").count().where($"count" > 1).count()
    assert(dups === 0L, "cross-day upsert left duplicate urls")
    // old day emptied -> partition dir dropped
    val remainingDays = t3.select(PagesTable.PartitionCol).distinct()
      .as[String].collect().toSet
    assert(!remainingDays.contains(days(0)), remainingDays.toString)
  }

  test("upsert stays idempotent for NULL-key rows (replayed batches don't grow the table)") {
    // null keys never match in MERGE, but a replayed batch must not
    // append its null-key rows a second time next to the copies already
    // in the arriving day
    val dir = s"${Files.createTempDirectory("upsert_null")}/pages"
    val batch = Seq(
      (Some("https://a.example.com/1"), "2024-01-03 10:00:00", "kept"),
      (None, "2024-01-03 11:00:00", "null-key row"),
      (None, "2024-01-03 12:00:00", "second distinct null-key row"))
      .toDF("url", "ts", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_ts"), $"text")
    PagesTable.upsert(spark, dir, batch)
    PagesTable.upsert(spark, dir, batch) // replay, byte-identical batch
    val rows = PagesTable.read(spark, dir)
    assert(rows.count() === 3L)
    assert(rows.where($"url".isNull).count() === 2L)
  }
}
