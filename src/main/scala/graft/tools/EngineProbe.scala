package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
import graft.fixtures.PagesRules
import graft.rules.Unique

/** Phase-level timing/cpu probe for the validation engine (dev tool).
  * Reads the ScalingBench-generated parquet input; master comes from
  * spark-submit, so the same probe runs at local[1] vs local[4] to locate
  * which phase's cpu/row inflates with parallelism.
  */
object EngineProbe {
  def main(args: Array[String]): Unit = {
    val input = if (args.nonEmpty) args(0)
      else "/tmp/graft_bench_pages_2000000_w0_seed42" // ScalingBench template
    val spark = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = new CpuMetrics(spark.sparkContext)
    val pages = spark.read.parquet(input)
    val nRows = pages.count()
    val hosts = spark.read.parquet("/tmp/graft_bench_hosts_seed42")
    val cfg = EngineConfig("url", "date_format(warc_ts, 'yyyy-MM-dd')",
      statsExprs = PagesRules.statsExprs,
      histograms = Seq(("text_len", "length(text)", 25.0)),
      quantilesFor = Seq("text_len"))

    def time[T](tag: String)(f: => T): T = {
      metrics.settle(300); metrics.reset()
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      metrics.settle(500)
      val cpu = metrics.cpuSec
      println(f"[engine] $tag%-32s wall=$wall%7.2fs cpu=$cpu%7.2fs cpu/row=${cpu * 1e6 / nRows}%6.2fus")
      r
    }

    time("scan only (count)")(pages.count())
    time("decode url+ts only")(
      pages.select(sum(length(col("url"))), max(col("warc_ts"))).collect())
    time("decode all cols")(
      pages.select(sum(length(col("url")) + length(col("text")) +
        octet_length(col("html")) + length(col("lang"))),
        max(col("warc_ts"))).collect())
    time("row pass only")(
      ValidationEngine.rowPass(pages, PagesRules.catalog,
        Map("hosts" -> hosts), cfg).count())
    time("uniqueness only")(
      Uniqueness.duplicateKeyViolations(pages,
        Unique("u", Seq("url"))).count())
    time("stats profile only")(StatsPass.profile(pages, cfg).count())
    time("histogram only")(
      StatsPass.histogram(pages, cfg, "length(text)", 25.0).count())
    val sink = "/tmp/engine_probe_sink"
    time("runToSink (staged, all phases)")(
      ValidationEngine.runToSink(pages, PagesRules.catalog,
        Map("hosts" -> hosts), cfg, sink))
    spark.stop()
  }
}
