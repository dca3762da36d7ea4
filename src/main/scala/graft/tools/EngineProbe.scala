package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
import graft.fixtures.PagesRules
import graft.rules.Unique

/** Phase-level timing probe for the validation engine (dev tool).
  * Reads the ScalingBench-generated parquet input.
  */
object EngineProbe {
  def main(args: Array[String]): Unit = {
    val input = if (args.nonEmpty) args(0)
      else "/tmp/graft_bench_pages_2000000_w0_seed42" // ScalingBench template
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = spark.read.parquet(input)
    val hosts = spark.read.parquet("/tmp/graft_bench_hosts_seed42")
    val cfg = EngineConfig("url", "date_format(warc_ts, 'yyyy-MM-dd')",
      saltExpr = "warc_ts", uniquenessSalts = 64,
      statsExprs = PagesRules.statsExprs,
      histograms = Seq(("text_len", "length(text)", 25.0)),
      quantilesFor = Seq("text_len"))

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[engine] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
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
        Unique("u", Seq("url")), cfg).count())
    time("stats profile only")(StatsPass.profile(pages, cfg).count())
    time("histogram only")(
      StatsPass.histogram(pages, cfg, "length(text)", 25.0).count())
    val sink = "/tmp/engine_probe_sink"
    time("runToSink (all, single decode)")(
      ValidationEngine.runToSink(pages, PagesRules.catalog,
        Map("hosts" -> hosts), cfg, sink))
    spark.stop()
  }
}
