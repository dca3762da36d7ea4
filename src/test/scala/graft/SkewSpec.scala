package graft

import org.apache.spark.sql.functions._
import graft.engine.{EngineConfig, Uniqueness}
import graft.rules.Unique

/** Extreme-skew uniqueness (north_rule: "skew handled explicitly"): one url
  * carrying a third of all rows must neither break correctness nor
  * concentrate a reducer. The mechanism is Spark's map-side PARTIAL
  * aggregation: count() is algebraic, so every map task pre-collapses the
  * hot key to one (hash, partial-count) row and the final aggregation
  * receives at most #tasks rows for the hottest key — no hand-rolled
  * salting (the earlier salted two-phase re-implemented exactly this
  * collapse and paid an extra full exchange + two aggregation passes for
  * it). The candidate-verify JOIN is the one spot aggregation cannot
  * pre-collapse a hot key; AQE skew-join splitting covers it (enabled in
  * every engine entry point).
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("uniqueness is exact under a 33%-hot key and invariant to parallelism") {
    val n = 300000L
    // 1/3 of rows share ONE url; the rest are unique
    val df = spark.range(n).select(
      when(pmod($"id", lit(3)) === 0, lit("https://hot.example.com/p"))
        .otherwise(concat(lit("https://ok.example.com/"), $"id")).as("url"),
      timestamp_seconds(lit(1704067200L) + $"id" % 86400L).as("warc_ts"))
    val cfg = EngineConfig("url", "date_format(warc_ts, 'yyyy-MM-dd')")

    val vio = Uniqueness.duplicateKeyViolations(df,
      Unique("unique_url", Seq("url")), cfg)
    val vios = vio.select("key", "message").as[(String, String)].collect()
    assert(vios.length === 1)
    assert(vios.head._1 === "https://hot.example.com/p")
    assert(vios.head._2.endsWith(s"n=${(n + 2) / 3}"))

    // the hot key really is pre-collapsed map-side: the counting phase is a
    // partial+final HashAggregate pair over the 8-byte hash, so each map
    // task ships ONE row for the hot key, not 100k
    val plan = vio.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial count") ||
      "HashAggregate".r.findAllIn(plan).size >= 4, plan.take(800))

    // same verdict at any parallelism (1 vs many input partitions)
    val vios1 = Uniqueness.duplicateKeyViolations(df.coalesce(1),
      Unique("unique_url", Seq("url")), cfg)
      .select("key").as[String].collect().toSeq
    val vios16 = Uniqueness.duplicateKeyViolations(df.repartition(16),
      Unique("unique_url", Seq("url")), cfg)
      .select("key").as[String].collect().toSeq
    assert(vios1 === Seq("https://hot.example.com/p"))
    assert(vios16 === Seq("https://hot.example.com/p"))
  }
}
