package graft

import org.apache.spark.sql.functions._
import graft.engine.{EngineConfig, Uniqueness}
import graft.rules.Unique

/** Extreme-skew uniqueness (north_rule: "skew handled explicitly"): one url
  * carrying a third of all rows must neither break correctness nor
  * concentrate in one reducer — the salt splits the hot key's partials
  * across `uniquenessSalts` groups before the final per-key merge.
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted uniqueness is exact under a 33%-hot key and invariant to salt count") {
    val n = 300000L
    // 1/3 of rows share ONE url; the rest are unique; ts varies (salt input)
    val df = spark.range(n).select(
      when(pmod($"id", lit(3)) === 0, lit("https://hot.example.com/p"))
        .otherwise(concat(lit("https://ok.example.com/"), $"id")).as("url"),
      timestamp_seconds(lit(1704067200L) + $"id" % 86400L).as("warc_ts"))
    val cfg = EngineConfig("url", "date_format(warc_ts, 'yyyy-MM-dd')", saltExpr = "warc_ts",
      uniquenessSalts = 64)

    val vios = Uniqueness.duplicateKeyViolations(df,
      Unique("unique_url", Seq("url")), cfg)
      .select("key", "message").as[(String, String)].collect()
    assert(vios.length === 1)
    assert(vios.head._1 === "https://hot.example.com/p")
    assert(vios.head._2.endsWith(s"n=${(n + 2) / 3}"))

    // phase-1 salt really splits the hot key: partial groups > 1
    val partials = df
      .where($"url" === "https://hot.example.com/p")
      .groupBy(Uniqueness.saltCol(cfg, 64)).count()
    assert(partials.count() > 16, "hot key not split across salts")

    // same verdict at any parallelism / salt count
    val vios1 = Uniqueness.duplicateKeyViolations(df.repartition(3),
      Unique("unique_url", Seq("url")), cfg.copy(uniquenessSalts = 2))
      .select("key").as[String].collect().toSeq
    assert(vios1 === Seq("https://hot.example.com/p"))
  }
}
