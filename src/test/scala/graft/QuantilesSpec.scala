package graft

import org.apache.spark.sql.functions._
import graft.engine.{EngineConfig, StatsPass}

/** The quantile leg of the stats pass (north_star: "quantile sketches via
  * KLL" → percentile_approx, which is mergeable across partial
  * aggregation): per-partition approximate quantiles must track the exact
  * ones within sketch accuracy.
  */
class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("per-partition percentile_approx tracks exact quantiles") {
    // two partitions with different, known length distributions
    val df = spark.range(20000).select(
      when($"id" % 2 === 0, "a").otherwise("b").as("part_col"),
      when($"id" % 2 === 0, $"id" % 100)            // a: uniform 0..99
        .otherwise(($"id" % 100) * 10).as("v"))     // b: uniform 0..990 step 10
    val cfg = EngineConfig("cast(id as string)", "part_col")
    val q = StatsPass.numericQuantiles(df, cfg, "v",
      probabilities = Seq(0.25, 0.5, 0.75), accuracy = 10000)
      .as[(String, Seq[Double])].collect().toMap
    assert(math.abs(q("a")(1) - 49.5) <= 2, q("a").toString)   // median ~49/50
    assert(math.abs(q("b")(1) - 495) <= 20, q("b").toString)
    assert(q("a")(0) < q("a")(1) && q("a")(1) < q("a")(2))
    // invariant to physical partitioning (mergeable partials)
    val q2 = StatsPass.numericQuantiles(df.repartition(17), cfg, "v",
      probabilities = Seq(0.25, 0.5, 0.75), accuracy = 10000)
      .as[(String, Seq[Double])].collect().toMap
    assert(q2 === q)
  }

  test("profile min/max aggregate in the native type, not lexicographically") {
    // lengths {9, 10, 100}: string ordering gives min="10", max="9" — the
    // profile must report 9 and 100
    val df = Seq(("a", 9L), ("a", 10L), ("a", 100L)).toDF("part_col", "v")
    val cfg = EngineConfig("cast(v as string)", "part_col")
    val row = StatsPass.profile(df, cfg, columns = Seq("v"))
      .select("min", "max").as[(String, String)].head()
    assert(row === ("9", "100"), row.toString)
  }

  test("quantiles are WIRED into the default profile (and runToSink sink)") {
    val df = spark.range(20000).select(
      when($"id" % 2 === 0, "a").otherwise("b").as("part_col"),
      when($"id" % 2 === 0, $"id" % 100)
        .otherwise(($"id" % 100) * 10).as("v"),
      concat(lit("k"), $"id").as("k"))
    val cfg = EngineConfig("k", "part_col",
      statsExprs = Seq("v" -> "v", "k" -> "k"),
      quantilesFor = Seq("v"),
      quantileProbs = Seq(0.25, 0.5, 0.75))

    def check(prof: org.apache.spark.sql.DataFrame): Unit = {
      val rows = prof.select("part", "column", "quantiles")
        .as[(String, String, Option[Seq[Double]])].collect()
      val m = rows.map(r => (r._1, r._2) -> r._3).toMap
      assert(m(("a", "k")).isEmpty)  // not in quantilesFor → null
      val qa = m(("a", "v")).get
      val qb = m(("b", "v")).get
      assert(qa.size === 3 && math.abs(qa(1) - 49.5) <= 2, qa.toString)
      assert(math.abs(qb(1) - 495) <= 20, qb.toString)
    }
    check(StatsPass.profile(df, cfg))
    // partition-invariance on the wired path
    val p1 = StatsPass.profile(df, cfg).orderBy("part", "column").collect()
    val p2 = StatsPass.profile(df.repartition(17), cfg)
      .orderBy("part", "column").collect()
    assert(p1 === p2)

    // the sink path (staged projection) carries the same quantiles
    val sink = java.nio.file.Files.createTempDirectory("qsink").toString
    val res = graft.engine.ValidationEngine.runToSink(df,
      Seq(graft.rules.Required("k_required", "k")), Map.empty, cfg, sink)
    check(res.profiles)
  }
}
