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
}
