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
      Unique("unique_url", Seq("url")))
    val sel = vio.select("key", "message")
    // collect from sel ITSELF: .as[...] would build a NEW QueryExecution,
    // leaving sel.queryExecution's metrics (read below) never executed
    val vios = sel.collect().map(r => (r.getString(0), r.getString(1)))
    assert(vios.length === 1)
    assert(vios.head._1 === "https://hot.example.com/p")
    assert(vios.head._2.endsWith(s"n=${(n + 2) / 3}"))

    // the hot key really is pre-collapsed map-side — measured at the DATA
    // level via SQL metrics, not plan-string matching: every partial-mode
    // HashAggregate must emit far fewer rows than the 300k input. With
    // combine, the counting partial ships ~200k distinct hashes + one row
    // per task for the hot key; defeated combine would ship all 300k
    // (100k of them the hot key, all landing on one reducer).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => p.children.flatMap(allNodes)
    })
    val partialOut = allNodes(sel.queryExecution.executedPlan).collect {
      case h: HashAggregateExec
          if h.aggregateExpressions.exists(_.mode == Partial) =>
        h.metrics("numOutputRows").value
    }
    assert(partialOut.nonEmpty, "no partial HashAggregate in the plan")
    // guard against the vacuous-metrics failure mode: the counting partial
    // must have actually emitted the ~200k distinct hashes
    assert(partialOut.max >= 200000L,
      s"metrics not populated (plan not executed?): $partialOut")
    assert(partialOut.forall(_ <= 220000L),
      s"map-side combine defeated: partial agg emitted $partialOut rows " +
        s"from a 300k-row input (hot key not pre-collapsed)")

    // same verdict at any parallelism (1 vs many input partitions)
    val vios1 = Uniqueness.duplicateKeyViolations(df.coalesce(1),
      Unique("unique_url", Seq("url")))
      .select("key").as[String].collect().toSeq
    val vios16 = Uniqueness.duplicateKeyViolations(df.repartition(16),
      Unique("unique_url", Seq("url")))
      .select("key").as[String].collect().toSeq
    assert(vios1 === Seq("https://hot.example.com/p"))
    assert(vios16 === Seq("https://hot.example.com/p"))
  }
}
