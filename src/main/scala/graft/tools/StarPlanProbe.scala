package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-shape evidence for the per-round ls barrier in
  * [[graft.dedup.Dedup.connectedComponentsWithRounds]] (dev tool, feeds
  * BENCH.md). One star round's small-star plan, with the large-star
  * intermediate either raw (pre-fix) or behind an eager localCheckpoint
  * (`STAR_BARRIER=1`). Measured on Spark 4.1.2: WITHOUT the barrier the
  * large-star join appears 4x in the executed plan (reusedExchanges=0,
  * joins=4, hashAggs=14 — the planner rebuilds the subplan under each
  * consumer, no ReusedExchange, same behavior the lshCandidates note
  * records); WITH it, joins=1/hashAggs=6 plus the one-time ls
  * materialization (its own 1 join) — per-round work halves. Plan counts
  * are window-noise-free, unlike wall clock on this host.
  */
object StarPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(999).toDF("i")
      .select((col("i") + 1).as("u"), col("i").as("v"))
      .localCheckpoint(true)
    val und = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    val lsMin = und.groupBy(col("u")).agg(min(col("v")).as("nm"))
      .select(col("u"), least(col("u"), col("nm")).as("m"))
    val lsBase = und.join(lsMin, Seq("u"))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val ls = if (sys.env.get("STAR_BARRIER").contains("1"))
      lsBase.localCheckpoint(true) else lsBase
    val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
    val ss = ls.join(ssMin, Seq("u"))
      .select(col("v").as("n"), col("m"))
      .unionByName(ssMin.select(col("u").as("n"), col("m")))
      .where(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
    ss.count() // trigger AQE final plan
    val plan = ss.queryExecution.executedPlan.toString
    val reused = "ReusedExchange|TableCacheQueryStage|ReusedShuffle".r
      .findAllIn(plan).length
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).length
    val aggs = "HashAggregate".r.findAllIn(plan).length
    println(s"[starplan] reusedExchanges=$reused joins=$joins hashAggs=$aggs")
    println(plan.linesIterator.filter(l =>
      l.contains("Reused") || l.contains("Join") || l.contains("Exchange"))
      .take(40).mkString("\n"))
    spark.stop()
  }
}
