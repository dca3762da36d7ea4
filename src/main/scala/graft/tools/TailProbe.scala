package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for bench-tail queries: splits plan-build / planning /
  * execution wall time and prints per-stage executor run/cpu metrics, so a
  * "slow query" diagnosis targets the real cost. Round-4 findings it
  * produced (kept for reference):
  *
  *  - q_natural_dates: the humanize render is COMPUTE-dense on tiny rows;
  *    AQE coalesced the render stage to ONE task (2.7 s cpu in one task)
  *    and the trailing orderBy's range sampling executed the render twice.
  *    Fix: explicit repartition before the render + single-pass
  *    stableSorted dump (2.6 s → 0.7 s at sf0.1).
  *  - q_crm_replay: ~1.4 s driver plan construction (22 fixture-scale
  *    engine invocations) + ~2 s across ~60 tiny stages; execution-side
  *    cost is scheduling floor, not data. Constant at scale by design.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TailProbe [query ...]"
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        if (tm.executorRunTime > 100)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"runMs=${tm.executorRunTime} cpuMs=${tm.executorCpuTime / 1000000} " +
            f"deserMs=${tm.executorDeserializeTime}")
      }
    })
    val names =
      if (args.nonEmpty) args.toSeq else Seq("q_natural_dates", "q_crm_replay")
    for (name <- names; rep <- 1 to 3) {
      var t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // analysis + optimization + planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      // noop sink, NOT count(): count lets Catalyst prune unreferenced
      // projections, so a projection-shaped entry would time a pruned scan
      // instead of its real compute-dense work
      df.write.format("noop").mode("overwrite").save()
      val tExec = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      println(f"[probe] $name rep$rep build=$tBuild%.2f plan=$tPlan%.2f " +
        f"exec(noop)=$tExec%.2f rows=$n")
    }
    spark.stop()
  }
}
