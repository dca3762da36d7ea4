package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR, printed
  * as one JSON line. Each query runs REPS times and reports the BEST wall
  * clock — this host is hypervisor-oversubscribed (2-6 effective cores
  * behind 32 advertised), so a single cold run conflates engine cost with
  * scheduler noise (round-1's q_icontains read 58 s for a 15k-row filter).
  * Failures are printed with their stack trace and scored -1, never
  * silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var rows = -1L
      var failures = 0
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        try {
          rows = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          if (dt < best) best = dt
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          e.printStackTrace()
          failures += 1
        }
      }
      // a transient rep failure must not discard a valid measurement;
      // -1 only when NO rep succeeded
      val score = if (best == Double.MaxValue) -1.0 else best
      System.err.println(
        f"[bench] $name%-28s $score%8.2fs rows=$rows (best of $reps, $failures failed)")
      name -> score
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // the -1 failure sentinel stays in the per-query map but is EXCLUDED
    // from the headline total — summed in, a crashing 50 s query would
    // LOWER the total and read as a performance win across rounds; the
    // failed count makes a regression impossible to miss
    val ok = results.map(_._2).filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
