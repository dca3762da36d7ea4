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

  /** Fixed-work CPU capacity probe: md5 a 64-byte buffer 200k times and
    * report the wall seconds. On an idle grant this is a near-constant
    * (~0.1-0.2 s); a hypervisor stall inflates it in lockstep with every
    * query timed next to it — stamping one reading per query makes a
    * BENCH outlier self-diagnosing (engine regression: probe flat, query
    * slow; host stall: probe inflates too). Same workload family as the
    * session-level probe BENCH.md documents.
    */
  def capacityProbeSec(): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](64)
    val t0 = System.nanoTime()
    var i = 0
    var acc = 0 // fold the digest back in so the loop cannot be dead-code'd
    while (i < 200000) {
      buf(0) = (i & 0xff).toByte
      buf(1) = acc.toByte
      acc ^= md.digest(buf)(0)
      i += 1
    }
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional subset for targeted reruns (comma-separated names); the
    // driver never sets it, so driver rounds always time everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var best = Double.MaxValue
      var rows = -1L
      var failures = 0
      var probeBest = Double.MaxValue
      for (_ <- 0 until reps) {
        // capacity stamp per rep, taken IMMEDIATELY before the timed run
        // so it shares the query's host window; keep the best (the reading
        // least polluted by a transient stall, matching best-of wall)
        val p = capacityProbeSec()
        if (p < probeBest) probeBest = p
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
        f"[bench] $name%-28s $score%8.2fs rows=$rows (best of $reps, $failures failed, capacity probe $probeBest%.3fs)")
      (name, score, probeBest)
    }
    // 4-decimal rounding keeps the line ~40% shorter so the whole summary
    // fits the driver's tail-capture window (round 6 lost its per-query
    // record to an unrounded line); -1.0 failure sentinel survives rounding
    def r4(v: Double): String = (math.rint(v * 10000) / 10000).toString
    // Double.toString, not the f-interpolator: %f is default-locale
    // sensitive and a comma-decimal locale would emit malformed JSON
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    // per-query capacity stamps travel in a SEPARATE map so the driver's
    // "queries" shape (flat name -> seconds) is unchanged
    val caps = results.map { case (k, _, p) => s"\"" + k + "\":" + r4(p) }
      .mkString("{", ",", "}")
    // the -1 failure sentinel stays in the per-query map but is EXCLUDED
    // from the headline total — summed in, a crashing 50 s query would
    // LOWER the total and read as a performance win across rounds; the
    // failed count makes a regression impossible to miss
    val ok = results.map(_._2).filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val nFailed = results.count(_._2 < 0)
    // "queries" is the LAST map before "sf": the driver's tail-capture
    // window clips from the front of long lines, and round 6 proved the
    // per-query map is the one artifact that must survive clipping
    println(s"""{"metric":"total","value":${r4(total)},"unit":"sec","failed":$nFailed,"capacity_probe_sec":$caps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
