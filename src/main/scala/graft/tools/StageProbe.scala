package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Empirical per-query breakdown for the optimization loop (guide §1):
  * runs named SparkEntry queries under a listener and prints, per query,
  * the number of Spark jobs, and per stage the task count and summed task
  * time — the numbers that separate "plan does too much work" from
  * "fixed scheduling machinery" at bench scale.
  *
  * Usage: runMain graft.tools.StageProbe <q1,q2,...> [reps]
  */
object StageProbe {

  final class Rec extends SparkListener {
    val stages = mutable.Map[Int, (String, Int, Long)]() // id -> (name, tasks, ms)
    var jobs = 0
    val taskMs = mutable.Map[Int, Long]().withDefaultValue(0L)
    val taskN = mutable.Map[Int, Int]().withDefaultValue(0)
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      taskMs(t.stageId) += t.taskInfo.duration
      taskN(t.stageId) += 1
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized {
        stages(s.stageInfo.stageId) = (s.stageInfo.name.take(60),
          taskN(s.stageInfo.stageId), taskMs(s.stageInfo.stageId))
      }
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSet
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional conf overrides: SPARK_GRAFT_PROBE_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      System.err.println(s"[probe] conf $k=$v")
    })
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.contains(n) }
      .foreach { case (name, fn) =>
        var best = Double.MaxValue
        var bestRec: Rec = null
        for (r <- 0 until reps) {
          val rec = new Rec
          spark.sparkContext.addSparkListener(rec)
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          // drain listener events before reading (the bus is async)
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(rec)
          if (dt < best) { best = dt; bestRec = rec }
          println(f"[probe] $name rep=$r wall=$dt%.3f rows=$rows jobs=${rec.jobs}")
        }
        val totTasks = bestRec.stages.values.map(_._2).sum
        val totMs = bestRec.stages.values.map(_._3).sum
        println(f"[probe] $name BEST wall=$best%.3f jobs=${bestRec.jobs} " +
          f"stages=${bestRec.stages.size} tasks=$totTasks taskMs=$totMs")
        bestRec.stages.toSeq.sortBy(-_._2._3).take(12).foreach {
          case (id, (n, nt, ms)) =>
            println(f"[probe]   stage $id%4d tasks=$nt%4d taskMs=$ms%6d  $n")
        }
      }
    spark.stop()
  }
}
