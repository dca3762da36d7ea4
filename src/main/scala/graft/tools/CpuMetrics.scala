package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared task-metric accumulator for the bench/probe tools: executor CPU
  * time is the hypervisor-noise-reduced work signal, run time and GC time
  * contextualize it. Listener events drain asynchronously — call
  * [[settle]] before reading after an action completes.
  */
final class CpuMetrics(sc: SparkContext) {
  val cpuNanos = new AtomicLong(0L)
  val runMillis = new AtomicLong(0L)
  val gcMillis = new AtomicLong(0L)

  sc.addSparkListener(new SparkListener {
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) {
        cpuNanos.addAndGet(e.taskMetrics.executorCpuTime)
        runMillis.addAndGet(e.taskMetrics.executorRunTime)
        gcMillis.addAndGet(e.taskMetrics.jvmGCTime)
      }
  })

  def reset(): Unit = { cpuNanos.set(0L); runMillis.set(0L); gcMillis.set(0L) }

  /** Drain the async listener bus before reading (trailing TaskEnd events
    * would otherwise undercount cpu_sec — the very signal BENCH.md grades
    * on). `listenerBus.waitUntilEmpty` is private[spark] (= public in
    * bytecode), reached via reflection; fixed sleep only as the fallback.
    */
  def settle(ms: Long = 1000L): Unit = {
    val t0 = System.nanoTime()
    try {
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(ms))
    } catch {
      case _: Throwable =>
        // waitUntilEmpty's own TimeoutException (wrapped in an ITE) means
        // the full budget elapsed — nothing left to wait. Any FASTER
        // failure (stopped bus, missing method, non-timeout ITE cause)
        // must still cover the drain window with the old fixed sleep, or
        // trailing TaskEnd events undercount cpu_sec.
        val waitedMs = (System.nanoTime() - t0) / 1000000L
        if (waitedMs < ms) Thread.sleep(ms - waitedMs)
    }
  }

  def cpuSec: Double = cpuNanos.get() / 1e9
  def runSec: Double = runMillis.get() / 1e3
  def gcSec: Double = gcMillis.get() / 1e3
}
