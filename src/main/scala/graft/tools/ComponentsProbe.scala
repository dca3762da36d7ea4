package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.CorpusPipeline

/** Scale observables for the connected-components near-dup path (dev
  * tool, feeds BENCH.md):
  *
  *   - alternating large-star/small-star round count on the real
  *     documents near-dup graph (the scale-facing number: rounds are
  *     join+agg shuffles, so the round count IS the critical path length
  *     at 10^12 edges — Kiveris et al. 2014 bound it O(log n) where
  *     min-label propagation pays O(cluster diameter));
  *   - paired greedy-vs-components CorpusPipeline runs on the same input
  *     in the same host window, so the strategy surcharge is measured as
  *     a ratio, not an absolute confounded by the hypervisor grant.
  *
  * Usage: ComponentsProbe [sfDir] [threads]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-34s $s%8.2fs"); (r, s)
    }

    println(s"[probe] input=$dir docs=${docs.count()} threads=$threads")

    // the q_dedup_components graph config
    val (pairs, _) = time("minhash near-dup pairs") {
      val p = Dedup.minHashNearDups(docs, "doc_id", "text",
        threshold = 0.35, numHashes = 64, bands = 21,
        maxBucketSize = 200).localCheckpoint(true)
      println(s"[probe] pairs=${p.count()}"); p
    }
    val ((labels, rounds), _) = time("large/small-star components")(
      Dedup.connectedComponentsWithRounds(pairs, "a_id", "b_id",
        maxIters = 50))
    val nComp = labels.select(countDistinct(col("comp"))).first().getLong(0)
    println(s"[probe] star rounds=$rounds nodes=${labels.count()} " +
      s"components=$nComp")

    // paired strategy runs, same window: greedy then components then
    // greedy again (the repeat bounds window drift within the pair)
    def pipeline(strategy: String): Long = {
      val (kept, _) = CorpusPipeline.build(docs, "doc_id", "text",
        "lang", "source", nearDupStrategy = strategy, nearDupMaxIters = 50)
      kept.count()
    }
    val (g1, tg1) = time("pipeline greedy (1st)")(pipeline("greedy"))
    val (c1, tc1) = time("pipeline components")(pipeline("components"))
    val (_, tg2) = time("pipeline greedy (2nd)")(pipeline("greedy"))
    val tg = math.min(tg1, tg2)
    println(f"[probe] kept greedy=$g1 components=$c1 " +
      f"surcharge=${tc1 / tg}%.2fx (components ${tc1}%.2fs vs greedy $tg%.2fs)")
    spark.stop()
  }
}
