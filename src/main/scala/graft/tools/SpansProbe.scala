package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale observables for the substring-level repeated-span pass (dev tool,
  * feeds BENCH.md): wall clock, total window count (the shuffled volume —
  * one (id, 8-byte hash) pair per window), and the duplicated-hash set
  * size at ×1 vs ×10 input. The pass is two linear shuffles (distinct +
  * count per hash, then one equi-join back); the probe's job is to show
  * the wall tracks the window count, not the square of it, on the
  * near-duplicate-heavy scaled corpus where almost every window IS
  * duplicated — the adversarial case for anything pair-based.
  *
  * Usage: SpansProbe [sfDir] [threads] [k]
  */
object SpansProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val threads = if (args.length > 1) args(1) else "32"
    val k = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    println(s"[probe] input=$dir docs=${docs.count()} threads=$threads k=$k")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = k)
    val agg = time("repeatedSpans full pass") {
      spans.agg(
        sum(col("n_windows")).as("windows"),
        sum(col("dup_windows")).as("dup_windows"),
        count(lit(1)).as("docs")).first()
    }
    println(s"[probe] windows=${agg.getLong(0)} dup_windows=${agg.getLong(1)} " +
      s"docs=${agg.getLong(2)}")
    spark.stop()
  }
}
