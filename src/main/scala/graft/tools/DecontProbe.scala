package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Decontamination scaling probe (dev tool): crossCorpusNearDups wall at
  * train×1 vs train×10 with a FIXED eval side — the claim under test is
  * that the banded train×eval join costs eval-sized work per bucket, so
  * growing the train side pays only the linear signature/banding cost of
  * the new train docs, never train² (or train×eval-everything) pair work.
  * Prints best-of-N wall + candidate/verified pair counts per level for
  * BENCH.md.
  */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    // eval fixed across levels: every ~170th doc of the big corpus, so
    // train x10 contains ALL of eval verbatim and train x1 a tenth of it
    val eval = docs.where(col("doc_id") % 170 === 0)
    val nEval = eval.count()
    println(s"[probe] eval docs: $nEval")

    def level(tag: String, train: org.apache.spark.sql.DataFrame): Unit = {
      val nTrain = train.count()
      var best = Double.MaxValue
      var pairs = -1L
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        pairs = Dedup.crossCorpusNearDups(train, eval, "doc_id", "text",
          threshold = 0.5, numHashes = 64, bands = 16, k = 3).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $tag%-10s train=$nTrain%6d wall=$best%6.2fs pairs=$pairs")
    }
    level("train_x1", docs.where(col("doc_id") < 500))
    level("train_x10", docs)
    spark.stop()
  }
}
