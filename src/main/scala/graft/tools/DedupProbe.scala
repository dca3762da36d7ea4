package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-by-stage timing probe for the near-dup pipelines (dev tool). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }

    time("docs count")(docs.count())
    val shh = Dedup.withShingleHashes(docs, "text", 3)
    time("shingle hashes only")(
      shh.select(sum(size(col("_shh")))).collect())
    for (n <- Seq(1, 8, 64)) {
      val s2 = Dedup.withMinHash(docs, "text", numHashes = n, k = 3)
      time(s"minhash x$n")(
        s2.select(sum(size(col("minhash")))).collect())
    }
    val sig = Dedup.withMinHash(docs, "text", numHashes = 64, k = 3)
    time("minhash signatures")(sig.select("doc_id", "minhash").count())
    val sigC = sig.select("doc_id", "minhash").cache()
    time("sig materialize")(sigC.count())
    val cands = Dedup.lshCandidates(sigC, "doc_id", bands = 21, maxBucketSize = 200)
    val nC = time("lsh candidates")(cands.count())
    println(s"[probe] candidate pairs: $nC")
    val verified = Dedup.jaccardVerify(docs, cands, "doc_id", "text", 3)
    time("jaccard verify")(verified.where(col("jaccard") >= 0.35).count())
    spark.stop()
  }
}
