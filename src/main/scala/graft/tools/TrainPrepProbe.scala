package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{LangModel, Packing, Sampling, TextFunctions, Vocab}

/** Scaling probe (dev tool) for the round-7 train-prep operators, at
  * corpus ×1 vs ×10 on the same host:
  *
  *  - [[Packing.packSequences]]: a per-shard prefix sum — pure linear;
  *    ×10 docs should ride the job floor.
  *  - [[Sampling.mixtureCopies]] + [[Sampling.explodeCopies]]: one
  *    aggregate + one broadcast join + a bounded explode — linear.
  *  - [[LangModel.scoreCharLm]]: the explode is per CHARACTER, so cost
  *    tracks total scored text; model fixed across levels (it is
  *    alphabet-bounded, not corpus-bounded).
  *  - [[Packing.blockSlices]]: the packed map exploded per (doc, block)
  *    — bounded expansion, linear in corpus tokens.
  *  - [[Sampling.splitColumn]]: one hash comparison per row — the floor.
  *  - [[Vocab.topTokens]]/[[Vocab.topPairs]]: explode linear in tokens,
  *    shuffle vocabulary-sized, top-k take-ordered.
  *  - [[Sampling.quantileBuckets]]: histogram aggregate + broadcast
  *    join-back — linear scan, shuffle = distinct (group, score) values.
  *
  * Same protocol as [[SubdocProbe]]: one discarded warmup rep per
  * (operator, level), then best-of-N wall + output cardinality.
  */
object TrainPrepProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).cache()
    docs.count()

    def level(tag: String, d: DataFrame)(run: DataFrame => Long): Unit = {
      val n = d.count()
      run(d) // discarded warmup
      var best = Double.MaxValue
      var out = -1L
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        out = run(d)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $tag%-16s docs=$n%6d wall=$best%6.2fs out=$out")
    }

    val x1 = docs.where(col("doc_id") < 500)

    def packRun(d: DataFrame): Long =
      Packing.packSequences(d, "doc_id",
          TextFunctions.tokenCount(col("text")), blockLen = 128, nShards = 8)
        .agg(max(col("last_block"))).head.getLong(0)
    level("pack_x1", x1)(packRun)
    level("pack_x10", docs)(packRun)

    val weights = Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.08,
      "src3" -> 0.02)
    def mixRun(d: DataFrame): Long =
      Sampling.explodeCopies(Sampling.mixtureCopies(d, "doc_id", "source",
          TextFunctions.tokenCount(col("text")), weights,
          tokenBudget = 300000L, maxRate = 8.0))
        .count()
    level("mix_x1", x1)(mixRun)
    level("mix_x10", docs)(mixRun)

    // model FIXED across levels (trained once on the ×1 slice's %5
    // subset), scored corpus grows 10× — cost should track scored chars
    val model = LangModel.trainCharLm(
      x1.where(pmod(col("doc_id"), lit(5)) === 0), "text", n = 3)
      .cache()
    println(s"[probe] model grams: ${model.count()}")
    def lmRun(d: DataFrame): Long =
      LangModel.scoreCharLm(d, "doc_id", "text", model, n = 3)
        .agg(sum(col("sum_gram"))).head.getLong(0)
    level("charlm_x1", x1)(lmRun)
    level("charlm_x10", docs)(lmRun)

    def slicesRun(d: DataFrame): Long =
      Packing.blockSlices(
        Packing.packSequences(d, "doc_id",
          TextFunctions.tokenCount(col("text")), blockLen = 128,
          nShards = 8), blockLen = 128).count()
    level("slices_x1", x1)(slicesRun)
    level("slices_x10", docs)(slicesRun)

    def splitRun(d: DataFrame): Long =
      d.select(Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("s"))
        .where(col("s") === "train").count()
    level("split_x1", x1)(splitRun)
    level("split_x10", docs)(splitRun)

    def vocabRun(d: DataFrame): Long =
      Vocab.topTokens(d, "text", 1000).count() +
        Vocab.topPairs(d, "text", 1000).count()
    level("vocab_x1", x1)(vocabRun)
    level("vocab_x10", docs)(vocabRun)

    def bucketRun(d: DataFrame): Long =
      Sampling.quantileBuckets(d.withColumn("len", length(col("text"))),
          "len", Seq("source"), k = 3)
        .where(col("bucket") === 2).count()
    level("buckets_x1", x1)(bucketRun)
    level("buckets_x10", docs)(bucketRun)

    def dsirRun(d: DataFrame): Long = {
      val isT = pmod(col("doc_id"), lit(10)) === 0
      val tf = graft.text.Importance.hashedNgramCounts(
        d.where(isT), "doc_id", "text", 10000)
      val rf = graft.text.Importance.hashedNgramCounts(
        d.where(!isT), "doc_id", "text", 10000)
      graft.text.Importance.importanceWeights(rf,
          graft.text.Importance.bucketTotals(tf),
          graft.text.Importance.bucketTotals(rf), "doc_id", 10000)
        .agg(sum(col("n_grams"))).head.getLong(0)
    }
    level("dsir_x1", x1)(dsirRun)
    level("dsir_x10", docs)(dsirRun)

    def blockTextRun(d: DataFrame): Long =
      Packing.blockTokens(
        Packing.packSequences(d, "doc_id",
          TextFunctions.tokenCount(col("text")), blockLen = 128,
          nShards = 8), "text", blockLen = 128)
        .agg(sum(col("n_filled"))).head.getLong(0)
    level("blocktext_x1", x1)(blockTextRun)
    level("blocktext_x10", docs)(blockTextRun)

    def pipeRun(d: DataFrame): Long = {
      val (packed, _) = graft.text.TrainPipeline.build(d, "doc_id",
        "text", "source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "train",
        weights, tokenBudget = 300000L, maxRate = 8.0, blockLen = 128,
        nShards = 8)
      packed.agg(max(col("last_block"))).head.getLong(0)
    }
    level("pipeline_x1", x1)(pipeRun)
    level("pipeline_x10", docs)(pipeRun)
    spark.stop()
  }
}
