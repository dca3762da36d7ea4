package graft

import org.apache.spark.sql.functions._
import graft.text.{Packing, Sampling, TextFunctions, TrainPipeline}

/** The train-prep composition: stage report arithmetic, rates computed
  * over the TRAIN split (not the corpus), per-shard stream contiguity
  * of the packed map, epoch spreading, and invariance.
  */
class TrainPipelineSpec extends SparkSuite {
  import spark.implicits._

  // 2,000 docs, 4 sources, token counts 5..24 — src3's val/test docs
  // would dilute its mixture rate if rates were (wrongly) computed over
  // the whole corpus instead of the train split
  private lazy val docs = spark.range(2000).select(
    $"id".as("doc_id"),
    concat(lit("src"), pmod($"id", lit(4))).as("source"),
    concat_ws(" ", array_repeat(lit("w"),
      (lit(5) + pmod($"id", lit(20))).cast("int"))).as("text"))

  private val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.15,
    "src3" -> 0.05)

  private def run(d: org.apache.spark.sql.DataFrame) =
    TrainPipeline.build(d, "doc_id", "text", "source", splits, "train",
      weights, tokenBudget = 100000L, maxRate = 8.0, blockLen = 64,
      nShards = 4)

  test("stage report: input, train split, mixed survivors, epoch rows all consistent") {
    val (packed, report) = run(docs)
    val r = report.as[(Int, String, Long)].collect()
      .map(x => x._2 -> x._3).toMap
    assert(r("input") === 2000L)
    val train = docs.where(
      Sampling.splitColumn($"doc_id", splits) === "train")
    assert(r("train_split") === train.count())
    val mixed = Sampling.mixtureCopies(
      train.withColumn("_toks",
        TextFunctions.tokenCount($"text").cast("long")),
      "doc_id", "source", $"_toks", weights, 100000L, 8.0)
    assert(r("mixed") === mixed.where($"copies" > 0L).count())
    val epochSum = mixed.agg(sum($"copies")).head.getLong(0)
    assert(r("epochs") === epochSum)
    // the packed map is exactly the epoch rows
    assert(packed.count() === epochSum)
  }

  test("mixture rates derive from the TRAIN split's totals — the composition pin") {
    val (packed, _) = run(docs)
    // reference: copies from mixtureCopies over the train split alone
    val train = docs.where(
      Sampling.splitColumn($"doc_id", splits) === "train")
    val want = Sampling.mixtureCopies(
      train.withColumn("_toks",
        TextFunctions.tokenCount($"text").cast("long")),
      "doc_id", "source", $"_toks", weights, 100000L, 8.0)
      .where($"copies" > 0L)
      .select($"doc_id", $"copies").as[(Long, Long)].collect().toMap
    val got = packed.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("per-shard stream contiguity: offsets advance by n_tokens + 1 from 0; blocks cover the span") {
    val (packed, _) = run(docs)
    val rows = packed.select($"shard", $"offset", $"n_tokens",
      $"first_block", $"last_block").as[(Int, Long, Long, Long, Long)]
      .collect()
    rows.groupBy(_._1).foreach { case (shard, ss) =>
      var expect = 0L
      ss.sortBy(_._2).foreach { case (_, off, n, fb, lb) =>
        assert(off === expect, s"shard $shard gap at $off")
        assert(fb === off / 64 && lb === math.max(off, off + n - 1) / 64)
        expect = off + n + 1
      }
    }
  }

  test("upsampled epochs spread: a multi-epoch doc's copies land at distinct stream positions") {
    val (packed, _) = run(docs)
    val multi = packed.groupBy($"doc_id")
      .agg(count(lit(1)).as("n"),
        countDistinct($"shard", $"offset").as("d"))
      .where($"n" > 1L).as[(Long, Long, Long)].collect()
    assert(multi.nonEmpty) // upsampling actually happened at these weights
    multi.foreach { case (id, n, d) => assert(n === d, s"doc $id") }
    // and they are NOT back-to-back: some multi-epoch doc has copies in
    // different shards (hash-spread, 4 shards, many multi-epoch docs)
    val spread = packed.groupBy($"doc_id")
      .agg(countDistinct($"shard").as("s"), count(lit(1)).as("n"))
      .where($"n" > 1L && $"s" > 1L).count()
    assert(spread > 0L)
  }

  test("plan shape: two hash exchanges (mixture totals + pack shard), one broadcast, no range sort") {
    val plan = run(docs)._1.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert("BroadcastExchange".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("packed map is partitioning-invariant; guards reject bad inputs") {
    def rows(d: org.apache.spark.sql.DataFrame) =
      run(d)._1.select($"doc_id", $"epoch", $"shard", $"offset")
        .as[(Long, Long, Int, Long)].collect().toSet
    assert(rows(docs.coalesce(1)) === rows(docs.repartition(11)))
    intercept[IllegalArgumentException] {
      TrainPipeline.build(docs, "doc_id", "text", "source", splits,
        "nope", weights, 1000L)
    }
    intercept[IllegalArgumentException] {
      TrainPipeline.build(docs, "doc_id", "text", "source", splits,
        "train", weights, 1000L, maxRate = 15.0)
    }
    intercept[IllegalArgumentException] {
      TrainPipeline.build(docs.withColumn("epoch", lit(1)), "doc_id",
        "text", "source", splits, "train", weights, 1000L)
    }
    // a non-integral id column breaks the epoch-key packing — rejected
    intercept[IllegalArgumentException] {
      TrainPipeline.build(
        docs.withColumn("doc_id", $"doc_id".cast("string")), "doc_id",
        "text", "source", splits, "train", weights, 1000L)
    }
  }
}
