package graft

import org.apache.spark.sql.functions._
import graft.text.Sampling

/** Deterministic sampling: same selected SET across partitionings and
  * reruns, monotone under rate growth, per-stratum rates honoured.
  */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.range(20000)
    .select($"id", concat(lit("doc"), $"id").as("key"),
      element_at(array(lit("en"), lit("de"), lit("fr")),
        (pmod($"id", lit(3)) + 1).cast("int")).as("lang"))

  test("membership is a pure function of the key: partitioning/rerun invariant, supersets monotone") {
    def ids(df: org.apache.spark.sql.DataFrame, rate: Double): Set[Long] =
      Sampling.deterministicSample(df, "key", rate)
        .select($"id").as[Long].collect().toSet
    val a = ids(docs.coalesce(1), 0.1)
    val b = ids(docs.repartition(13), 0.1)
    assert(a === b)
    // realized fraction near the target (20k keys → tight binomial)
    assert(math.abs(a.size / 20000.0 - 0.1) < 0.02, a.size.toString)
    // growing the rate only ADDS rows — monotone training-set growth
    val bigger = ids(docs, 0.3)
    assert(a.subsetOf(bigger))
    // a different seed is a different (but equally deterministic) set
    val other = Sampling.deterministicSample(docs, "key", 0.1, seed = 7L)
      .select($"id").as[Long].collect().toSet
    assert(other !== a)
    assert(math.abs(other.size / 20000.0 - 0.1) < 0.02)
  }

  test("deterministic shuffle replays identically; shards are stable and balanced") {
    val order1 = Sampling.deterministicShuffle(docs.repartition(5), "key")
      .select($"id").as[Long].collect().toSeq
    val order2 = Sampling.deterministicShuffle(docs.coalesce(1), "key")
      .select($"id").as[Long].collect().toSeq
    assert(order1 === order2)
    assert(order1 !== order1.sorted, "hash order should not be id order")
    // shard assignment: invariant to partitioning, near-uniform
    val shards = docs.select($"id",
      Sampling.shardColumn($"key", 8).as("shard"))
    val byShard = shards.groupBy($"shard").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(byShard.keySet === (0 until 8).toSet)
    assert(byShard.values.forall(n => n > 2000 && n < 3000), byShard.toString)
    val again = docs.repartition(11).select($"id",
      Sampling.shardColumn($"key", 8).as("shard"))
      .as[(Long, Int)].collect().toMap
    val first = shards.as[(Long, Int)].collect().toMap
    assert(first === again)
  }

  test("sharded sort-within-partitions equals the global shuffle per shard (the 10^12-row form)") {
    // the scale recipe from deterministicShuffle's scaladoc: hash-shard,
    // then sort within partitions — each shard's order must equal the
    // global sort restricted to that shard's rows
    val n = 8
    val sharded = docs
      .repartition(n, Sampling.shardColumn($"key", n))
      .sortWithinPartitions(xxhash64($"key", lit(42L)), $"key")
      .select(Sampling.shardColumn($"key", n).as("shard"), $"id")
      .as[(Int, Long)]
      .mapPartitions(it => it.toSeq.groupBy(_._1).iterator
        .map { case (s, rows) => (s, rows.map(_._2)) })
      .collect().toMap
    val global = Sampling.deterministicShuffle(docs, "key")
      .select(Sampling.shardColumn($"key", n).as("shard"), $"id")
      .as[(Int, Long)].collect()
    (0 until n).foreach { s =>
      assert(sharded(s) === global.filter(_._1 == s).map(_._2).toSeq,
        s"shard $s order diverged")
    }
  }

  test("stratified rates per language; unlisted strata drop like sampleBy") {
    val got = Sampling.stratifiedSample(docs, "key", "lang",
        Map("en" -> 0.5, "de" -> 0.05))
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(!got.contains("fr"))
    assert(math.abs(got("en") / 6667.0 - 0.5) < 0.05, got.toString)
    assert(math.abs(got("de") / 6667.0 - 0.05) < 0.02, got.toString)
  }

  test("capPerKey: exact top-k per key, ties broken, salted two-phase identical to unsalted on a skewed corpus") {
    // skew: host A has 5,000 rows, B has 7, C has 2 (under the cap)
    val rows = (0 until 5000).map(i => ("A", i.toLong, (i % 13).toLong)) ++
      (0 until 7).map(i => ("B", (10000 + i).toLong, 5L)) ++ // all-tied
      (0 until 2).map(i => ("C", (20000 + i).toLong, 1L))
    val df = rows.toDF("host", "id", "score")
    val order = Seq(col("score").desc, col("id"))
    val plain = Sampling.capPerKey(df, Seq("host"), order, k = 5)
      .select("host", "id").as[(String, Long)].collect().toSet
    val salted = Sampling.capPerKey(df, Seq("host"), order, k = 5,
      saltOn = Some(col("id")), nSalts = 8)
      .select("host", "id").as[(String, Long)].collect().toSet
    assert(salted === plain) // two-phase is EXACT, not approximate
    assert(plain.count(_._1 == "A") === 5)
    assert(plain.count(_._1 == "B") === 5) // ties broken by id: lowest 5
    assert(plain.filter(_._1 == "B").map(_._2).toSeq.sorted ===
      Seq(10000L, 10001L, 10002L, 10003L, 10004L))
    assert(plain.count(_._1 == "C") === 2) // under-cap keys keep all rows
    // host A: score desc (12 first), tie-break by ascending id
    val aTop = plain.filter(_._1 == "A").map(_._2).toSeq.sorted
    assert(aTop === Seq(12L, 25L, 38L, 51L, 64L)) // the five lowest-id score-12 rows
    // partitioning-invariant: the kept set is a pure function of the
    // total order, on both the plain and salted paths
    val saltedRepart = Sampling.capPerKey(df.repartition(11), Seq("host"),
      order, k = 5, saltOn = Some(col("id")), nSalts = 8)
      .select("host", "id").as[(String, Long)].collect().toSet
    assert(saltedRepart === plain)
  }

  test("mixtureCopies: exact rates give exact copies, cap engages, unweighted sources keep 0, realized tokens near target") {
    // A: 100 docs x 1 token -> T=100; B: 1000 x 1 -> T=1000; C: 50 x 1;
    // D unweighted. budget=400, maxRate=2.5: A rate (400*0.5)/100 = 2.0
    // exactly, uncapped, frac 0 -> every A doc exactly 2 copies; C rate
    // (400*0.375)/50 = 3.0 CAPPED to 2.5 (frac .5 -> 2 or 3 copies by
    // hash); B rate (400*0.25)/1000 = 0.1 downsample.
    val mix = (0 until 100).map(i => (s"a$i", "A")) ++
      (0 until 1000).map(i => (s"b$i", "B")) ++
      (0 until 50).map(i => (s"c$i", "C")) ++
      (0 until 30).map(i => (s"d$i", "D"))
    val df = mix.toDF("key", "src").withColumn("toks", lit(1L))
    def copies(d: org.apache.spark.sql.DataFrame, budget: Long) =
      Sampling.mixtureCopies(d, "key", "src", col("toks"),
        Map("A" -> 0.5, "B" -> 0.25, "C" -> 0.375), budget, maxRate = 2.5)
    val got = copies(df, 400L).select($"key", $"src", $"copies")
      .as[(String, String, Long)].collect()
    assert(got.filter(_._2 == "A").forall(_._3 == 2L))
    assert(got.filter(_._2 == "D").forall(_._3 == 0L))
    assert(got.filter(_._2 == "C").forall(r => r._3 == 2L || r._3 == 3L))
    assert(got.filter(_._2 == "B").forall(r => r._3 == 0L || r._3 == 1L))
    // realized totals concentrate on the target (1-token docs: copies
    // sum); C's target is the CAPPED 50*2.5 = 125, not budget*w = 150
    val cSum = got.filter(_._2 == "C").map(_._3).sum
    val bSum = got.filter(_._2 == "B").map(_._3).sum // target 100
    assert(math.abs(cSum - 125L) <= 15, cSum.toString)
    assert(math.abs(bSum - 100L) <= 30, bSum.toString)
    // deterministic across partitioning
    assert(copies(df.repartition(13), 400L).select($"key", $"copies")
      .as[(String, Long)].collect().toMap ===
      got.map(r => r._1 -> r._3).toMap)
    // growing the budget never removes a copy (monotone, like
    // deterministicSample supersets)
    val bigger = copies(df, 700L)
      .select($"key", $"copies").as[(String, Long)].collect().toMap
    got.foreach { case (k, _, c) => assert(bigger(k) >= c, k) }
  }

  test("splitColumn: total, invariant, near-weight fractions, prefix-monotone rebalance") {
    def assign(d: org.apache.spark.sql.DataFrame,
        splits: Seq[(String, Double)]) =
      d.select($"id", Sampling.splitColumn($"key", splits).as("s"))
        .as[(Long, String)].collect().toMap
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = assign(docs.coalesce(1), splits)
    assert(a === assign(docs.repartition(9), splits))
    assert(a.size === 20000 && a.values.forall(Set("train", "val", "test")))
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 20000.0)
    assert(math.abs(frac("train") - 0.8) < 0.02, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.02, frac.toString)
    // growing train's share only steals from later splits: every row
    // that was train stays train
    val b = assign(docs, Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    a.foreach { case (id, s) => if (s == "train") assert(b(id) == "train") }
    // degenerate weights stay total
    val c = assign(docs, Seq("all" -> 1.0, "none" -> 0.0))
    assert(c.values.forall(_ == "all"))
  }

  test("quantileBuckets: exact rank cuts, ties share a bucket, per-group independence, invariance") {
    import org.apache.spark.sql.DataFrame
    def buckets(d: DataFrame, k: Int): Map[(String, Long), Int] =
      Sampling.quantileBuckets(d, "score", Seq("g"), k)
        .select($"g", $"id", $"bucket").as[(String, Long, Int)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    // group A: 6 distinct scores, k=3 → exactly 2 per bucket;
    // group B: a fat tie (score 5 × 4 rows) straddling the 1/3 cut —
    // the whole tie lands in ONE bucket (value-boundary cuts)
    val df = (Seq(("A", 1L, 10), ("A", 2L, 20), ("A", 3L, 30),
      ("A", 4L, 40), ("A", 5L, 50), ("A", 6L, 60)) ++
      Seq(("B", 10L, 1), ("B", 11L, 5), ("B", 12L, 5), ("B", 13L, 5),
        ("B", 14L, 5), ("B", 15L, 9))).toDF("g", "id", "score")
    val got = buckets(df, 3)
    assert(got(("A", 1L)) === 0 && got(("A", 2L)) === 0)
    assert(got(("A", 3L)) === 1 && got(("A", 4L)) === 1)
    assert(got(("A", 5L)) === 2 && got(("A", 6L)) === 2)
    // B: below(1)=0 → 0; below(5)=1 → (1*3) div 6 = 0 for ALL four
    // tied rows; below(9)=5 → (5*3) div 6 = 2 (bucket 1 empty: tie mass)
    assert(got(("B", 10L)) === 0)
    Seq(11L, 12L, 13L, 14L).foreach(i => assert(got(("B", i)) === 0))
    assert(got(("B", 15L)) === 2)
    // k=1 → everything bucket 0; partitioning invariance
    assert(buckets(df, 1).values.forall(_ === 0))
    assert(buckets(df.repartition(7), 3) === got)
    // the bucket map joins back broadcast (histogram-sized build side)
    val plan = Sampling.quantileBuckets(df, "score", Seq("g"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // NULLs are data: a null score (or group) keeps its row with a NULL
    // bucket, and the cuts over the scored population are unchanged
    val withNull = df.unionByName(Seq(("A", 7L, null.asInstanceOf[
      Integer]).asInstanceOf[(String, Long, Integer)])
      .toDF("g", "id", "score").select($"g", $"id",
        $"score".cast("int").as("score")))
    val nb = Sampling.quantileBuckets(withNull, "score", Seq("g"), 3)
      .select($"id", $"bucket").as[(Long, Option[Int])].collect().toMap
    assert(nb.size === 13 && nb(7L).isEmpty)
    assert(nb(1L).contains(0) && nb(6L).contains(2))
  }

  test("quantileBuckets properties on randomized score multisets: totality, monotone in score, size bound") {
    val rng = new scala.util.Random(4242)
    (1 to 5).foreach { trial =>
      val k = 2 + rng.nextInt(5)
      val rows = (1 to 500 + rng.nextInt(1500)).map(i =>
        (i.toLong, rng.nextInt(1 + rng.nextInt(40))))
      val df = rows.toDF("id", "score")
      val got = Sampling.quantileBuckets(df, "score", Seq.empty, k)
        .select($"id", $"score", $"bucket").as[(Long, Int, Int)]
        .collect()
      assert(got.length === rows.length, s"trial $trial: total")
      // bucket is a monotone function of the score value alone
      val byScore = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
      byScore.foreach { case (sc, bs) =>
        assert(bs.size === 1, s"trial $trial score $sc")
      }
      val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
      assert(ordered === ordered.sorted, s"trial $trial monotone")
      assert(got.forall(r => r._3 >= 0 && r._3 < k), s"trial $trial range")
      // size bound: a bucket exceeds n/k by at most its largest tie mass
      val n = rows.length
      val tieMass = rows.groupBy(_._2).values.map(_.size).max
      got.groupBy(_._3).values.map(_.size).foreach(sz =>
        assert(sz <= n / k + tieMass, s"trial $trial size $sz"))
    }
  }

  test("explodeCopies: one row per epoch, zero-copy rows drop") {
    val df = Seq(("x", 3L), ("y", 1L), ("z", 0L)).toDF("key", "copies")
    val got = Sampling.explodeCopies(df)
      .select($"key", $"epoch").as[(String, Long)].collect().toSet
    assert(got === Set(("x", 1L), ("x", 2L), ("x", 3L), ("y", 1L)))
  }
}
