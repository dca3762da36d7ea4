package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  // clustered corpus: 3 clusters of near-identical directions in R^8
  private def vec(base: Int, wobble: Int): Seq[Float] =
    (0 until 8).map(i => (if (i % 3 == base) 10f else 1f) +
      0.05f * ((wobble * (i + 1)) % 7))

  private lazy val corpus = (0 until 30).map(i =>
    (i.toLong, vec(i % 3, i))).toDF("vec_id", "embedding")
  private lazy val queries = Seq(
    (100L, vec(0, 99)), (101L, vec(1, 55)), (102L, vec(2, 77))
  ).toDF("q_id", "q_vec")

  test("cosine: exact values on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 2.0), Seq(2.0, 4.0)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k: neighbours come from the query's own cluster, deterministic order") {
    val top = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
    val byQ = top.select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ(100L).forall(_ % 3 == 0), byQ(100L).toString)
    assert(byQ(101L).forall(_ % 3 == 1))
    assert(byQ(102L).forall(_ % 3 == 2))
    // rank 1..k, unique per query
    val ranks = top.groupBy("q_id").agg(collect_list("rank").as("r"))
      .select("r").as[Seq[Int]].collect()
    ranks.foreach(r => assert(r.sorted === (1 to 5)))
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5, planes = 8, tables = 4)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall lsh=$lsh")
  }

  test("IVF: probing all cells equals brute force exactly; nProbe=1 keeps high recall on clusters") {
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "id", "rank").as[(Long, Long, Int)].collect().toSet
    // probe EVERY cell → candidate set is the whole corpus → exact
    val all = Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nLists = 4, nProbe = 4, iters = 2)
      .select("q_id", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(all === brute)
    // probe half the cells: the clusters are well separated, so k-means
    // finds them and recall stays high (4 cells over 3 clusters means one
    // cluster straddles two cells — probe 2)
    val one = Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nLists = 4, nProbe = 2, iters = 2)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds & one).size.toDouble / bruteIds.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("hierarchical IVF: probing everything equals brute force exactly") {
    val brute = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val all = Similarity.ivfTopKHierarchical(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nCoarse = 3, nFine = 3, nProbeCoarse = 3, nProbeFine = 3, iters = 2)
      .select("q_id", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(all === brute)
    // and a selective probe still finds the query's own cluster
    val sel = Similarity.ivfTopKHierarchical(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nCoarse = 3, nFine = 2, nProbeCoarse = 2, nProbeFine = 2, iters = 2)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds & sel).size.toDouble / bruteIds.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("hierarchical IVF fine training: one bounded matrix per coarse cell, selective-probe quality robust to partitioning") {
    val coarse = Similarity.ivfTrain(corpus, "vec_id", "embedding",
      nLists = 3, iters = 2)
    val fm = Similarity.ivfTrainFine(corpus, "vec_id", "embedding",
      coarse, nFine = 2, iters = 2)
      .select($"cell", size($"fine_matrix").as("k"))
      .as[(Int, Int)].collect().toMap
    assert(fm.keySet.subsetOf((0 until 3).toSet))
    assert(fm.values.forall(k => k >= 1 && k <= 2), fm.toString)
    // SELECTIVE probes at two partitionings: bit-level model determinism
    // under repartitioning is NOT guaranteed (avg() merges float partials
    // in shuffle-arrival order), so the honest invariant is verdict-level:
    // each run must recover the query's cluster. (A probe-ALL comparison
    // here would be vacuous — it equals brute force regardless of what
    // the trainer produced.)
    val bruteIds = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopKHierarchical(df, queries,
        "vec_id", "embedding", "q_id", "q_vec", k = 5,
        nCoarse = 3, nFine = 2, nProbeCoarse = 2, nProbeFine = 2, iters = 2)
        .select("q_id", "id").as[(Long, Long)].collect().toSet
      (bruteIds & got).size.toDouble / bruteIds.size
    }
    assert(recall(corpus.coalesce(1)) >= 0.8)
    assert(recall(corpus.repartition(7)) >= 0.8)
  }

  test("IVF paths survive a malformed corpus row and agree with brute force on its exclusion") {
    // one corpus row with a NULL embedding element (Seq[Option[Float]])
    val bad = Seq((999L, Seq(Option(1f), None, Option(3f), Option(4f),
      Option(5f), Option(6f), Option(7f), Option(8f))))
      .toDF("vec_id", "embedding")
    val poisoned = corpus.select($"vec_id",
        $"embedding".cast("array<float>").as("embedding"))
      .unionByName(bad.select($"vec_id",
        $"embedding".cast("array<float>").as("embedding")))
    val brute = Similarity.bruteForceTopK(poisoned, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(!brute.exists(_._2 == 999L)) // NULL score never ranked
    val ivf = Similarity.ivfTopK(poisoned, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nLists = 4, nProbe = 4, iters = 2)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(ivf === brute)
    val hier = Similarity.ivfTopKHierarchical(poisoned, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5,
      nCoarse = 3, nFine = 3, nProbeCoarse = 3, nProbeFine = 3, iters = 2)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(hier === brute)
    // lshTopK: SRP buckets are computed per-vector independent of dim, so
    // the malformed row DOES land in real buckets — its NULL cosine must
    // be quarantined, never ranked (and no rank<=k row may carry a NULL
    // score when a bucket pool runs short of valid candidates)
    val lsh = Similarity.lshTopK(poisoned, queries,
      "vec_id", "embedding", "q_id", "q_vec", k = 5)
    assert(lsh.where($"score".isNull).isEmpty)
    assert(!lsh.select("id").as[Long].collect().contains(999L))
  }

  test("ivfTrain survives empty and ragged vectors landing among the seeds") {
    // nLists covers the whole corpus, so without the guard the empty and
    // the 3-dim rows WOULD be selected as seeds and break NearestCells'
    // rectangular-matrix require at plan build
    val mixed = (Seq(
        (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
        (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0f, 0f, 1f)),
        (5L, Seq.empty[Float]), (6L, Seq(1f, 2f, 3f))))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val cents = Similarity.ivfTrain(mixed, "vec_id", "embedding",
      nLists = 6, iters = 2)
    assert(cents.nonEmpty && cents.forall(_.length == 4)) // modal dim only
    val q = Seq((100L, Seq(1f, 0f, 0f, 0f))).toDF("q_id", "q_vec")
      .select($"q_id", $"q_vec".cast("array<float>").as("q_vec"))
    val ivf = Similarity.ivfTopK(mixed, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 3, nLists = 6, nProbe = 6, iters = 2)
      .select("id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(mixed, q, "vec_id", "embedding",
      "q_id", "q_vec", k = 3).select("id").as[Long].collect().toSet
    assert(ivf === brute)
    assert(!ivf.contains(5L) && !ivf.contains(6L)) // off-dim rows quarantined
  }

  test("NearestCells refuses malformed embeddings (null elements / dim mismatch) like DotProduct") {
    import graft.functions.SketchExpressions.nearestCells
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
    val rows: Seq[(Long, Seq[Option[Double]])] = Seq(
      (1L, Seq(Some(1.0), Some(0.1), Some(0.0))),   // well-formed
      (2L, Seq(Some(1.0), None, Some(0.0))),        // null element
      (3L, Seq(Some(1.0), Some(0.0))))              // dim ≠ trained dim
    val got = rows.toDF("id", "vec")
      .select($"id", nearestCells($"vec".cast("array<double>"), cents, 1)
        .as("cells"))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(got(1L) === Some(Seq(0)))
    // a row the exact-cosine verify would NULL out must not be bucketed
    assert(got(2L) === None)
    assert(got(3L) === None)
  }

  test("IVF assignment plan is O(1) in nLists (matrix rides in the expression, not the tree)") {
    // 600 vectors so even 256 lists train meaningfully
    val big = (0 until 600).map(i => (i.toLong, vec(i % 3, i)))
      .toDF("vec_id", "embedding")
    val qs = queries
    def planLen(nLists: Int): Int = {
      val df = Similarity.ivfTopK(big, qs, "vec_id", "embedding",
        "q_id", "q_vec", k = 5, nLists = nLists, nProbe = 2, iters = 1)
      df.queryExecution.optimizedPlan.toString.length
    }
    val l4 = planLen(4)
    val l256 = planLen(256)
    // round-2's per-centroid struct subtrees grew the plan with nLists
    // (k subtrees + a k-element per-row sort — unusable at the 10^4-10^6
    // lists real IVF wants); NearestCells keeps it flat
    assert(l256 <= l4 * 12 / 10, s"plan grew with nLists: $l4 -> $l256")
    // and the 256-list index still returns sane neighbours
    val got = Similarity.ivfTopK(big, qs, "vec_id", "embedding",
      "q_id", "q_vec", k = 5, nLists = 256, nProbe = 64, iters = 1)
      .select("q_id", "id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(100L).forall(_ % 3 == 0), got(100L).toString)
  }

  test("IVF training is deterministic across partitioning") {
    val c1 = Similarity.ivfTrain(corpus, "vec_id", "embedding", nLists = 4, iters = 2)
    val c2 = Similarity.ivfTrain(corpus.repartition(7), "vec_id", "embedding",
      nLists = 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
  }

  test("cosine near-dups: same-cluster pairs only, above threshold") {
    val small = (0 until 12).map(i => (i.toLong, vec(i % 3, i)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDups(small, "vec_id", "embedding",
      threshold = 0.99, planes = 6, tables = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(a % 3 === b % 3, s"($a,$b)") }
  }

  test("cosine near-dups: stop-band caps a degenerate hot bucket, verdicts on the rest unchanged") {
    // 50 templated vectors share ONE direction (⇒ one SRP bucket per table:
    // 50·49/2 = 1225 candidate pairs each, the quadratic blowup), plus two
    // genuine near-dup pairs in other directions.
    val hot = (0 until 50).map(i => (i.toLong, vec(0, 0)))
    val pairA = Seq((100L, vec(1, 5)), (101L, vec(1, 5)))
    val pairB = Seq((200L, vec(2, 9)), (201L, vec(2, 9)))
    val df = (hot ++ pairA ++ pairB).toDF("vec_id", "embedding")

    val capped = Similarity.cosineNearDups(df, "vec_id", "embedding",
      threshold = 0.999, planes = 6, tables = 3, maxBucketSize = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // the hot-template pairs are stop-banded away; the genuine pairs survive
    assert(capped === Set((100L, 101L), (200L, 201L)), capped.toString)

    // uncapped still finds the genuine pairs PLUS the quadratic hot mass
    val uncapped = Similarity.cosineNearDups(df, "vec_id", "embedding",
      threshold = 0.999, planes = 6, tables = 3, maxBucketSize = 100000)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(uncapped.size > 1000, uncapped.size.toString)
    assert((capped -- uncapped).isEmpty)
  }

  test("SRP buckets are deterministic across runs and partitioning") {
    val b1 = corpus.select($"vec_id",
      Similarity.srpBucket($"embedding".cast("array<double>"), 8).as("b"))
      .as[(Long, Long)].collect().toMap
    val b2 = corpus.repartition(7).select($"vec_id",
      Similarity.srpBucket($"embedding".cast("array<double>"), 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b1 === b2)
  }
}
