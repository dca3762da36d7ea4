package graft

import org.apache.spark.sql.functions._
import graft.text.Importance

/** DSIR importance weighting: feature-mass arithmetic, hashing
  * determinism, and the log-weight pinned against a driver-side
  * reference (the transcendental half the oracle row leaves ungraded).
  */
class ImportanceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val target = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "alpha gamma gamma beta alpha")).toDF("doc_id", "text")
  private lazy val raw = Seq(
    (1L, "alpha beta gamma"),          // target-like
    (2L, "zeta eta theta iota"),       // disjoint vocabulary
    (3L, "alpha zeta"),                // mixed
    (4L, ""),
    (5L, null.asInstanceOf[String])).toDF("doc_id", "text")

  test("hashedNgramCounts: gram mass = tokens + bigrams, edge docs emit nothing, same text same features") {
    val f = Importance.hashedNgramCounts(raw, "doc_id", "text", 1024)
      .as[(Long, Long, Long)].collect()
    val mass = f.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // doc 1: 3 tokens + 2 bigrams; doc 2: 4 + 3; doc 3: 2 + 1
    assert(mass === Map(1L -> 5L, 2L -> 7L, 3L -> 3L))
    assert(!f.exists(r => r._1 == 4L || r._1 == 5L))
    // identical text ⇒ identical (bucket, cnt) set
    val twin = Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")
    val tf = Importance.hashedNgramCounts(twin, "doc_id", "text", 1024)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(tf === f.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet)
    // nBuckets=1 folds everything into bucket 0
    val one = Importance.hashedNgramCounts(raw, "doc_id", "text", 1)
      .as[(Long, Long, Long)].collect()
    assert(one.forall(_._2 == 0L) && one.map(_._3).sum === 15L)
  }

  test("features are partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Importance.hashedNgramCounts(d, "doc_id", "text", 64)
        .as[(Long, Long, Long)].collect().toSet
    assert(run(raw.coalesce(1)) === run(raw.repartition(7)))
  }

  test("importanceWeights: matches a driver-side reference, ranks target-like docs above disjoint ones, nBuckets=1 is identically 0") {
    val B = 64
    val tf = Importance.hashedNgramCounts(target, "doc_id", "text", B)
    val rf = Importance.hashedNgramCounts(raw, "doc_id", "text", B)
    val tt = Importance.bucketTotals(tf)
    val rt = Importance.bucketTotals(rf)
    val alpha = 0.5
    val got = Importance
      .importanceWeights(rf, tt, rt, "doc_id", B, alpha)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // driver-side reference from the same collected integer tables
    val tMap = tt.as[(Long, Long)].collect().toMap
    val rMap = rt.as[(Long, Long)].collect().toMap
    val (tT, rT) = (tMap.values.sum, rMap.values.sum)
    val feats = rf.as[(Long, Long, Long)].collect().groupBy(_._1)
    feats.foreach { case (id, rows) =>
      val n = rows.map(_._3).sum
      val dot = rows.map { case (_, b, c) =>
        c * (math.log(tMap.getOrElse(b, 0L) + alpha) -
          math.log(rMap.getOrElse(b, 0L) + alpha))
      }.sum
      val want = dot - n * (math.log(tT + alpha * B) -
        math.log(rT + alpha * B))
      val (gotN, gotW) = got(id)
      assert(gotN === n, s"doc $id")
      // fp-summation order differs between the distributed agg and this
      // fold — equality up to accumulation noise, not bits
      assert(math.abs(gotW - want) < 1e-9, s"doc $id: $gotW vs $want")
    }
    // the target-vocabulary doc outranks the disjoint-vocabulary doc
    assert(got(1L)._2 > got(2L)._2)
    assert(got(3L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
    // one bucket ⇒ both smoothed multinomials are the constant 1 ⇒ w = 0
    // an EMPTY target table must not poison the weights NULL — the
    // smoothing carries everything (weight finite and defined)
    val emptyT = Importance.bucketTotals(
      Importance.hashedNgramCounts(target.where(lit(false)),
        "doc_id", "text", B))
    val ew = Importance.importanceWeights(rf, emptyT, rt, "doc_id", B,
      alpha).as[(Long, Long, Double)].collect()
    assert(ew.nonEmpty && ew.forall(r => !r._3.isNaN && !r._3.isInfinite))
    val degen = Importance.importanceWeights(
      Importance.hashedNgramCounts(raw, "doc_id", "text", 1),
      Importance.bucketTotals(
        Importance.hashedNgramCounts(target, "doc_id", "text", 1)),
      Importance.bucketTotals(
        Importance.hashedNgramCounts(raw, "doc_id", "text", 1)),
      "doc_id", 1, alpha).as[(Long, Long, Double)].collect()
    assert(degen.forall(r => math.abs(r._3) < 1e-12), degen.mkString(","))
  }
}
