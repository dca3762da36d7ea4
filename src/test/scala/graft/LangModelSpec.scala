package graft

import org.apache.spark.sql.functions._
import graft.text.LangModel

/** Char n-gram LM: hand-computed counts and smoothed log-probs on a
  * 2-doc training corpus; OOV/backoff/short-doc edges; invariance.
  */
class LangModelSpec extends SparkSuite {
  import spark.implicits._

  // train: "abab" -> grams aba, bab (1 each); ctx ab->1, ba->1; V = |{a,b}| = 2
  private lazy val train = Seq(Tuple1("abab")).toDF("text")
  private lazy val model = LangModel.trainCharLm(train, "text", n = 3)

  test("trainCharLm: gram and context counts from one scan") {
    val m = model.as[(String, Long, Long)].collect().toSet
    assert(m === Set(("aba", 1L, 1L), ("bab", 1L, 1L)))
  }

  test("scoreCharLm: mass features exact, smoothing on the three OOV shapes, short docs null-score") {
    val docs = Seq(
      (1L, "abab"), // fully in-distribution
      (2L, "abz"),  // unseen gram, SEEN context -> backoff to ctx count
      (3L, "zzz"),  // unseen gram, unseen context -> uniform 1/V shape
      (4L, "zz"),   // too short: 0 positions
      (5L, null.asInstanceOf[String])) // null text: 0 positions
      .toDF("doc_id", "text")
    val got = LangModel.scoreCharLm(docs, "doc_id", "text", model, n = 3)
      .select($"doc_id", $"n_pos", $"sum_gram", $"sum_ctx", $"oov", $"avg_logp")
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 2L && got(1L)._3 == 2L && got(1L)._4 == 2L
      && got(1L)._5 == 0L)
    // p = (1 + .5) / (1 + .5*2) = 0.75 at both positions
    assert(math.abs(got(1L)._6.get - math.log(0.75)) < 1e-12)
    // "abz": gram unseen (0 + .5), ctx "ab" count 1 -> (1 + 1) => p=0.25
    assert(got(2L)._2 == 1L && got(2L)._3 == 0L && got(2L)._4 == 1L
      && got(2L)._5 == 1L)
    assert(math.abs(got(2L)._6.get - math.log(0.25)) < 1e-12)
    // "zzz": nothing seen -> p = .5 / (0 + 1) = 0.5 (the uniform-V shape)
    assert(got(3L)._2 == 1L && got(3L)._4 == 0L && got(3L)._5 == 1L)
    assert(math.abs(got(3L)._6.get - math.log(0.5)) < 1e-12)
    // short/null docs: present, zeroed, null score
    Seq(4L, 5L).foreach { id =>
      assert(got(id)._2 == 0L && got(id)._3 == 0L && got(id)._5 == 0L)
      assert(got(id)._6.isEmpty)
    }
  }

  test("score is partitioning-invariant (broadcast model, no RNG)") {
    val docs = spark.range(200).select($"id".as("doc_id"),
      concat(lit("ab"), $"id", lit("ba")).as("text"))
    def run(d: org.apache.spark.sql.DataFrame) =
      LangModel.scoreCharLm(d, "doc_id", "text", model, n = 3)
        .select($"doc_id", $"sum_gram", $"sum_ctx", $"oov")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs.coalesce(1)) === run(docs.repartition(17)))
  }
}
