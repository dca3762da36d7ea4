package graft

import org.apache.spark.sql.functions._
import graft.text.Vocab

/** Tokenizer-training statistics: exact counts on a hand corpus,
  * deterministic tie-breaks at the top-k boundary, edge docs contribute
  * nothing, and the top-k plan never global-sorts.
  */
class VocabSpec extends SparkSuite {
  import spark.implicits._

  // unigram counts: b=6, a=5, c=3, d=1, solo=1; pair counts: "b b"=3,
  // "b c"=2, seven pairs at 1 — hand-derivable in one read
  private lazy val corpus = Seq(
    (1L, "a a b c"),
    (2L, "b b b c a"),
    (3L, "b b a c d a"),
    (4L, ""),
    (5L, null.asInstanceOf[String]),
    (6L, "   \t  "),
    (7L, "solo")).toDF("doc_id", "text")

  test("unigramCounts: exact counts; null/blank/whitespace docs contribute nothing") {
    val got = Vocab.unigramCounts(corpus, "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 5L, "b" -> 6L, "c" -> 3L, "d" -> 1L,
      "solo" -> 1L))
  }

  test("pairCounts: adjacent pairs only, single-token and empty docs emit none") {
    val got = Vocab.pairCounts(corpus, "text")
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "a a" -> 1L, "a b" -> 1L, "b c" -> 2L, "b b" -> 3L, "c a" -> 1L,
      "b a" -> 1L, "a c" -> 1L, "c d" -> 1L, "d a" -> 1L))
    // doc 7 ("solo", one token) and docs 4-6 emit no pairs: total mass
    // is sum over docs of max(n_tokens - 1, 0)
    assert(got.values.sum === (3 + 4 + 5 + 0 + 0 + 0 + 0))
  }

  test("topTokens: (count DESC, token ASC) with the cut inside a tie is deterministic") {
    // k=4 cuts through the (d, solo) tie at n=1: 'd' < 'solo' keeps d
    val got = Vocab.topTokens(corpus, "text", 4)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("b", 6L), ("a", 5L), ("c", 3L), ("d", 1L)))
    // k beyond the vocabulary returns the whole vocabulary
    assert(Vocab.topTokens(corpus, "text", 100).count() === 5)
  }

  test("topPairs boundary tie-break and partitioning invariance") {
    // k=3 cuts into the seven-way n=1 tie: after "b b"(3) and "b c"(2)
    // the alphabetically-first n=1 pair ("a a") is the deterministic keep
    val got = Vocab.topPairs(corpus, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("b b", 3L), ("b c", 2L), ("a a", 1L)))
    val wide = Vocab.topPairs(corpus.repartition(7), "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(wide === got)
  }

  test("top-k plans as a take-ordered limit, not a global sort exchange") {
    val plan = Vocab.topTokens(corpus, "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }
}
