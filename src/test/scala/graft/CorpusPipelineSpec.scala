package graft

import org.apache.spark.sql.functions._
import graft.text.CorpusPipeline

/** The composed corpus-construction pass: stage funnel is monotone, the
  * kept set is invariant to input partitioning (every stage decides from
  * content/key hashes, never from physical layout), and planted docs fall
  * out at the intended stage.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    // twins 1/2: byte-identical after canonicalization → exact dedup
    (1L, "The quick   brown fox jumps over the lazy dog and then it was done for all of us today", "en", "s0"),
    (2L, "the quick brown fox jumps over the lazy dog and then it was done for all of us today", "en", "s0"),
    // 3 near-dups 1 (one word changed) → near-dup prune drops 3
    (3L, "the quick brown fox jumps over the lazy cat and then it was done for all of us today", "en", "s0"),
    // 4: distinct clean doc, survives everything but the sampler decides
    (4L, "completely different prose about validating web corpora with spark and catalyst for everyone involved", "en", "s1"),
    // 5: quality-gate kills (too short)
    (5L, "too short", "en", "s1"),
    // 6: language gate kills (text distinct so it REACHES the lang gate)
    (6L, "some entirely unrelated sentence where nothing matches anything else here at all in any way whatsoever", "zh", "s1"),
    // 7: null text
    (7L, null.asInstanceOf[String], "en", "s1")
  ).toDF("doc_id", "text", "lang", "source")

  test("stage funnel: planted docs fall out at the intended stage, counts monotone") {
    val (kept, report) = CorpusPipeline.build(corpus,
      "doc_id", "text", "lang", "source", sampleRate = 1.0)
    val stages = report.orderBy("ord").as[(Int, String, Long)].collect()
    assert(stages.map(_._2).toSeq ===
      Seq("input", "exact_dedup", "near_dedup", "quality", "sample"))
    val counts = stages.map(_._3)
    assert(counts.toSeq === Seq(7L, 6L, 5L, 2L, 2L)) // doc 2 exact, doc 3 near, docs 5/6/7 quality
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L)) // smallest ids of surviving content
    // shard column present and stable
    val shards = kept.select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(shards.values.forall(sh => sh >= 0 && sh < 8))
  }

  test("components strategy keeps one representative per chain cluster (greedy may over-drop)") {
    // chain: 8 near-dups 9, 9 near-dups 10, but 8 and 10 differ enough
    // that greedy (drop all b-sides) and components (keep min per
    // component) agree here on keeping only 8 — the invariant to pin is
    // that components NEVER keeps more than one member per component and
    // keeps exactly the minimum id
    val chain = corpus.unionByName(Seq(
      (8L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi", "en", "s2"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu pi", "en", "s2"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu rho pi", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source"))
    val (keptG, _) = CorpusPipeline.build(chain,
      "doc_id", "text", "lang", "source", sampleRate = 1.0)
    val (keptC, _) = CorpusPipeline.build(chain,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      nearDupStrategy = "components")
    val g = keptG.select("doc_id").as[Long].collect().toSet
    val c = keptC.select("doc_id").as[Long].collect().toSet
    // both keep the chain's minimum exactly once
    assert(c.contains(8L) && !c.contains(9L) && !c.contains(10L))
    assert(g.contains(8L) && !g.contains(9L) && !g.contains(10L))
    // and components equals greedy on the original corpus too (its
    // clusters are transitively closed)
    assert(c === g)
  }

  test("hub cluster: greedy keeps two representatives, components keeps exactly one") {
    // star/chain with the hub as the LARGEST id: 30 and 31 each near-dup
    // the hub 32 (one of 14 tokens changed, at opposite ends → j = 11/13 ≈
    // 0.846 ≥ 0.8) but not each other (j = 10/14 ≈ 0.714 < 0.8; at 0.846
    // the 21-band LSH misses a pair with probability ~2e-9, so recall is
    // deterministic here). Pairs are (30,32) and (31,32): greedy drops
    // only the b-sides {32} and keeps BOTH 30 and 31 — two representatives
    // of one connected component — while the components strategy keeps
    // exactly the minimum, 30.
    val hub = corpus.unionByName(Seq(
      (30L, "north beta gamma delta granite marble quartz basalt every stone sings aloud at dawn", "en", "s2"),
      (31L, "alpha beta gamma delta granite marble quartz basalt every stone sings aloud at dusk", "en", "s2"),
      (32L, "alpha beta gamma delta granite marble quartz basalt every stone sings aloud at dawn", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source"))
    val (keptG, _) = CorpusPipeline.build(hub,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      nearDupThreshold = 0.8)
    val (keptC, _) = CorpusPipeline.build(hub,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      nearDupThreshold = 0.8, nearDupStrategy = "components")
    val g = keptG.select("doc_id").as[Long].collect().toSet
    val c = keptC.select("doc_id").as[Long].collect().toSet
    assert((g & Set(30L, 31L, 32L)) === Set(30L, 31L)) // greedy: two reps survive
    assert((c & Set(30L, 31L, 32L)) === Set(30L))      // components: exactly the min
  }

  test("repeated-span gate drops boilerplate-dominated docs that whole-doc MinHash cannot pair") {
    // one 12-token boilerplate paragraph shared by docs 20/21/22; each
    // doc's remaining text is unique, so pairwise Jaccard stays below the
    // 0.6 near-dup threshold and MinHash finds NO pairs — exactly the
    // failure mode the span gate exists for. Doc 20 is ~all boilerplate
    // (dup_fraction 7/8 at k=6); docs 21/22 carry 14/13 unique prefix
    // tokens (26/25 tokens -> 21/20 windows, dup fractions 7/21 and 7/20,
    // both < 0.5) and must be kept.
    val boiler = "please subscribe to our newsletter today for daily updates offers and announcements"
    val withBoiler = corpus.unionByName(Seq(
      (20L, s"$boiler regards", "en", "s3"),
      (21L, s"genuine analysis of catalyst plan shapes under adaptive execution with partition pruning in practice $boiler", "en", "s3"),
      (22L, s"careful measurements of shuffle partition sizing across scale factors on oversubscribed hosts everywhere $boiler", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source"))
    val (kept, report) = CorpusPipeline.build(withBoiler,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      nearDupThreshold = 0.6,
      maxRepeatedSpanFraction = Some(0.5), spanK = 6)
    val stages = report.orderBy("ord").as[(Int, String, Long)].collect()
    assert(stages.map(_._2).toSeq ===
      Seq("input", "exact_dedup", "near_dedup", "span_gate", "quality", "sample"))
    // near_dedup passes all three planted docs through; span_gate drops
    // exactly doc 20
    val byName = stages.map(s => s._2 -> s._3).toMap
    assert(byName("near_dedup") - byName("span_gate") === 1L)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(20L) && ids.contains(21L) && ids.contains(22L))
    // gate OFF: doc 20 survives to the end and the report keeps its
    // oracled 5-stage shape
    val (keptOff, reportOff) = CorpusPipeline.build(withBoiler,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      nearDupThreshold = 0.6)
    assert(reportOff.orderBy("ord").as[(Int, String, Long)].collect()
      .map(_._2).toSeq ===
      Seq("input", "exact_dedup", "near_dedup", "quality", "sample"))
    assert(keptOff.select("doc_id").as[Long].collect().toSet.contains(20L))
  }

  test("url dedup: null-url rows bypass the window and all survive; url twins still collapse") {
    // 90%-null-url shape (the books/JSONL slice of a mixed corpus): the
    // r8 de-skew routes null urls AROUND the min-over-window instead of
    // through one shared null window group — survivors must be identical
    // to the old semantics (all null-url docs kept, min id per real url)
    val urled = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi", "en", "s0", "https://a.example.com/x"),
      (2L, "totally different text about corpus construction pipelines in spark for everyone here today", "en", "s0", "https://A.EXAMPLE.com/x#frag"),
      (3L, "third unique document body with its own words and nothing shared with the others at all", "en", "s0", null),
      (4L, "fourth unique document body carrying separate content entirely from every other row present", "en", "s0", null),
      (5L, "fifth unique document body of plain prose that matches no other document in this corpus", "en", "s0", null)
    ).toDF("doc_id", "text", "lang", "source", "url")
    val (kept, report) = CorpusPipeline.build(urled,
      "doc_id", "text", "lang", "source", sampleRate = 1.0,
      canonicalizeUrlCol = Some("url"))
    val stages = report.orderBy("ord").as[(Int, String, Long)].collect()
    val byName = stages.map(s => s._2 -> s._3).toMap
    // urls 1/2 canonicalize to the same page → url_dedup drops doc 2;
    // every null-url doc passes through un-deduped
    assert(byName("input") === 5L && byName("url_dedup") === 4L)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 4L, 5L))
  }

  test("kept set is invariant to input partitioning") {
    val (k1, _) = CorpusPipeline.build(corpus.repartition(7),
      "doc_id", "text", "lang", "source", sampleRate = 0.6)
    val (k2, _) = CorpusPipeline.build(corpus.coalesce(1),
      "doc_id", "text", "lang", "source", sampleRate = 0.6)
    assert(k1.select("doc_id", "shard").as[(Long, Int)].collect().toSet ===
      k2.select("doc_id", "shard").as[(Long, Int)].collect().toSet)
  }
}
