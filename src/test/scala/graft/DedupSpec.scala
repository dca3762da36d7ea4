package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  // near-dup corpus: 1/2 exact dups (mod whitespace), 3 a near-dup of 1,
  // 4/5 unrelated, 6 a near-dup of 4
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick  brown fox jumps over the lazy dog near the river bank today"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tomorrow"),
    (4L, "spark shuffles data between executors during wide transformations like joins"),
    (5L, "completely different content about cooking pasta with tomato sauce basil"),
    (6L, "spark shuffles data between executors during wide transformations like unions")
  ).toDF("doc_id", "text")

  test("exact dedup finds whitespace-canonical duplicates with survivor pick") {
    val groups = Dedup.exactDuplicates(docs, "doc_id", "text")
    val got = groups.select("ids").as[Seq[Long]].collect()
    assert(got.length === 1 && got.head === Seq(1L, 2L))
    val rows = Dedup.exactDuplicateRows(docs, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(rows === Map(1L -> true, 2L -> false))
  }

  test("minhash signatures: identical sets → identical sigs, deterministic") {
    val sigs = Dedup.withMinHash(docs, "text", numHashes = 32)
      .select("doc_id", "minhash").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) === sigs(2L)) // same shingle set
    assert(sigs(1L) !== sigs(4L))
    val again = Dedup.withMinHash(docs.repartition(5), "text", numHashes = 32)
      .select("doc_id", "minhash").as[(Long, Seq[Long])].collect().toMap
    assert(again === sigs)
  }

  test("minhash-LSH near-dup pipeline agrees with brute-force n-gram jaccard") {
    val brute = Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 64, bands = 32)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    // with 32 bands of 2 rows, recall at jaccard >= 0.5 is ~1 on this corpus
    assert(lsh === brute, s"lsh=$lsh brute=$brute")
    assert(lsh.contains((1L, 2L)) && lsh.contains((1L, 3L)) && lsh.contains((4L, 6L)))
    assert(!lsh.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("jaccard values are exact") {
    val pairs = Seq((1L, 3L)).toDF("a_id", "b_id")
    val j = Dedup.jaccardVerify(docs, pairs, "doc_id", "text", k = 3)
      .select("jaccard").as[Double].head()
    // 14 tokens → 12 distinct shingles each; only the shingle containing the
    // final word differs → intersection 11, union 13
    assert(math.abs(j - 11.0 / 13.0) < 1e-12, s"j=$j")
  }

  test("WordShingleHashes expression matches the reference HOF shingle semantics") {
    import graft.text.Shingles
    import graft.functions.SketchExpressions
    val corpus = docs.select($"text")
      .union(Seq("", "  ", "one", "a b", "a b c", "a b c d",
        "dup dup dup dup", "x  y\tz").toDF("text"))
    // same SET SIZE per doc (hashes are injective modulo 2^-64 collisions)
    // and same pairwise jaccard as the string-set reference implementation
    val both = corpus.select(
      size(Shingles.wordShingles($"text", 3)).as("ref_n"),
      size(SketchExpressions.wordShingleHashes($"text", 3)).as("fast_n"))
    val diff = both.where($"ref_n" =!= $"fast_n")
    assert(diff.isEmpty, diff.collect().mkString(","))
    // pairwise overlaps must ALSO agree — per-doc set sizes alone would
    // pass a changed hash/tokenization that preserves counts but breaks
    // the cross-doc intersections minhash/LSH actually depends on
    val rows = docs.select($"doc_id",
        Shingles.wordShingles($"text", 3).as("ref"),
        SketchExpressions.wordShingleHashes($"text", 3).as("fast"))
      .as[(Long, Seq[String], Seq[Long])].collect()
    for (a <- rows; b <- rows if a._1 < b._1) {
      val ri = a._2.toSet.intersect(b._2.toSet).size
      val fi = a._3.toSet.intersect(b._3.toSet).size
      assert(ri === fi, s"pair (${a._1},${b._1}): ref∩=$ri fast∩=$fi")
    }
  }

  test("tight-loop tokenization trims only \\s, not String.trim's <=U+0020 set") {
    import graft.functions.SketchExpressions
    // U+0001 is NOT \s-whitespace: both the columnar reference
    // (TextFunctions.tokens: regexp_replace ^\s+|\s+$) and the DuckDB
    // oracles ([ \t\n\v\f\r] trim) keep it as a token byte, so the
    // expressions must too — a String.trim would strip it and shift every
    // window/shingle hash. Identical texts modulo a leading control char
    // must NOT collide; identical texts modulo leading \s whitespace must.
    val rows = Seq(
      (1L, "\u0001alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, " \t\nalpha beta gamma delta epsilon zeta eta theta\r\n")
    ).toDF("id", "text")
    val got = rows.select($"id",
        SketchExpressions.wordWindowHashes($"text", 4).as("w"),
        SketchExpressions.wordShingleHashes($"text", 4).as("s"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(2L) === got(3L), "leading \\s must trim away")
    assert(got(1L)._1 !== got(2L)._1, "U+0001 must stay a token byte (windows)")
    assert(got(1L)._2 !== got(2L)._2, "U+0001 must stay a token byte (shingles)")
    // and the first window is the ONLY one affected: tails agree
    assert(got(1L)._1.tail === got(2L)._1.tail)
  }

  test("repeatedSpans: cross-doc window coverage, within-doc repeats excluded") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),            // 3 windows @ k=4
      (2L, "intro words alpha beta gamma delta closing"),     // 4 windows, 1 shared
      (3L, "alpha beta gamma delta epsilon zeta"),            // exact copy of 1
      (4L, "short doc"),                                      // < k tokens → 0 windows
      (5L, "rep rep rep rep rep rep rep rep"),                // repeats WITHIN one doc only
      (6L, null.asInstanceOf[String])                         // null text
    ).toDF("doc_id", "text")
    val expected = Map(
      1L -> (3L, 3L, 1.0),   // all 3 windows also in doc 3
      2L -> (4L, 1L, 0.25),  // only "alpha beta gamma delta" is cross-doc
      3L -> (3L, 3L, 1.0),
      4L -> (0L, 0L, 0.0),
      5L -> (5L, 0L, 0.0),   // same span 5x in ONE doc — not cross-doc duplicated
      6L -> (0L, 0L, 0.0))
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", k = 4)
      .select("id", "n_windows", "dup_windows", "dup_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, d, f) => id -> (n, d, f) }.toMap
    assert(got === expected, s"got=$got")
    // partitioning-invariant (hash grouping, no order dependence)
    val again = Dedup.repeatedSpans(corpus.repartition(7), "doc_id", "text", k = 4)
      .select("id", "n_windows", "dup_windows", "dup_fraction")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, d, f) => id -> (n, d, f) }.toMap
    assert(again === expected)
  }

  test("simhash maxHamming=0 finds exact twins (single 64-bit band mask edge)") {
    // width 64 → the naive (1L << 64) - 1 mask is ZERO under JVM mod-64
    // shifts, which would collapse every doc into one bucket
    val pairs = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // identical shingle sets → identical simhash
  }

  test("decontamination: eval near-dups flagged across corpora, filter form removes exactly them") {
    // eval set: doc 2's text verbatim (new id) + an unrelated holdout doc
    val eval = Seq(
      (100L, "the quick  brown fox jumps over the lazy dog near the river bank today"),
      (101L, "unique evaluation question about photosynthesis in deep sea algae")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossCorpusNearDups(docs, eval, "doc_id", "text",
      threshold = 0.5, numHashes = 64, bands = 16)
      .select($"t_id", $"e_id").as[(Long, Long)].collect().toSet
    // docs 1 (whitespace-identical shingles), 2 (verbatim) and 3 (one
    // token of 14 differs → j = 11/13 ≈ 0.85) all hit eval 100; nothing
    // touches the holdout question
    assert(pairs === Set((1L, 100L), (2L, 100L), (3L, 100L)), pairs.toString)
    val clean = Dedup.decontaminate(docs, eval, "doc_id", "text",
      threshold = 0.5).select($"doc_id").as[Long].collect().toSet
    assert(clean === Set(4L, 5L, 6L))
  }

  test("simhash: identical → distance 0; near-dups within small hamming; found by banding") {
    val sigs = Dedup.withSimHash(docs, "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    val pairs = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 16)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs.contains((1L, 3L)))
    assert(pairs((1L, 3L)) <= 16L)
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(5L) })
  }

  test("span removal: non-owner occurrences deleted, owner keeps its copy, untouched docs byte-identical") {
    val boiler = "subscribe to our newsletter for daily updates and exclusive offers" // 10 tokens
    val docs = Seq(
      // owner (min id containing the span) — keeps the boilerplate
      (1L, s"alpha unique opening words here $boiler alpha closing words"),
      // non-owner — loses exactly the boilerplate tokens
      (2L, s"beta starts differently today $boiler beta ends differently"),
      // clean doc with internal structure: must pass BYTE-IDENTICAL —
      // untouched docs are never tokenized, reassembled, or normalized
      (3L, "gamma writes  entirely original\nprose with no repeated spans at all in it"),
      (4L, "too short"), // < k tokens: no windows, never rewritten
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text",
        k = 10, minDocs = 2)
      .select("doc_id", "clean_text", "tokens_removed")
      .as[(Long, String, java.lang.Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1.contains(boiler)) // owner keeps its occurrence
    assert(out(1L)._2 === 0L)
    // owner is untouched end to end: byte-identical, not just re-joined
    assert(out(1L)._1 === s"alpha unique opening words here $boiler alpha closing words")
    assert(!out(2L)._1.contains("newsletter")) // non-owner loses the span
    assert(out(2L)._1.startsWith("beta starts differently today"))
    assert(out(2L)._1.endsWith("beta ends differently"))
    // windows overlapping the boilerplate also cover its flanking tokens
    // only if THOSE windows are duplicated — here the flanks differ, so
    // exactly the 10 boilerplate tokens go
    assert(out(2L)._2 === 10L)
    assert(out(3L) === (("gamma writes  entirely original\nprose with no repeated spans at all in it", 0L)))
    assert(out(4L) === (("too short", 0L)))
    assert(out(5L)._1 === null && out(5L)._2 === null)
  }

  test("span removal: ownership protects overlapping duplicated spans — the kept occurrence survives intact") {
    // span X = x0..x9 (owner doc 1); span Y = x5..x9 z0..z4 (owner doc 2);
    // in doc 2, X (non-owned, positions 0-9) OVERLAPS Y (owned, 5-14):
    // without protection doc 2 would lose positions 0-9 and Y would
    // survive nowhere intact
    val x = (0 until 10).map(i => s"x$i").mkString(" ")
    val yTail = (0 until 5).map(i => s"z$i").mkString(" ")
    val y = (5 until 10).map(i => s"x$i").mkString(" ") + " " + yTail
    val docs = Seq(
      (1L, s"pad1 pad2 $x pad3"),   // owns X, untouched
      (2L, s"$x $yTail"),           // non-owned X overlaps owned Y
      (3L, s"q0 q1 $y q2")          // non-owner of Y: loses it
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text",
        k = 10, minDocs = 2)
      .select("doc_id", "clean_text", "tokens_removed")
      .as[(Long, String, java.lang.Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((s"pad1 pad2 $x pad3", 0L))) // owner of X intact
    // doc 2 keeps its owned Y occurrence INTACT; only the X prefix
    // outside Y (positions 0-4) is deleted
    assert(out(2L) === ((y, 5L)))
    assert(out(3L) === (("q0 q1 q2", 10L))) // non-owner of Y loses it
  }

  test("ngram contamination: verbatim eval quote inside a novel train doc is caught; clean/short/null docs are not") {
    val eval = Seq(
      (100L, "what is the capital of france the answer is paris of course")
    ).toDF("doc_id", "text")
    val evalQuote = "the capital of france the answer" // 6-gram from eval
    val train = Seq(
      // novel doc quoting a 6-gram of the eval item verbatim
      (1L, s"students often ask $evalQuote during pub quizzes everywhere"),
      // same vocabulary, no shared 6-token window
      (2L, "paris is of course the capital and france is the country"),
      (3L, "too short"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(train, eval, "doc_id", "text", n = 6)
      .select("t_id", "n_windows", "shared_windows", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._3 === true)
    assert(out(1L)._2 >= 1L) // at least the planted window is shared
    assert(out(2L) === ((6L, 0L, false))) // 11 tokens → 6 windows, clean
    assert(out(3L) === ((0L, 0L, false)))
    assert(out(4L) === ((0L, 0L, false)))
    assert(out.size === 4) // one row per train row, clean docs included
  }

  test("common-line removal: threshold-exact deletion, blanks and order kept, null/empty/all-removed edges") {
    // footer in exactly 4 docs (1, 2, 3 trim-matched, 4) = minDocs →
    // removed; banner in exactly 3 docs = minDocs - 1 → kept — BOTH sides
    // of the threshold boundary pinned. One doc is nothing but the footer
    // (→ ""), one has null text, one is the empty string
    val docs = Seq(
      (1L, "alpha content one\nAll rights reserved.\n\nRare banner"),
      (2L, "All rights reserved.\nbeta content two\nRare banner"),
      (3L, "gamma content three\n  All rights reserved.  \nRare banner"),
      (4L, "All rights reserved."),
      (5L, null.asInstanceOf[String]),
      (6L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.commonLineRemoval(docs, "doc_id", "text", minDocs = 4)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, java.lang.Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(out(1L) === ("alpha content one\n\nRare banner", 1L))
    assert(out(2L) === ("beta content two\nRare banner", 1L))
    assert(out(3L) === ("gamma content three\nRare banner", 1L))
    assert(out(4L) === ("", 1L)) // every line removed
    assert(out(5L)._1 === null && out(5L)._2 === null) // null passthrough
    assert(out(6L) === ("", 0L)) // empty text: its one blank line is kept
    // the 4-doc footer sits AT minDocs (removed everywhere) and the 3-doc
    // banner at minDocs - 1 (kept) — an off-by-one in the >= would flip one
    assert(!out(1L)._1.contains("All rights reserved"))
    assert(out(1L)._1.contains("Rare banner"))
    // reserved/output names fail fast instead of ambiguous-column errors
    intercept[IllegalArgumentException] {
      Dedup.commonLineRemoval(docs.withColumn("n_removed", lit(1)),
        "doc_id", "text", minDocs = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.commonLineRemoval(docs.withColumn("_norm", lit("x")),
        "doc_id", "text", minDocs = 4)
    }
    // partitioning-invariant: the rewrite depends only on line content
    val repart = Dedup.commonLineRemoval(docs.repartition(7), "doc_id",
        "text", minDocs = 4)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(repart === out.map { case (k, v) => k -> v._1 })
    // confirmStrings (the collision-proof rewrite mode) is output-identical
    // absent collisions — the string confirm must never change a clean run
    val confirmed = Dedup.commonLineRemoval(docs, "doc_id", "text",
        minDocs = 4, confirmStrings = true)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, java.lang.Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(confirmed === out)
  }

  test("paragraph-granularity removal: sep=\\n\\n dedups whole paragraphs, lines inside them survive") {
    // the CCNet configuration: the repeated unit is a multi-line
    // PARAGRAPH; its individual lines also appear solo in other docs and
    // must NOT be removed there (granularity is the unit, not the line)
    val para = "Follow us on social media\nAll rights reserved."
    val docs = Seq(
      (1L, s"intro one\n\n$para\n\nbody text one"),
      (2L, s"$para\n\nbody text two"),
      (3L, s"intro three\n\n$para"),
      // contains ONE line of the paragraph as its own paragraph — kept
      (4L, "All rights reserved.\n\nbody text four")
    ).toDF("doc_id", "text")
    val out = Dedup.commonLineRemoval(docs, "doc_id", "text",
        minDocs = 3, sep = "\n\n")
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === (("intro one\n\nbody text one", 1L)))
    assert(out(2L) === (("body text two", 1L)))
    assert(out(3L) === (("intro three", 1L)))
    // the solo line is a different unit than the 2-line paragraph
    assert(out(4L) === (("All rights reserved.\n\nbody text four", 0L)))
  }

  test("sharded simhash: within-shard recall equals unsharded; cross-shard pairs are exactly the documented misses") {
    // planted near-dup pairs (i, i+1000): identical 30-token bodies with a
    // one-token perturbation, plus unrelated filler docs — hamming small
    // within pairs, large across. Shards come from the ids' hash, so some
    // pairs land together and some straddle shards; the wrapper's contract
    // is: find exactly the unsharded pairs whose members share a shard.
    val base = (0L until 20L).map { i =>
      val body = (0 until 30).map(t => s"w${i}_$t").mkString(" ")
      (i, body)
    }
    val nearDups = base.map { case (i, body) =>
      (i + 1000L, body.replace(s"w${i}_7", "perturbed")) }
    val fillers = (2000L until 2010L).map { i =>
      (i, (0 until 30).map(t => s"f${i}_$t").mkString(" ")) }
    val docs = (base ++ nearDups ++ fillers).toDF("id", "text")

    val full = Dedup.simHashNearDups(docs, "id", "text", maxHamming = 7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    val nShards = 4
    val sharded = Dedup.simHashNearDupsSharded(docs, "id", "text", nShards,
        maxHamming = 7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val shardOf = docs.select($"id",
        graft.text.Sampling.shardColumn($"id", nShards).as("s"))
      .as[(Long, Int)].collect().toMap
    val sameShard = full.filter { case (a, b) => shardOf(a) == shardOf(b) }
    assert(sharded === sameShard,
      s"sharded=${sharded.toSeq.sorted} expected=${sameShard.toSeq.sorted}")
    // the trade is real in this corpus: at least one pair straddles shards
    // (otherwise the test proves nothing) and every miss is cross-shard
    val missed = full -- sharded
    assert(missed.nonEmpty, "corpus never exercised the cross-shard miss")
    assert(missed.forall { case (a, b) => shardOf(a) != shardOf(b) })
    // output never leaks the reserved shard column
    assert(!Dedup.simHashNearDupsSharded(docs, "id", "text", nShards)
      .columns.contains("_shard"))
  }

  test("stop-band drop report: a planted mega-bucket is counted, graded pairs unchanged") {
    // 300 verbatim copies of one boilerplate page (the hot-bucket shape at
    // crawl scale) on top of the 6-doc near-dup corpus: identical texts →
    // identical minhash signatures → ONE bucket per band, size 300
    val boiler = (100L until 400L)
      .map(i => (i, "accept cookies to continue reading this site uses " +
        "cookies privacy policy terms of service all rights reserved"))
    val corpus = docs.unionByName(boiler.toDF("doc_id", "text"))

    // capped run: every boilerplate band-bucket (16 bands) overflows the
    // 200 cap and is dropped — the report SEES the recall loss...
    val (pairs, drops) = Dedup.minHashNearDupsWithDrops(corpus,
      "doc_id", "text", threshold = 0.5, numHashes = 64, bands = 16,
      maxBucketSize = 200)
    val d = drops.select("dropped_buckets", "dropped_occurrences",
      "max_bucket_size").as[(Long, Long, Long)].head()
    assert(d === ((16L, 16L * 300L, 300L)), s"drop report: $d")
    // ...and the graded pair set is exactly what the plain form returns:
    // the planted real-corpus pairs, no boilerplate pair surviving the cap
    val got = pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 6L)),
      s"pairs: $got")

    // uncapped control: nothing dropped, and the report's max observes the
    // mega-bucket's true size — the observable a capacity audit needs
    val (_, drops2) = Dedup.minHashNearDupsWithDrops(corpus,
      "doc_id", "text", threshold = 0.5, numHashes = 64, bands = 16,
      maxBucketSize = 1000)
    val d2 = drops2.select("dropped_buckets", "dropped_occurrences",
      "max_bucket_size").as[(Long, Long, Long)].head()
    assert(d2 === ((0L, 0L, 300L)), s"uncapped report: $d2")

    // the simhash paths share bucketDropReport: identical docs → identical
    // 64-bit fingerprints → one bucket per band (maxHamming 3 → 4 bands)
    val (_, simDrops) = Dedup.simHashNearDupsWithDrops(corpus,
      "doc_id", "text", maxHamming = 3, maxBucketSize = 200)
    val sd = simDrops.select("dropped_buckets", "dropped_occurrences")
      .as[(Long, Long)].head()
    assert(sd._1 >= 4L && sd._2 >= 4L * 300L, s"simhash report: $sd")
  }

  test("connected components: chains label exactly, greedy over-drop case resolved") {
    // components {1,2,3} (CHAIN: 1-2, 2-3, no 1-3 edge — greedy b-side
    // dropping would drop 2 AND 3 even though 3's only near-dup is
    // gone), {10,11}, and a 6-node chain to exercise multi-round
    // convergence (diameter 5)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L, 25L -> 20L))
    // partitioning invariance
    val comp2 = Dedup.connectedComponents(pairs.repartition(7), "a_id", "b_id")
      .as[(Long, Long)].collect().toMap
    assert(comp2 === comp)
    // an insufficient iteration bound fails LOUDLY, never returns a
    // half-propagated labeling
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "a_id", "b_id", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("converge"))
  }

  test("best-keeper: argmax score per cluster, ties to min id, singletons kept, partitioning-invariant") {
    // cluster {1,2,3}: 2 has the highest score; cluster {10,11}: tied
    // scores -> min id 10 wins; 50 is absent from the labeling entirely
    // (singleton) and must be kept with comp = its own id
    val corpus = Seq(
      (1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L), (50L, 1L))
      .toDF("doc_id", "quality")
    val comps = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.bestKeeperPerComponent(d, comps, "doc_id", col("quality"))
        .select("doc_id", "comp", "keep").as[(Long, Long, Boolean)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val got = run(corpus)
    assert(got === Map(
      1L -> ((1L, false)), 2L -> ((1L, true)), 3L -> ((1L, false)),
      10L -> ((10L, true)), 11L -> ((10L, false)),
      50L -> ((50L, true))))
    // exactly one keeper per cluster regardless of input partitioning
    assert(run(corpus.repartition(7)) === got)
  }

  test("large-star/small-star: 10k-node path converges in O(log n) rounds") {
    import org.apache.spark.sql.functions._
    // a 10^4-node PATH — the adversarial chain shape where min-label
    // propagation needs ~10^4 rounds (one per hop); the alternating-star
    // algorithm roughly halves distances per round
    val n = 10000L
    val path = spark.range(1L, n)
      .select(col("id").as("a_id"), (col("id") + 1L).as("b_id"))
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(path, "a_id", "b_id", maxIters = 30)
    assert(rounds <= 20, s"expected O(log n) rounds on a 10k path, got $rounds")
    val comps = labels.select("comp").distinct().as[Long].collect()
    assert(comps.toSeq === Seq(1L))
    assert(labels.count() === n)
  }

  test("large-star/small-star: permuted-id chain (no monotone shortcut) stays logarithmic") {
    import org.apache.spark.sql.functions._
    // same path topology but node ids scrambled by a modular bijection
    // (i -> i*5167 mod 10007, 10007 prime), so the component minimum sits
    // at an arbitrary interior position — the case where id-ordered chains
    // would otherwise flatter the round count
    val m = 10007L
    val chain = spark.range(1L, m - 1)
      .select(pmod(col("id") * 5167L, lit(m)).as("a_id"),
        pmod((col("id") + 1L) * 5167L, lit(m)).as("b_id"))
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(chain, "a_id", "b_id", maxIters = 40)
    assert(rounds <= 25, s"expected polylog rounds on a permuted 10k chain, got $rounds")
    val comps = labels.select("comp").distinct().as[Long].collect()
    assert(comps.toSeq === Seq(1L)) // the bijection hits 1..10006, min is 1
    assert(labels.count() === m - 1)
  }
}
