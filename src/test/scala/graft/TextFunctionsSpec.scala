package graft

import org.apache.spark.sql.functions._
import graft.text.{Shingles, TextFunctions => TF}

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("tokens and token counts handle empty/null/whitespace") {
    val df = Seq("a b  c", "", "   ", "one").toDF("text")
    val got = df.select(TF.tokenCount($"text").as("n")).as[Int].collect().toSeq
    assert(got === Seq(3, 0, 0, 1))
  }

  test("bpe-ish token count splits letters/digits/punctuation") {
    val got = Seq("hello, world 42!").toDF("text")
      .select(TF.bpeishTokenCount($"text").as("n")).as[Int].head()
    // hello , world 42 ! → 5
    assert(got === 5)
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    val df = Seq(
      ("the cat and the dog was in that house", "en"),
      ("der hund und die katze ist nicht da", "de"),
      ("le chat est dans les maisons et la ville", "fr"),
      ("el perro es una de las cosas que hay por aqui en la casa", "es"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "want")
    val wrong = df.withColumn("got", TF.langId($"text"))
      .where($"got" =!= $"want")
    assert(wrong.isEmpty, wrong.collect().mkString(","))
  }

  test("quality score: clean prose beats punctuation soup") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog and it was good for all of us", "clean"),
      ("@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))", "soup")
    ).toDF("text", "tag")
    val scores = df.select($"tag", TF.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("clean") > 0.5)
    assert(scores("soup") < 0.3 && scores("clean") > 2 * scores("soup"))
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint is case/whitespace-canonical but content-sensitive") {
    val df = Seq(
      ("Hello   World", 1), ("hello world", 2), ("hello  world ", 3),
      ("hello word", 4)
    ).toDF("text", "id")
    val fps = df.select($"id", TF.fingerprint($"text").as("fp"))
      .as[(Int, Long)].collect().toMap
    assert(fps(1) === fps(2) && fps(2) === fps(3))
    assert(fps(1) !== fps(4))
  }

  test("word shingles: k-grams, deduped; short docs degrade gracefully") {
    val got = Seq("a b c d").toDF("text")
      .select(Shingles.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].head()
    assert(got.toSet === Set("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Shingles.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq("a b"))
    val empty = Seq("").toDF("text")
      .select(Shingles.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].head()
    assert(empty === Seq.empty)
  }

  test("canonical URL: case, fragment, tracking params, default ports, trailing slash") {
    def cu(u: String): String =
      Seq(u).toDF("u").select(TF.canonicalUrl($"u").as("r"))
        .as[String].head()
    assert(cu("HTTPS://Example.COM:443/Path/") === "https://example.com/Path")
    assert(cu("http://example.com:80/") === "http://example.com/")  // root keeps /
    assert(cu("https://example.com/a?utm_source=x&id=3&utm_campaign=y#frag")
      === "https://example.com/a?id=3")
    assert(cu("https://example.com/a?utm_source=x") === "https://example.com/a")
    assert(cu("https://example.com/a?gclid=z&fbclid=w&q=1")
      === "https://example.com/a?q=1")
    // path/query case preserved; non-default ports preserved
    assert(cu("HTTP://HOST.example.com:8080/A/B?Q=Up")
      === "http://host.example.com:8080/A/B?Q=Up")
    // params merely CONTAINING a tracking name survive (anchored match)
    assert(cu("https://example.com/a?xgclid=5&q=1")
      === "https://example.com/a?xgclid=5&q=1")
    assert(cu("https://example.com/a?my_utm_x=1")
      === "https://example.com/a?my_utm_x=1")
    // adjacent tracking params both removed, separator debris cleaned
    assert(cu("https://example.com/a?utm_a=1&utm_b=2&q=1")
      === "https://example.com/a?q=1")
    // a scheme only swallows ITS OWN default port
    assert(cu("https://example.com:80/x") === "https://example.com:80/x")
    assert(cu("http://example.com:443/x") === "http://example.com:443/x")
    val n = Seq(Option.empty[String]).toDF("u")
      .select(TF.canonicalUrl($"u").as("r")).as[Option[String]].head()
    assert(n.isEmpty)
  }

  test("canonical URL is idempotent (re-canonicalizing a canonical url is a no-op)") {
    // the dedup invariant: a re-crawled, already-canonical url must map to
    // itself, or canonical keys churn between pipeline runs
    val urls = Seq(
      "HTTPS://Example.COM:443/Path/",
      "http://example.com:80/",
      "https://example.com/a?utm_source=x&id=3&utm_campaign=y#frag",
      "https://example.com/a?gclid=z&fbclid=w&q=1",
      "HTTP://HOST.example.com:8080/A/B?Q=Up",
      "https://example.com/a?xgclid=5&q=1",
      "https://example.com/a?utm_a=1&utm_b=2&q=1",
      "https://example.com:80/x",
      "http://example.com:443/x")
    val rows = urls.toDF("u")
      .select(TF.canonicalUrl($"u").as("c1"),
        TF.canonicalUrl(TF.canonicalUrl($"u")).as("c2"))
      .as[(String, String)].collect()
    rows.foreach { case (c1, c2) => assert(c1 === c2, c1) }
  }

  test("repetition signals: templated text scores high, prose scores zero") {
    val df = Seq(
      ("menu\nhome\nmenu\nhome\nmenu", "lines"),          // 3/5 lines repeat
      ("buy cheap buy cheap buy cheap buy cheap", "grams"),
      ("the quick brown fox jumps over the lazy dog", "prose"),
      ("", "empty")
    ).toDF("text", "tag")
    val got = df.select($"tag",
        TF.duplicateLineFraction($"text").as("dl"),
        TF.duplicateNgramFraction($"text", 3).as("dg"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("lines")._1 === 0.6)
    assert(got("prose")._1 === 0.0 && got("prose")._2 === 0.0)
    // "buy cheap buy" style loops: 6 trigrams, 2 distinct → 4/6
    assert(math.abs(got("grams")._2 - 4.0 / 6.0) < 1e-12, got("grams").toString)
    assert(got("empty") === ((0.0, 0.0)))
  }

  test("tight-loop ngram fraction equals the HOF reference on adversarial inputs") {
    // the expression replaced the HOF formulation for speed (~600x); the
    // HOF stays as the independently-derived parity reference. Inputs
    // stress the token contract: regex-\s whitespace runs (incl. a
    // vertical tab, which IS \s), short docs, repeats, unicode tokens,
    // a non-breaking space (NOT \s - it glues its neighbours into one
    // token), and null.
    val vt = 0x0B.toChar    // explicit: invisible literals are a trap
    val nbsp = 0xA0.toChar
    val texts = Seq(
      "a b c a b c a b c", s"  \t a${vt}b \n c  ", "one two",
      "x", "", "   \n\t  ", s"a${nbsp}b c a${nbsp}b c a${nbsp}b c",
      "ü ö ü ö ü ö ü", "a a a a a a a a", null.asInstanceOf[String],
      "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = df.select($"i",
          TF.duplicateNgramFraction($"text", n).as("fast"),
          TF.duplicateNgramFractionHof($"text", n).as("ref"))
        .as[(Int, Double, Double)].collect()
      rows.foreach { case (i, fast, ref) =>
        assert(fast === ref, s"n=$n text=${texts(i)}")
      }
    }
  }

  test("Gopher auxiliary signals: symbols, bullets, ellipses, alpha words") {
    val df = Seq(
      ("clean prose with regular words only here", "clean"),
      ("### price ### list ### now", "symbols"),          // 9 '#' / 6 words (### are words too)
      ("- one\n- two\n- three\nheader", "bullets"),        // 3/4 bullet lines
      ("read more...\nsee details...\nplain line", "ellipsis"), // 2/3
      ("12 34 56 78 word", "numbers"),                     // 1/5 lettered
      ("", "empty")
    ).toDF("text", "tag")
    val got = df.select($"tag",
        TF.symbolToWordRatio($"text").as("sym"),
        TF.bulletLineFraction($"text").as("bul"),
        TF.ellipsisLineFraction($"text").as("ell"),
        TF.alphaWordFraction($"text").as("alpha"))
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("clean") === ((0.0, 0.0, 0.0, 1.0)))
    assert(got("symbols")._1 === 9.0 / 6.0) // '#' chars per word
    assert(got("bullets")._2 === 0.75)
    assert(math.abs(got("ellipsis")._3 - 2.0 / 3.0) < 1e-12)
    assert(got("numbers")._4 === 0.2)
    assert(got("empty") === ((0.0, 0.0, 0.0, 1.0))) // token-less: alpha vacuously 1

    // CRLF parity: Java's default multiline breaks on \r where the DuckDB
    // oracle's RE2 breaks on \n only — the (?d) UNIX_LINES flag pins the
    // engine to \n, and [ \t\r]* lets CRLF ellipsis lines still count
    val crlf = Seq(("read more...\r\nsee details...\r\nplain line", "x"),
        ("a… b… c…", "y")) // typographic ellipses count as symbols
      .toDF("text", "tag")
      .select($"tag", TF.ellipsisLineFraction($"text").as("ell"),
        TF.symbolToWordRatio($"text").as("sym"),
        TF.bulletLineFraction($"text").as("bul"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(math.abs(crlf("x")._1 - 2.0 / 3.0) < 1e-12, crlf("x").toString)
    assert(crlf("y")._2 === 1.0) // 3 ellipses / 3 words
  }

  test("NFC normalization: composed == decomposed, idempotent, null-safe") {
    val acute = 0x0301.toChar
    val eAcute = 0x00E9.toChar
    val df = Seq(
      (1, "Cafe" + acute), (2, "Caf" + eAcute), (3, "plain ascii"),
      (4, null.asInstanceOf[String]))
      .toDF("i", "t")
    val got = df.select($"i", TF.nfcNormalize($"t").as("n"),
        TF.nfcNormalize(TF.nfcNormalize($"t")).as("nn"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getString(1),
         if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got(1)._1 === got(2)._1) // forms collide after NFC
    assert(got(1)._1 === "Caf" + eAcute)
    assert(got.values.forall { case (a, b) => a == b }) // idempotent
    assert(got(3)._1 === "plain ascii")
    assert(got(4)._1 === null)
    // the whole point: fingerprints of equivalent forms now collide
    val fps = df.where($"i" <= 2)
      .select(TF.fingerprint(TF.nfcNormalize($"t")).as("fp"))
      .as[Long].collect()
    assert(fps(0) === fps(1))
  }

  test("PII scrub masks emails and phone numbers, idempotent") {
    def mp(s: String): String =
      Seq(s).toDF("t").select(TF.maskPii($"t").as("r"))
        .as[String].head()
    val got = mp("mail bob.smith+x@pets.example.co.uk or call +44 1234 567890 now")
    assert(got === "mail <EMAIL> or call <PHONE> now", got)
    assert(mp(got) === got) // masks don't re-match
    assert(mp("no pii here") === "no pii here")
    assert(mp("ring 01234 567890.") === "ring <PHONE>.")
  }
}
