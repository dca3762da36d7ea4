package graft

import org.apache.spark.sql.functions._
import graft.engine.{EngineConfig, ValidationEngine}
import graft.text.QualityRules

/** Corpus filtering as validation: the Gopher/C4-style gates run through
  * the SAME engine as the page validator, so verdicts, violation rows and
  * severities come for free. Planted docs fire exactly the rules they
  * should.
  */
class QualityRulesSpec extends SparkSuite {
  import spark.implicits._

  test("planted corpus docs fire exactly the intended filter rules") {
    val docs = Seq(
      // (doc_id, text, lang, source)
      (1L, "the quick brown fox jumps over the lazy dog and then it was done for all of us today", "en", "s0"), // clean
      (2L, null.asInstanceOf[String], "en", "s0"),               // text_required (+ min_tokens via 0 toks)
      (3L, "too short", "en", "s0"),                             // min_tokens
      (4L, "menu home\nmenu home\nmenu home\nmenu home\nabout page here now", "en", "s0"), // dup lines
      (5L, "buy cheap buy cheap buy cheap buy cheap buy cheap now", "en", "s0"), // dup 3-grams
      (6L, "the quick brown fox jumps over the lazy dog and then it was done for all of us today", "zh", "s0"), // lang
      (7L, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( ))) ~~~ ``` ||| ;;; :::", "en", "s0") // quality (+ others maybe)
    ).toDF("doc_id", "text", "lang", "source")

    val res = ValidationEngine.run(QualityRules.withSignals(docs),
      QualityRules.catalog(), Map.empty,
      EngineConfig(keyExpr = "cast(doc_id as string)", partExpr = "source"))

    val fired = res.violations.select($"key", $"rule_id")
      .as[(String, String)].collect().toSet
    assert(fired.contains(("2", "text_required")))
    assert(fired.contains(("3", "min_tokens")))
    assert(fired.contains(("4", "max_dup_line_frac")))
    assert(fired.contains(("5", "max_dup_3gram_frac")))
    assert(fired.contains(("6", "lang_allowed")))
    assert(fired.contains(("7", "min_quality")))
    // the clean doc fires nothing
    assert(!fired.exists(_._1 == "1"))
    // lang gate never fires for an allowed-language doc
    assert(!fired.contains(("1", "lang_allowed")) && !fired.contains(("5", "lang_allowed")))

    // verdict shape: one row per rule for the single source partition,
    // checked = all 7 docs
    val verdicts = res.verdicts.where($"part" === "s0")
      .select($"rule_id", $"checked", $"violations")
      .as[(String, Long, Long)].collect()
    assert(verdicts.length === QualityRules.catalog().length)
    assert(verdicts.forall(_._2 == 7L))
    val vByRule = verdicts.map { case (r, _, v) => r -> v }.toMap
    assert(vByRule("lang_allowed") === 1L)
    assert(vByRule("text_required") === 1L)
  }
}
