package graft

import org.apache.spark.sql.functions._
import graft.rules._

/** Unit semantics of every row-rule species on hand-built rows —
  * independent of the generator, so generator and engine can't be wrong
  * together.
  */
class RuleCompilerSpec extends SparkSuite {
  import spark.implicits._

  private def firedOn(rule: RowRule, df: org.apache.spark.sql.DataFrame): Set[String] =
    RuleCompiler.withViolations(df, Seq(rule))
      .where(size(col("_violations")) > 0)
      .select("tag").as[String].collect().toSet

  test("Required fires only on NULL (empty string is not null — Django blank semantics)") {
    val df = Seq(("a", "x"), ("b", ""), ("c", null))
      .toDF("tag", "v")
    assert(firedOn(Required("r", "v"), df) === Set("c"))
  }

  test("Regex skips NULL, fires on non-match") {
    val df = Seq(("a", "https://x.com"), ("b", "nope nope"), ("c", null))
      .toDF("tag", "v")
    assert(firedOn(Regex("r", "v", "^https?://[^ ]+$"), df) === Set("b"))
  }

  test("Allowed fires outside the closed set, skips NULL") {
    val df = Seq(("a", "en"), ("b", "xx"), ("c", null)).toDF("tag", "v")
    assert(firedOn(Allowed("r", "v", Seq("en", "de")), df) === Set("b"))
  }

  test("MinMax respects bounds with SQL literals") {
    val df = Seq(("a", 5L), ("b", -1L), ("c", 99L)).toDF("tag", "v")
    assert(firedOn(MinMax("r", "v", Some("0"), Some("10")), df) === Set("b", "c"))
    assert(firedOn(MinMax("r", "v", Some("0"), None), df) === Set("b"))
    assert(firedOn(MinMax("r", "v", None, Some("10")), df) === Set("c"))
  }

  test("MaxLength fires beyond the bound") {
    val df = Seq(("a", "short"), ("b", "x" * 300)).toDF("tag", "v")
    assert(firedOn(MaxLength("r", "v", 255), df) === Set("b"))
  }

  test("Dependency: when-cond true requires require-cond (canceled ⇔ slot shape)") {
    // reference: booking canceled ⇔ slot IS NULL (booking.py:269-273)
    val df = Seq(
      ("a", "canceled", null.asInstanceOf[java.lang.Long]),
      ("b", "canceled", java.lang.Long.valueOf(1L)),   // violates
      ("c", "confirmed", java.lang.Long.valueOf(2L)),
      ("d", "confirmed", null.asInstanceOf[java.lang.Long])) // violates (other direction)
      .toDF("tag", "state", "slot_id")
    val r1 = Dependency("canceled_no_slot", "slot_id",
      "state = 'canceled'", "slot_id IS NULL")
    val r2 = Dependency("active_has_slot", "slot_id",
      "state != 'canceled'", "slot_id IS NOT NULL")
    assert(firedOn(r1, df) === Set("b"))
    assert(firedOn(r2, df) === Set("d"))
  }

  test("GeneratedConsistent: stored generated column vs recompute (name = concat)") {
    // reference: Customer.name GeneratedField Concat(first,' ',last)
    // (customer.py:76-80); test_customer.py:19-21
    val df = Seq(
      ("a", "Jo", "Ann", "Jo Ann"),
      ("b", "Jo", "Ann", "WRONG"),
      ("c", null, "Ann", null))
      .toDF("tag", "first_name", "last_name", "name")
    val r = GeneratedConsistent("gen_name", "name",
      "concat(first_name, ' ', last_name)")
    assert(firedOn(r, df) === Set("b"))
  }

  test("ExprRule fires when predicate is false or null") {
    val df = Seq(("a", 1L), ("b", 0L)).toDF("tag", "v")
    assert(firedOn(ExprRule("r", "v", "v > 0"), df) === Set("b"))
  }

  test("violations array carries rule_id/path/message/severity and stacks per-row") {
    val df = Seq(("a", null.asInstanceOf[String]), ("b", "ok"))
      .toDF("tag", "v")
    val rules: Seq[RowRule] = Seq(
      Required("req_v", "v", message = "custom msg"),
      Regex("re_v", "v", "^x"))
    val out = RuleCompiler.withViolations(df, rules)
      .select(col("tag"), explode(col("_violations")).as("v"))
      .select($"tag", $"v.rule_id", $"v.message", $"v.severity")
      .as[(String, String, String, String)].collect().toSet
    assert(out === Set(
      ("a", "req_v", "custom msg", "error"),
      ("b", "re_v", "v does not match /^x/", "error")))
  }

  test("rule catalog round-trips through the flat Dataset form") {
    val rules: Seq[ValidationRule] = graft.fixtures.PagesRules.catalog
    val rows = rules.map(ValidationRule.toRow)
    val back = rows.map(ValidationRule.fromRow)
    assert(back === rules)
    // and it survives an actual Dataset round-trip
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product)
    assert(ds.collect().toSeq.map(ValidationRule.fromRow) === rules)
  }
}
