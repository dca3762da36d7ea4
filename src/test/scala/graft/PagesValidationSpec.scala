package graft

import org.apache.spark.sql.functions._
import graft.engine._
import graft.fixtures.{PagesGen, PagesRules}

/** End-to-end: full rule-set pass over the generated pages table must
  * reproduce EXACTLY the planted violation set (set-equality on
  * (key, rule_id), per FIXTURES.md — "tests assert set-equality, not
  * counts"), and the hash-candidate uniqueness pass must agree with an exact
  * groupBy oracle.
  */
class PagesValidationSpec extends SparkSuite {
  import spark.implicits._

  private val cfg = EngineConfig(
    keyExpr = "url",
    partExpr = "date_format(warc_ts, 'yyyy-MM-dd')")

  private lazy val data = PagesGen.generate(spark, nRows = 20000L, nDays = 5)
  private lazy val result = ValidationEngine.run(
    data.pages, PagesRules.catalog,
    dims = Map("hosts" -> data.hosts), cfg = cfg)

  private lazy val got: Set[(String, String)] =
    result.violations.select("key", "rule_id").distinct()
      .as[(String, String)].collect().toSet

  private lazy val want: Set[(String, String)] =
    data.expected.as[(String, String)].collect().toSet

  test("engine violations == planted expected set (all rules)") {
    val missing = want -- got
    val extra = got -- want
    assert(missing.isEmpty, s"missing ${missing.size}: ${missing.take(5)}")
    assert(extra.isEmpty, s"extra ${extra.size}: ${extra.take(5)}")
  }

  test("every rule species actually fired (fixture sanity)") {
    val fired = got.map(_._2)
    val all = Set(PagesRules.UrlRequired, PagesRules.TextRequired,
      PagesRules.LangPresent, PagesRules.UrlRegex, PagesRules.LangAllowed,
      PagesRules.TsWindow, PagesRules.HtmlDependency, PagesRules.UrlMaxLen,
      PagesRules.UniqueUrl, PagesRules.HostReferential)
    assert(all.subsetOf(fired), s"never fired: ${all -- fired}")
  }

  test("hash-candidate uniqueness == exact groupBy oracle") {
    val oracle = data.pages.where($"url".isNotNull)
      .groupBy($"url").count().where($"count" > 1)
      .select($"url").as[String].collect().toSet
    val engine = result.violations
      .where($"rule_id" === PagesRules.UniqueUrl)
      .select($"key").as[String].collect().toSet
    assert(engine === oracle)
  }

  test("uniqueness verdict is invariant to input partitioning (determinism across parallelism)") {
    val r4 = ValidationEngine.run(data.pages.coalesce(1),
      Seq(graft.rules.Unique(PagesRules.UniqueUrl, Seq("url"))),
      cfg = cfg)
    val r64 = ValidationEngine.run(data.pages.repartition(64),
      Seq(graft.rules.Unique(PagesRules.UniqueUrl, Seq("url"))),
      cfg = cfg)
    val a = r4.violations.select("key").as[String].collect().toSet
    val b = r64.violations.select("key").as[String].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("verdicts: per-(part, rule) counts are consistent with violations") {
    val fromVios = result.violations.groupBy("part", "rule_id").count()
      .as[(String, String, Long)].collect()
      .map { case (p, r, n) => (p, r) -> n }.toMap
    val verd = result.verdicts
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(verd.nonEmpty)
    verd.foreach { case (part, rule, checked, vios, pass) =>
      assert(vios === fromVios.getOrElse((part, rule), 0L),
        s"verdict mismatch at ($part, $rule)")
      assert(pass === (vios == 0L))
      assert(checked > 0L)
    }
  }

  test("checked counts in verdicts equal true partition sizes") {
    val truth = data.pages
      .groupBy(date_format($"warc_ts", "yyyy-MM-dd").as("part")).count()
      .as[(String, Long)].collect().toMap
    val verdPairs = result.verdicts.select("part", "checked").distinct()
      .as[(String, Long)].collect()
    // one checked value per part — a toMap over conflicting (part, checked)
    // pairs would keep an arbitrary winner and could mask an inconsistent
    // rule reporting a different count for the same partition
    assert(verdPairs.map(_._1).distinct.length === verdPairs.length,
      s"conflicting checked counts per part: ${verdPairs.sorted.mkString(",")}")
    val verd = verdPairs.toMap
    // the "(global)" scope row carries total rows for uniqueness verdicts
    assert(verd - graft.engine.ValidationEngine.GlobalPart === truth)
    assert(verd(graft.engine.ValidationEngine.GlobalPart) === truth.values.sum)
  }

  test("profiles carry null counts + approx distinct per partition") {
    val p = result.profiles.where($"column" === "lang").collect()
    assert(p.nonEmpty)
    // the drift partition (last in-window day) has an inflated lang null-rate
    val rates = result.profiles.where($"column" === "lang")
      .select("part", "nullRate").as[(String, Double)].collect()
      .filter(_._1.startsWith("2024")).sortBy(_._1)
    assert(rates.last._2 > rates.head._2 + 0.1,
      s"drift partition null-rate not inflated: ${rates.mkString(",")}")
  }

  test("drift: planted length-shift partition is flagged by PSI and KS") {
    val inWindow = data.pages.where(year($"warc_ts") === 2024)
    val hist = StatsPass.histogram(inWindow, cfg, "length(text)", binWidth = 25.0)
    val reports = Drift.againstPrevious(hist, "length(text)")
    val psiByPart = reports.filter(_.metric == "psi").sortBy(_.part)
    // transitions between normal days pass; into the drift day fails
    assert(psiByPart.last.pass === false, s"drift not detected: $psiByPart")
    assert(psiByPart.init.forall(_.pass), s"false positives: $psiByPart")
  }

  test("generator is deterministic across reruns and parallelism") {
    val again = PagesGen.generate(spark, nRows = 20000L, nDays = 5)
      .pages.repartition(13)
    val h1 = data.pages.select(xxhash64(struct(col("*"))).as("h"))
      .agg(expr("bit_xor(h)")).as[Long].head()
    val h2 = again.select(xxhash64(struct(col("*"))).as("h"))
      .agg(expr("bit_xor(h)")).as[Long].head()
    assert(h1 === h2)
  }
}
