package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules._

/** Orchestrates a full validation run (SURVEY.md §7 pillars 2-3):
  * "one scan, many answers" — the row-rule pass, referential checks
  * (broadcast-joined into the same scan) and the violations sink share a
  * single source scan; uniqueness and the stats/drift profile are the only
  * additional passes, each reading a pruned column subset so the parquet /
  * Iceberg reader never materializes `html` bytes unless a rule needs them.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - row rules + referential: map-side only, zero shuffle (dims broadcast);
  *  - uniqueness: two-phase salted aggregation (see [[Uniqueness]]) —
  *    the only full shuffle, keyed on the natural key;
  *  - stats/drift: partial aggregation (map-side combine) then a tiny
  *    shuffle of per-(partition, column) aggregates;
  *  - verdicts/violations are tiny relative to input; they shuffle freely.
  */
final case class EngineConfig(
    keyExpr: String,            // SQL expr for the natural key (e.g. "url")
    partExpr: String,           // SQL expr for the partition bucket
                                // (e.g. "date_format(warc_ts, 'yyyy-MM-dd')")
    broadcastDims: Boolean = true,
    uniquenessSalts: Int = 64)

final case class ValidationResult(
    violations: DataFrame,      // graft.model.Violation shape
    verdicts: DataFrame,        // graft.model.Verdict shape
    profiles: DataFrame)        // graft.model.ColumnProfile shape

object ValidationEngine {

  val violationCols: Seq[String] =
    Seq("key", "part", "rule_id", "path", "message", "severity")

  /** Row-rule + referential violations in ONE scan.
    *
    * Referential rules (SURVEY.md §2.3 J5/J6) are folded into the same
    * projection as a broadcast LEFT join + null-marker test — the Spark
    * analog of the reference's `fix_nested_object` FK resolution
    * (`cerberus/api/serializers.py:53-72`), done set-at-a-time.
    */
  def rowPass(df: DataFrame, rules: Seq[ValidationRule],
      dims: Map[String, DataFrame], cfg: EngineConfig): DataFrame = {
    val rowRules = rules.collect { case r: RowRule => r }
    val refRules = rules.collect { case r: Referential => r }

    // Fold referential dims in as broadcast existence markers.
    var joined = df
    val refConds: Seq[(Referential, Column)] = refRules.zipWithIndex.map {
      case (r, i) =>
        val dim = dims.getOrElse(r.dim,
          throw new IllegalArgumentException(s"missing dim table '${r.dim}' for rule ${r.ruleId}"))
        val marker = s"_ref_ok_$i"
        val keyC = r.keyExprSql.map(expr).getOrElse(col(r.path))
        val d = dim.select(col(r.dimColumn).as(s"_ref_key_$i")).distinct()
          .withColumn(marker, lit(true))
        val dimSide = if (cfg.broadcastDims) broadcast(d) else d
        joined = joined.join(dimSide, keyC === col(s"_ref_key_$i"), "left")
        (r, keyC.isNotNull && col(marker).isNull)
    }

    val rowStructs = rowRules.map(RuleCompiler.violationStruct)
    val refStructs = refConds.map { case (r, cond) =>
      when(cond, struct(
        lit(r.ruleId).as("rule_id"),
        lit(r.path).as("path"),
        lit(RuleCompiler.message(r)).as("message"),
        lit(r.severity).as("severity")))
    }
    val allStructs = rowStructs ++ refStructs
    val vioArr =
      if (allStructs.isEmpty)
        array().cast("array<struct<rule_id:string,path:string,message:string,severity:string>>")
      else filter(array(allStructs: _*), v => v.isNotNull)

    joined
      .select(
        coalesce(expr(cfg.keyExpr).cast("string"), lit("(null)")).as("key"),
        coalesce(expr(cfg.partExpr).cast("string"), lit("(null)")).as("part"),
        vioArr.as("_violations"))
      .where(size(col("_violations")) > 0)
      .select(col("key"), col("part"), explode(col("_violations")).as("v"))
      .select(col("key"), col("part"),
        col("v.rule_id").as("rule_id"), col("v.path").as("path"),
        col("v.message").as("message"), col("v.severity").as("severity"))
  }

  /** Full run: row+referential pass, uniqueness pass, stats profile,
    * verdict assembly. Violations from all passes share one schema and are
    * unioned (SURVEY.md §2.6 — the engine's only row-level set op).
    */
  def run(df: DataFrame, rules: Seq[ValidationRule],
      dims: Map[String, DataFrame] = Map.empty,
      cfg: EngineConfig): ValidationResult = {

    val uniqueRules = rules.collect { case r: Unique => r }

    val rowVios = rowPass(df, rules, dims, cfg)
    val uniqVios = uniqueRules.map(r =>
      Uniqueness.duplicateKeyViolations(df, r, cfg))
    val violations = (Seq(rowVios) ++ uniqVios).reduce(_.unionByName(_))

    val profiles = StatsPass.profile(df, cfg)

    // Verdicts: per-(part, rule) violation counts joined to per-part checked
    // counts (from the stats pass — no extra scan of the source).
    val checked = profiles
      .groupBy(col("part")).agg(max(col("rowCount")).as("checked"))
    val ruleIds = rules.map(r => (r.ruleId, r.severity))
    val spark = df.sparkSession
    val allRules = spark.createDataFrame(ruleIds).toDF("rule_id", "severity")
    val vioCounts = violations.groupBy(col("part"), col("rule_id"))
      .agg(count(lit(1)).as("violations"))
    val verdicts = checked.crossJoin(broadcast(allRules.select(col("rule_id"))))
      .join(vioCounts, Seq("part", "rule_id"), "left")
      .select(
        col("part"), col("rule_id"), col("checked"),
        coalesce(col("violations"), lit(0L)).as("violations"),
        (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))

    ValidationResult(violations, verdicts, profiles)
  }
}
