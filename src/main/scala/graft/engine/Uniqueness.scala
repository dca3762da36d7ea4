package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rules.{Unique, RuleCompiler}

/** Uniqueness checking at scale (SURVEY.md §2.4 A9, rule R5).
  *
  * Reference semantics: DB unique constraints — duplicate (start, end) slots
  * raise IntegrityError (`cerberus/models/booking.py:50`,
  * `tests/test_bookings.py:107-117`). Set-oriented equivalent: group by the
  * key, count > 1 ⇒ every key value with n > 1 is a violation.
  *
  * Scale design: a single `groupBy(key)` on a skewed natural key (one host
  * contributing a large share of urls — but crucially, one *url* repeated
  * millions of times, which is exactly the duplicate case we must detect)
  * would put the whole hot key in one reducer. So we aggregate in two
  * phases:
  *
  *   phase 1: groupBy(key, salt) → partial counts   (hot key split S ways)
  *   phase 2: groupBy(key)       → sum of partials  (at most S rows per key)
  *
  * The salt is derived from DATA (xxhash64 of the partition value), never
  * from partition id or RNG, so verdicts are identical across parallelism
  * levels (BASELINE.md determinism requirement). AQE skew-join handling
  * covers residual imbalance.
  */
object Uniqueness {

  /** Deterministic data-derived salt in [0, salts). Hashed from
    * cfg.saltExpr (fallback partExpr) — see EngineConfig.saltExpr for why
    * it must vary within a duplicate-key group.
    */
  def saltCol(cfg: EngineConfig, salts: Int): Column = {
    val src = if (cfg.saltExpr.nonEmpty) cfg.saltExpr else cfg.partExpr
    pmod(xxhash64(expr(src)), lit(salts.toLong))
  }

  /** One violation per DISTINCT duplicated key value (message carries the
    * multiplicity). Uniqueness is a cross-partition GLOBAL rule, so its
    * violations carry the `(global)` scope rather than a data partition —
    * this also keeps BOTH aggregation phases pure HashAggregate (carrying
    * a min(part-string) through them would force SortAggregate: string
    * buffers are not hash-mutable).
    */
  def duplicateKeyViolations(df: DataFrame, rule: Unique,
      cfg: EngineConfig): DataFrame = {
    // SQL unique-constraint semantics: NULLs never collide (NULL != NULL);
    // missing keys are the Required rule's business, not this one's.
    val partial = df
      .where(rule.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(
        concat_ws("\u001f", rule.columns.map(c => coalesce(col(c).cast("string"), lit("(null)"))): _*).as("_ukey"),
        saltCol(cfg, cfg.uniquenessSalts).as("_salt"))
      .groupBy(col("_ukey"), col("_salt"))
      .agg(count(lit(1)).as("_n"))
    partial
      .groupBy(col("_ukey"))
      .agg(sum(col("_n")).as("n"))
      .where(col("n") > 1)
      .select(
        col("_ukey").as("key"),
        lit(ValidationEngine.GlobalPart).as("part"),
        lit(rule.ruleId).as("rule_id"),
        lit(rule.path).as("path"),
        concat(lit(if (rule.message.nonEmpty) rule.message
                   else s"duplicate value for unique(${rule.path}): n="),
               col("n").cast("string")).as("message"),
        lit(rule.severity).as("severity"))
  }

  /** Row-level variant: every row whose key is duplicated (reference raises
    * per-row IntegrityError). Costs a second shuffle (semi-join back);
    * prefer [[duplicateKeyViolations]] at scale.
    */
  def duplicateRows(df: DataFrame, columns: Seq[String],
      cfg: EngineConfig): DataFrame = {
    val dupKeys = df.groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("_n")).where(col("_n") > 1)
      .select(columns.map(col): _*)
    df.join(dupKeys, columns, "left_semi")
  }
}
