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
    * this also keeps the aggregation phases pure HashAggregate (carrying
    * a min(part-string) through them would force SortAggregate: string
    * buffers are not hash-mutable).
    *
    * Shuffle shape (the dominant cost at 10^12 keys): the salted counting
    * phases shuffle an 8-byte xxhash64 of the key, NEVER the key string —
    * at Common-Crawl url lengths that is ~8x fewer shuffle bytes. Because
    * a 64-bit hash CAN collide (the birthday bound bites at billions of
    * keys), hash-duplicates are only CANDIDATES: an exact verify pass
    * joins the (tiny) duplicate-hash set back and re-counts by the real
    * key value — itself salted two-phase, so a hot duplicated key stays
    * split in the verify aggregation too. The verify pass touches only
    * candidate rows in the expected case; in a pathological all-duplicates
    * input the candidate join falls back from BHJ to a shuffle join whose
    * join-key partitioning concentrates a hot key on one task — AQE's
    * skew-join splitting is the mitigation there (on by default in every
    * engine entry point; keep it on).
    */
  def duplicateKeyViolations(df: DataFrame, rule: Unique,
      cfg: EngineConfig): DataFrame = {
    // SQL unique-constraint semantics: NULLs never collide (NULL != NULL);
    // missing keys are the Required rule's business, not this one's.
    val keyed = df
      .where(rule.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(
        concat_ws("\u001f", rule.columns.map(c => coalesce(col(c).cast("string"), lit("(null)"))): _*).as("_ukey"),
        saltCol(cfg, cfg.uniquenessSalts).as("_salt"))
    violationsFromKeyed(keyed, rule, cfg)
  }

  /** Core two-phase salted + hash-shuffled pipeline over a pre-projected
    * (_ukey, _salt) frame (shared by the engine's staged sink path).
    */
  private[engine] def violationsFromKeyed(keyed: DataFrame, rule: Unique,
      cfg: EngineConfig): DataFrame = {
    // phase 1: (hash, salt) partial counts — hot keys split S ways
    // phase 2: per-hash totals — at most S rows per hash
    val dupHashes = keyed
      .select(xxhash64(col("_ukey")).as("_kh"), col("_salt"))
      .groupBy(col("_kh"), col("_salt"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("_kh"))
      .agg(sum(col("_n")).as("_hn"))
      .where(col("_hn") > 1)
      .select("_kh")
    // exact verify: candidate rows only (hash collisions re-split here).
    // No broadcast hint: the dup-hash set is tiny in the expected case and
    // AQE picks BHJ from its ACTUAL size; a pathological all-dups input
    // falls back to a shuffle join instead of OOMing the driver. The
    // re-count is salted two-phase like phase 1, so the hot key the salt
    // exists for stays split here too.
    keyed
      .join(dupHashes, xxhash64(col("_ukey")) === col("_kh"))
      .groupBy(col("_ukey"), col("_salt"))
      .agg(count(lit(1)).as("_vn"))
      .groupBy(col("_ukey"))
      .agg(sum(col("_vn")).as("n"))
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
