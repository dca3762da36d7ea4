package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rules.Unique

/** Uniqueness checking at scale (SURVEY.md §2.4 A9, rule R5).
  *
  * Reference semantics: DB unique constraints — duplicate (start, end) slots
  * raise IntegrityError (`cerberus/models/booking.py:50`,
  * `tests/test_bookings.py:107-117`). Set-oriented equivalent: group by the
  * key, count > 1 ⇒ every key value with n > 1 is a violation.
  *
  * Scale design — the engine's ONE unavoidable full shuffle:
  *
  *   count:  groupBy(xxhash64(key)) — 8-byte hashes, partial+final
  *           HashAggregate. Hot keys (one url repeated millions of times —
  *           exactly the duplicate case we must detect) are handled by the
  *           PARTIAL phase: count() is algebraic, every map task emits at
  *           most one (hash, partial-count) row per key, so the final
  *           aggregation receives ≤ #tasks rows for the hottest key.
  *   verify: the duplicate-hash set (tiny) joins back to re-count by the
  *           REAL key value — 64-bit hash collisions are re-split before a
  *           violation is emitted. AQE skew-join handling covers a
  *           pathological all-duplicates candidate join (on by default in
  *           every engine entry point; keep it on).
  *
  * Rounds 1-2 hand-rolled a salted two-phase aggregation here; for an
  * algebraic count that re-implements what partial aggregation already
  * guarantees and pays a second full exchange + two extra aggregation
  * passes (hashpartitioning(key, salt) does not satisfy the per-key
  * phase's distribution requirement), measured ~35% of the phase's
  * cpu/row on narrow rows. Exactness under a 33%-hot key and invariance
  * to parallelism are pinned in SkewSpec.
  */
object Uniqueness {

  /** 64-bit key hash over the RAW typed key columns — Spark's multi-arg
    * xxhash64 folds each column into the running seed, so column boundaries
    * are preserved (("a","bc") never collides with ("ab","c") by
    * construction) and NO key string is ever materialized in the counting
    * phases: a counting row is 8 fixed bytes, both as a hash-table entry
    * and on the shuffle wire.
    */
  private[engine] def keyHash(columns: Seq[String]): Column =
    xxhash64(columns.map(col): _*)

  /** One violation per DISTINCT duplicated key value (message carries the
    * multiplicity). Uniqueness is a cross-partition GLOBAL rule, so its
    * violations carry the `(global)` scope rather than a data partition —
    * this also keeps the aggregation phases pure HashAggregate (carrying
    * a min(part-string) through them would force SortAggregate: string
    * buffers are not hash-mutable).
    *
    * Shuffle shape (the dominant cost at 10^12 keys): the counting phase
    * aggregates and shuffles an 8-byte xxhash64 of the key, NEVER the key
    * string — at Common-Crawl url lengths that is ~8x fewer shuffle bytes,
    * and the aggregation hash tables hold fixed-width entries instead of
    * url-sized strings (the narrow-row scaling bottleneck round 2
    * localized). Because a 64-bit hash CAN collide (the birthday bound
    * bites at billions of keys), hash-duplicates are only CANDIDATES:
    * the verify pass re-derives the real key values from the source
    * for candidate rows only.
    */
  def duplicateKeyViolations(df: DataFrame, rule: Unique): DataFrame = {
    // SQL unique-constraint semantics: NULLs never collide (NULL != NULL);
    // missing keys are the Required rule's business, not this one's.
    val hashed = df
      .where(rule.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(keyHash(rule.columns).as("_kh"))
    verifiedViolations(df, rule, dupHashes(hashed))
  }

  /** Counting over 8-byte key-hash rows → the DISTINCT duplicated hashes.
    *
    * ONE partial+final hash aggregation, no salting: count() is algebraic,
    * so Spark's map-side partial aggregation already splits a hot key
    * across tasks by construction — each map task emits at most ONE
    * (hash, partial-count) row per key, and the final aggregation receives
    * at most #tasks rows for the hottest key. The salted two-phase scheme
    * this replaces (rounds 1-2) re-implemented exactly that collapse by
    * hand and paid a SECOND full exchange + two extra aggregation passes
    * for it (hashpartitioning(kh, salt) cannot satisfy the phase-2
    * hashpartitioning(kh) requirement) — measured ~35% of the uniqueness
    * phase's cpu/row on narrow rows. Skew-exactness is pinned by SkewSpec
    * either way; AQE skew handling stays on for the verify JOIN, which is
    * the one place aggregation cannot pre-collapse a hot key.
    */
  private[engine] def dupHashes(hashed: DataFrame): DataFrame =
    hashed
      .groupBy(col("_kh"))
      .agg(count(lit(1)).as("_hn"))
      .where(col("_hn") > 1)
      .select("_kh")

  /** Exact verify pass: re-derive the real key VALUES from the source
    * (column-pruned to the key columns — document bodies are never
    * decoded here) and re-count by value for candidate rows only, so
    * 64-bit collisions are re-split before a violation is emitted.
    *
    * No broadcast hint on the candidate join: the dup-hash set is tiny in
    * the expected case and AQE picks BHJ from its ACTUAL size; a
    * pathological all-dups input falls back to a shuffle join instead of
    * OOMing the driver. The re-count is again partial+final aggregation,
    * so a hot duplicated key is pre-collapsed per map task here too.
    */
  private[engine] def verifiedViolations(source: DataFrame, rule: Unique,
      dupHashes: DataFrame): DataFrame = {
    val keyed = source
      .where(rule.columns.map(col(_).isNotNull).reduce(_ && _))
      .select(
        concat_ws("\u001f",
          rule.columns.map(c => col(c).cast("string")): _*).as("_ukey"),
        keyHash(rule.columns).as("_kh"))
    verifyCount(keyed.join(dupHashes, Seq("_kh")), rule)
  }

  /** Re-count candidates by real key value — one partial+final aggregation
    * (map-side combine collapses a hot duplicated key per task, same
    * argument as [[dupHashes]]) — and emit the violation rows.
    */
  private[engine] def verifyCount(cands: DataFrame, rule: Unique): DataFrame = {
    cands
      .groupBy(col("_ukey"))
      .agg(count(lit(1)).as("n"))
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

}
