package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-snapshot invariants (north_star: "byte-identical extracted text
  * per url preserved end-to-end"; reference analogs: immutability after
  * send `cerberus/models/invoice.py:92-108` and stored-denormalized-copy
  * consistency `:165-166` — SURVEY.md §2.10 R13/R14).
  *
  * The comparison never moves document bodies: each side reduces to
  * (key, xxhash64(bytes)) — 16 bytes per row through the join — so two
  * 100 TB snapshots compare with a shuffle of ~32 TB-¹ scale key-hash
  * pairs. Hash equality stands in for byte equality (64-bit collision odds
  * are negligible at any realistic corpus size... and a planted mutation
  * changes the hash with probability 1 − 2⁻⁶⁴).
  */
object CrossSnapshot {

  /** Violations for keys whose protected column changed bytes between
    * snapshots, plus keys that disappeared (severity warn).
    */
  def byteIdentity(before: DataFrame, after: DataFrame,
      keyExpr: String, colName: String,
      ruleId: String = "byte_identity"): DataFrame = {
    // xxhash64 never returns null (a null column value hashes to the
    // seed), so a_h.isNull identifies unmatched keys all by itself
    def digest(df: DataFrame, pfx: String) = df.select(
      expr(keyExpr).cast("string").as("key"),
      xxhash64(col(colName)).as(s"${pfx}_h"))

    val b = digest(before, "b")
    val a = digest(after, "a")
    val joined = b.join(a, Seq("key"), "left")

    val changed = joined.where(col("a_h").isNotNull &&
        !(col("b_h") <=> col("a_h")))
      .select(col("key"),
        lit(ValidationEngine.GlobalPart).as("part"),
        lit(ruleId).as("rule_id"),
        lit(colName).as("path"),
        lit(s"$colName bytes differ between snapshots").as("message"),
        lit("error").as("severity"))
    val vanished = joined.where(col("a_h").isNull)
      .select(col("key"),
        lit(ValidationEngine.GlobalPart).as("part"),
        lit(ruleId).as("rule_id"),
        lit(colName).as("path"),
        lit(s"key missing from the later snapshot").as("message"),
        lit("warn").as("severity"))
    changed.unionByName(vanished)
  }
}
