package graft.model

import org.apache.spark.sql.types._

/** Core output shapes of the validation engine.
  *
  * Mirrors the error semantics of the reference CRM
  * (`cerberus/api/serializers.py:65` — `{field: [messages]}` keyed errors;
  * `cerberus/exceptions.py:6-31` — typed business errors): every failed
  * check becomes a row, never an exception.
  */

/** One violated rule on one row.
  *
  * @param key       natural key of the violating row (`url` for pages,
  *                  `"entity:id"` for CRM replay tables)
  * @param part      partition value the row belongs to (daily `warc_ts`
  *                  bucket, ISO date string) — unit of verdicts & resume
  * @param ruleId    stable rule identifier (SURVEY.md §2.10 R1..R18)
  * @param path      dotted column path the violation is anchored to
  *                  (reference: DRF error dict key)
  * @param message   human-readable message; for replayed CRM rules this
  *                  matches the reference string verbatim
  *                  (e.g. "Booking has max pets for service, 4")
  * @param severity  "error" | "warn" (reference: IntegrityError vs
  *                  `Customer.issues` soft heuristics)
  */
final case class Violation(
    key: String,
    part: String,
    ruleId: String,
    path: String,
    message: String,
    severity: String)

/** Per-(partition, rule) verdict — the idempotent unit of re-execution. */
final case class Verdict(
    part: String,
    ruleId: String,
    checked: Long,
    violations: Long,
    pass: Boolean)

/** Column profile emitted by the stats pass (one per partition × column).
  * `quantiles` carries `EngineConfig.quantileProbs` percentiles for columns
  * named in `quantilesFor` (mergeable percentile_approx sketch — the
  * north_star's KLL role), None otherwise.
  */
final case class ColumnProfile(
    part: String,
    column: String,
    rowCount: Long,
    nullCount: Long,
    nullRate: Double,
    approxDistinct: Long,
    min: String,
    max: String,
    quantiles: Option[Seq[Double]])

/** Distribution-drift verdict between a partition and the reference
  * distribution (previous partition or pinned baseline).
  */
final case class DriftReport(
    part: String,
    basePart: String,
    metric: String, // "psi" | "ks" | "null_rate_delta"
    column: String,
    value: Double,
    threshold: Double,
    pass: Boolean)

object PagesSchema {
  /** The graft input table (BASELINE.json input_hint):
    * Common-Crawl-style web pages, partitioned daily by warc_ts.
    */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))
}
