package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest with corrupt-record QUARANTINE — the third common
  * interchange shape for web corpora next to parquet and WET. A crawl
  * dump always contains some garbage lines; under Spark 4's ANSI mode a
  * naive read either throws mid-job or (FAILFAST) kills the whole ingest
  * on the first bad line. This reader splits instead: well-formed rows
  * flow on under the declared schema, malformed lines land in a
  * quarantine frame with the raw line preserved for triage — the same
  * violation-row philosophy as the validation engine (bad input is DATA,
  * not an exception).
  *
  * Implementation: the files are read as plain `text` and parsed with
  * `from_json` in PERMISSIVE mode with `columnNameOfCorruptRecord` inside
  * the struct schema — a line is quarantined iff the corrupt field is
  * non-null. Both frames are plain projections over the text scan:
  * nothing is cached or pinned, so at corpus scale the ingest costs two
  * streaming scans of the raw source (one per consumed side) instead of
  * materializing one full parsed copy in executor storage to support a
  * quarantine that is a fraction of a percent of rows. (The previous
  * `DataFrameReader.json` + `.cache()` form existed only to dodge
  * SPARK-21610, which restricts corrupt-column-only queries on the JSON
  * *reader* path; `from_json` over a text scan is not subject to it.)
  */
object JsonlFiles {

  val CorruptCol = "_corrupt_record"

  /** The split ingest: `good` rows under the declared schema and
    * `quarantined` raw lines for triage. Both are lazy projections over
    * the text source — no backing cache. `release` is retained for source
    * compatibility with the previous cache-pinning reader and is a no-op.
    */
  final case class JsonlIngest(good: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** Read `path` as JSONL under `schema`. */
  def read(spark: SparkSession, path: String,
      schema: StructType): JsonlIngest = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare the reserved corrupt column '$CorruptCol'")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    // skip blank/whitespace-only lines up front (DataFrameReader.json
    // parity, and the jsonlines convention of tolerating blank
    // separators): from_json maps empty input to a NULL struct rather
    // than a corrupt record, which would otherwise surface each blank
    // line as an all-null GOOD row
    val parsed = spark.read.text(path)
      .where(trim(col("value")) =!= "")
      .select(col("value"), from_json(col("value"), withCorrupt, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol)).as("p"))
    // a NULL parsed struct (the JSON literal `null` on its own line —
    // from_json returns null rather than a corrupt record for it) is not
    // a document either: quarantine it with the raw line
    val good = parsed
      .where(col("p").isNotNull && col(s"p.$CorruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"p.$f").as(f)): _*)
    val bad = parsed
      .where(col("p").isNull || col(s"p.$CorruptCol").isNotNull)
      .select(coalesce(col(s"p.$CorruptCol"), col("value")).as("raw_line"))
    JsonlIngest(good, bad, () => ())
  }
}
