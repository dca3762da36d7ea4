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
  * Implementation notes: PERMISSIVE mode + `columnNameOfCorruptRecord`;
  * the parsed frame is CACHED before filtering because Spark disallows
  * queries whose only referenced column is the internal corrupt-record
  * column (SPARK-21610) — filtering good/bad otherwise throws
  * AnalysisException on some plans.
  */
object JsonlFiles {

  val CorruptCol = "_corrupt_record"

  /** The split ingest: `good` rows under the declared schema, `quarantined`
    * raw lines for triage, and `release()` to drop the backing cache once
    * both sides are consumed (the cache exists only for SPARK-21610; a
    * long-lived session ingesting many corpora must release it or pin one
    * full parsed copy per call).
    */
  final case class JsonlIngest(good: DataFrame, quarantined: DataFrame,
      release: () => Unit)

  /** Read `path` as JSONL under `schema`. */
  def read(spark: SparkSession, path: String,
      schema: StructType): JsonlIngest = {
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache() // SPARK-21610: corrupt-column-only queries need this
    val good = raw.where(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = raw.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlIngest(good, bad, () => { raw.unpersist(); () })
  }
}
