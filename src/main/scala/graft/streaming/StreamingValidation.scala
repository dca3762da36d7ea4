package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.engine._
import graft.rules.ValidationRule

/** Streaming face of the engine (SURVEY.md §2.8).
  *
  * The reference is batch-only; its closest streaming analogs are the
  * `InvoiceOpen` append-only event feed and the `StateLog` audit trail. The
  * engine is therefore batch-first, and the streaming path is exactly the
  * per-partition batch pass ported to `foreachBatch` — same rules, same
  * violation schema, same audit sink — so semantics cannot drift between
  * the two modes.
  */
object StreamingValidation {

  /** Validate a stream micro-batch-wise: every trigger runs the SAME
    * row-rule + referential pass used in batch and appends violations to
    * the sink. Uniqueness/stats stay in the daily batch job (cross-batch
    * global state for 10^12 keys does not belong in a stream's state
    * store); within-batch duplicates are still caught when `withinBatchUnique`
    * is set.
    */
  def validateStream(stream: DataFrame, rules: Seq[ValidationRule],
      dims: Map[String, DataFrame], cfg: EngineConfig,
      violationsSink: String, checkpoint: String,
      withinBatchUnique: Boolean = true): DataStreamWriter[Row] = {
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val res = ValidationEngine.run(batch, rules, dims, cfg)
        res.violations
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(violationsSink)
      }
  }

  /** Watermarked windowed violation counts — the streaming verdict feed:
    * (window, rule_id) → violations, emitted once the watermark passes.
    * Late events beyond `lateness` are dropped, matching the batch job's
    * daily-partition finality.
    */
  def windowedViolationCounts(stream: DataFrame, rules: Seq[ValidationRule],
      cfg: EngineConfig, tsCol: String,
      windowLength: String = "10 minutes",
      lateness: String = "5 minutes"): DataFrame = {
    val rowRules = rules.collect { case r: graft.rules.RowRule => r }
    // explode_outer, NOT explode: clean rows must still flow through the
    // event-time watermark operator or the watermark never advances on
    // violation-free batches (their max event time would be lost). The
    // null-rule group is filtered after aggregation (a group-key filter,
    // legal in append mode).
    graft.rules.RuleCompiler.withViolations(stream, rowRules)
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), explode_outer(col("_violations")).as("v"))
      .groupBy(window(col(tsCol), windowLength), col("v.rule_id").as("rule_id"))
      .agg(count(lit(1)).as("violations"))
      .where(col("rule_id").isNotNull)
  }
}
