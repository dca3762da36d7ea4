package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules.ValidationRule

/** The `_validation_audit` table: per-partition lineage + metrics rows, and
  * the resume watermark (north_rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * Reference analog: the `StateLog` audit trail + `MonitorField`s
  * (`cerberus/models/invoice.py:70-71,138-151`) — an append-only history
  * from which "what already happened" is reconstructed. Here: a run is
  * resumable because each (partition, rule) verdict is an idempotent row;
  * on restart we diff the input's partitions against the audit and validate
  * only the new ones (batch incrementality per SURVEY.md §2.8 — with Iceberg
  * this would key on snapshot-id; on plain parquet we key on the partition
  * value, which is the same unit the daily crawl appends by).
  */
final class AuditLog(dir: String, spark: SparkSession) {

  private val verdictsDir = s"$dir/verdicts"
  private val runsDir = s"$dir/runs"

  private def exists(p: String): Boolean = {
    // Hadoop FileSystem, not java.io.File: the audit table lives next to the
    // data (hdfs:// or s3a:// in production), where a local-FS check would
    // always say "missing" and silently restart validation from scratch
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Append verdict rows stamped with run lineage. */
  def append(verdicts: DataFrame, runId: String): Unit = {
    verdicts
      .withColumn("run_id", lit(runId))
      .withColumn("audit_ts", current_timestamp())
      .write.mode(SaveMode.Append).parquet(verdictsDir)
    spark.createDataFrame(Seq((runId, java.time.Instant.now.toString)))
      .toDF("run_id", "started").write.mode(SaveMode.Append).parquet(runsDir)
  }

  def verdicts(): DataFrame =
    if (exists(verdictsDir)) spark.read.parquet(verdictsDir)
    else spark.emptyDataFrame

  /** Data partitions that already have verdict rows — the resume watermark.
    * The "(global)" scope row (uniqueness verdicts) is not a data partition
    * and never gates a resume.
    */
  def validatedParts(): Set[String] =
    if (!exists(verdictsDir)) Set.empty
    else spark.read.parquet(verdictsDir).select("part").distinct()
      .collect().map(_.getString(0)).toSet - ValidationEngine.GlobalPart

  /** The `checked` row count each data partition had when it was LAST
    * validated (latest audit_ts wins — a re-validated partition's fresh
    * rows supersede history). The drift detector compares these against
    * live counts.
    */
  def latestCheckedByPart(): Map[String, Long] =
    if (!exists(verdictsDir)) Map.empty
    else spark.read.parquet(verdictsDir)
      .where(col("part") =!= ValidationEngine.GlobalPart)
      .groupBy(col("part"))
      .agg(max(struct(col("audit_ts"), col("checked")))
        .getField("checked").as("checked"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Physically drop all verdict rows for the given partitions — the plain-
    * parquet analog of an Iceberg row-level DELETE, used when a validated
    * partition drifted (was compacted / re-grown / deleted) and its stale
    * verdicts must not survive alongside the re-validation's fresh rows.
    *
    * Crash-safe by construction: the filtered copy is fully materialized to
    * a temp dir BEFORE the live dir is swapped, and a crash between delete
    * and rename leaves no verdicts dir — which the resume logic reads as
    * "validate everything", never as stale success.
    */
  def supersede(parts: Set[String]): Unit = {
    if (parts.nonEmpty && exists(verdictsDir)) {
      val tmp = s"$verdictsDir-rewrite"
      // a stale -rewrite dir from a crashed earlier supersede would
      // otherwise merge into this rewrite via mode(Overwrite)'s dynamic
      // semantics or confuse the rename below — clear it first
      val conf = spark.sparkContext.hadoopConfiguration
      val live = new org.apache.hadoop.fs.Path(verdictsDir)
      val tmpPath = new org.apache.hadoop.fs.Path(tmp)
      val fs = live.getFileSystem(conf)
      if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
      spark.read.parquet(verdictsDir)
        .where(!col("part").isin(parts.toSeq: _*))
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      fs.delete(live, true)
      // rename can fail NON-exceptionally (object stores, cross-device):
      // swallowing it would silently discard the whole audit history and
      // leak the rewrite dir — fail loudly instead (the deleted live dir
      // is still fail-SAFE: the next resume re-validates everything)
      if (!fs.rename(tmpPath, live))
        sys.error(s"audit supersede: rename $tmp -> $verdictsDir failed; " +
          "verdict history is at the -rewrite path, resume will re-validate")
    }
  }
}

object Audit {

  /** Incremental (resumable) validation: validate only partitions not yet
    * in the audit, append their verdicts, return the result for the NEW
    * partitions only. Re-running after success is a no-op; re-running after
    * a mid-run failure re-validates only what never got verdict rows —
    * per-partition verdicts are the unit of idempotent re-execution.
    *
    * Uniqueness rules are GLOBAL (cross-partition): a key duplicated across
    * an already-validated partition and a newly-arrived one must still flag,
    * so the uniqueness pass scans the FULL table — keys-only, column-pruned
    * passes over the unique-key columns, never the document bodies.
    * Row/referential/stats passes stay pending-only.
    *
    * Resume is DRIFT-SAFE: validated partitions are trusted only while
    * their live row count still matches the audit's — a compacted, re-grown
    * or deleted partition is detected on every resume (count-only pass),
    * re-validated, and its stale verdict rows superseded. The global
    * uniqueness verdict's `checked` count comes from those live counts (or,
    * on a first run, from this run's own profiles), so it always describes
    * the table the uniqueness pass actually scanned.
    *
    * KNOWN LIMIT of count-based detection: a rewrite that changes CONTENT
    * while preserving the row count (an in-place UPDATE) is invisible. On
    * plain parquet that requires a deliberate same-cardinality rewrite
    * (compaction and late-arrival merges change counts); on Iceberg, key
    * the comparison on the partition's snapshot/sequence id instead and
    * every rewrite is visible.
    */
  def runIncremental(df: DataFrame, rules: Seq[ValidationRule],
      dims: Map[String, DataFrame], cfg: EngineConfig,
      auditDir: String, runId: String): Option[ValidationResult] = {
    val spark = df.sparkSession
    val audit = new AuditLog(auditDir, spark)
    val done0 = audit.validatedParts()

    val partKey = coalesce(expr(cfg.partExpr).cast("string"), lit("(null)"))

    // Drift detection: a crawl table is compacted, re-written and pruned
    // routinely, so "this partition has verdict rows" is not proof the rows
    // it described still exist. Compare the audit's latest per-partition
    // checked count against a LIVE count per partition — a single
    // count-only pass (one narrow column for the partition expression, no
    // document bodies). Any validated partition whose count changed is
    // re-validated this run and its stale audit rows are physically
    // superseded; a validated partition that vanished from the table has
    // its rows dropped outright. The live totals also become the global
    // uniqueness verdict's `checked` figure, so it always describes
    // exactly the rows the full-table uniqueness pass scanned — never a
    // stale audit reconstruction.
    val (done, liveTotal, drifted): (Set[String], Option[Long], Set[String]) =
      if (done0.isEmpty) (done0, None, Set.empty[String])
      else {
        val live = df.groupBy(partKey.as("part")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val auditCounts = audit.latestCheckedByPart()
        val dr = done0.filter(p => live.get(p) != auditCounts.get(p))
        audit.supersede(dr)
        (done0 -- dr, Some(live.valuesIterator.sum), dr)
      }

    // Partition pruning: the filter on partExpr is pushed to the scan, so
    // already-validated daily partitions are never read again. NULL-part
    // rows key as "(null)" — the same keying every pass uses — so they are
    // validated exactly once and a NULL never poisons the isin (whose SQL
    // semantics would otherwise drop every non-matching row).
    val pending =
      if (done.isEmpty) df
      else df.where(!partKey.isin(done.toSeq: _*))

    val uniqueRules = rules.collect { case r: graft.rules.Unique => r }
    // A DELETE-only drift leaves no pending rows yet still invalidates the
    // GLOBAL uniqueness verdict (a duplicate whose twin vanished is a
    // duplicate no more) — the uniqueness pass must re-run over the live
    // table so the latest "(global)" row describes what was actually
    // scanned. Only when nothing drifted AND nothing is pending is the
    // resume a true no-op.
    val globalRefreshNeeded = drifted.nonEmpty && uniqueRules.nonEmpty

    if (pending.isEmpty && !globalRefreshNeeded) None
    else {
      val rowVios = ValidationEngine.rowPass(pending, rules, dims, cfg)
      val uniqVios = uniqueRules.map(r =>
        Uniqueness.duplicateKeyViolations(df, r)) // full table
      val violations = (Seq(rowVios) ++ uniqVios).reduce(_.unionByName(_))
      val profiles = StatsPass.profile(pending, cfg)
      val checked = profiles.groupBy(col("part"))
        .agg(max(col("rowCount")).as("checked"))
      val globalChecked =
        if (uniqueRules.isEmpty) None
        else liveTotal.orElse {
          // first run (no audit yet): pending IS the full table the
          // uniqueness pass scanned. Count it DIRECTLY — pending.count()
          // on a partition-pruned parquet read resolves from row-group
          // metadata; summing this run's `checked` instead would eagerly
          // execute the whole stats aggregation (HLL + quantiles over
          // every column) here and then AGAIN when the verdicts/profiles
          // materialize, doubling the most expensive phase. On resumes
          // the drift pass above has already paid for live counts and
          // liveTotal is authoritative.
          Some(pending.count())
        }
      val verdicts = ValidationEngine.assembleVerdicts(
        spark, rules, violations, checked, globalChecked)
      val res = ValidationResult(violations, verdicts, profiles)
      audit.append(res.verdicts, runId)
      Some(res)
    }
  }
}
