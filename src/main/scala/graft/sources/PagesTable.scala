package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the pages table.
  *
  * Production target is an Iceberg table partitioned by day(warc_ts)
  * (BASELINE.json input_hint); this sandbox has no Iceberg jars, so the
  * stand-in is hive-style partitioned parquet with the same layout and the
  * same pruning behavior: a filter on `p_date` prunes whole directories at
  * planning time (visible as PartitionFilters in the scan node), which is
  * what makes incremental validation (graft.engine.Audit) read only
  * newly-arrived days. The engine itself is layout-agnostic — swap
  * `spark.read.parquet` for `spark.read.format("iceberg")` and everything
  * else holds.
  */
object PagesTable {

  val PartitionCol = "p_date"

  /** Write pages partitioned by day; `p_date` is derived, the original
    * `warc_ts` column is preserved.
    *
    * `filesPerDay` bounds write parallelism WITHIN a day: the shuffle key
    * is (day, rowhash % filesPerDay), so UP TO `filesPerDay` tasks write
    * each day's directory — an upper bound, not an exact count: distinct
    * (day, bucket) keys can hash-collide into one reducer when the
    * shuffle width is small relative to days × filesPerDay, yielding
    * fewer files (harmless; at crawl-scale widths collisions vanish).
    * The default 1 gives the tidy one-file-per-day
    * layout the tests and small jobs want — but a single task per day is
    * a serialization funnel at crawl scale (one day of a 10^12-row table
    * is terabytes); size filesPerDay there so each file lands near
    * `spark.sql.files.maxPartitionBytes` for the readers.
    */
  def write(pages: DataFrame, dir: String,
      mode: SaveMode = SaveMode.Overwrite, filesPerDay: Int = 1): Unit = {
    require(filesPerDay >= 1, s"filesPerDay must be >= 1: $filesPerDay")
    val withDay = pages
      .withColumn(PartitionCol, date_format(col("warc_ts"), "yyyy-MM-dd"))
    // explicit partition count: a bare repartition(cols...) leaves the
    // count to AQE, which coalesces small shuffles back into one task
    // and silently defeats the spread
    val n = math.max(filesPerDay,
      pages.sparkSession.sessionState.conf.numShufflePartitions)
    // tidy path (filesPerDay = 1): an explicit SMALL width. Bare
    // repartition(col) lets AQE coalesce the byte-tiny exchange to ONE
    // task, which then writes every day's directory serially (measured
    // r8: the whole write funneled through a single 0.7 s task); the full
    // shuffle width wastes (width − days) empty task commits instead.
    // Eight day-keyed tasks cover the tidy path's real shape — incremental
    // appends of a handful of days (1 file/day holds under ANY width:
    // each day still lands in exactly one task) — while multi-day
    // backfills at scale are filesPerDay > 1 territory by the scaladoc's
    // own serialization-funnel warning.
    val spread =
      if (filesPerDay == 1)
        withDay.repartition(math.min(8, n), col(PartitionCol))
      else withDay.repartition(n, col(PartitionCol),
        pmod(xxhash64(pages.columns.map(c => col(c).cast("string")): _*),
          lit(filesPerDay)))
    spread
      .write.mode(mode)
      .partitionBy(PartitionCol)
      .parquet(dir)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Read only the given days — the filter lands in the scan's
    * PartitionFilters, so unlisted days are never opened.
    */
  def readDays(spark: SparkSession, dir: String, days: Seq[String]): DataFrame =
    read(spark, dir).where(col(PartitionCol).isin(days: _*))

  /** Keyed upsert — S4's `MERGE INTO` on the natural key (reference:
    * `BookingSlot.get_slot` get-or-create, `cerberus/models/booking.py:56-64`;
    * here the natural key is `url` and the use case is a daily re-crawl
    * re-ingesting a day).
    *
    * Parquet stand-in for Iceberg MERGE: ONE row per key survives GLOBALLY
    * — an update beats the existing row, newest `versionCol` wins among
    * updates — and the merge rewrites only the partitions that can change:
    * the arriving day(s) plus any day holding a PREVIOUS version of an
    * arriving key (found by a keys-only, column-pruned semi-join against
    * the table — a re-crawl usually moves a url to a new day, and without
    * this the old day would keep a stale duplicate). Days emptied by the
    * merge have their files removed (dynamic overwrite cannot write an
    * empty partition). At 100 TB: untouched days are never rewritten, and
    * the only full-table read is the pruned key+day projection.
    *
    * Idempotent: upserting the same batch twice leaves the table
    * byte-identical (deterministic tie-breaks, no RNG).
    */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
      keyCols: Seq[String] = Seq("url"),
      versionCol: String = "warc_ts",
      // same within-day write-parallelism knob as [[write]]: 1 = tidy
      // one-file-per-day (tests, small merges); at crawl scale size it so
      // a rewritten day is written by many tasks, not one
      filesPerDay: Int = 1): Unit = {
    require(filesPerDay >= 1, s"filesPerDay must be >= 1: $filesPerDay")
    import org.apache.spark.sql.expressions.Window
    val updatesP = updates
      // partition derives from the VERSION column (day granularity), so a
      // caller merging on a different timestamp column gets a consistent
      // layout instead of a silent warc_ts dependency
      .withColumn(PartitionCol, date_format(col(versionCol), "yyyy-MM-dd"))
      .withColumn("_src", lit(1))
    // Hadoop FS, not java.io.File: on hdfs://s3a:// a local check is always
    // false and the merge path would be silently skipped (no latest-wins
    // dedup, stale cross-day duplicates left behind)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val exists = dirPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dirPath)
    val (merged, mergeDays) = if (!exists) (updatesP, Seq.empty[String]) else {
      val updKeys = updatesP.select(keyCols.map(col): _*).distinct()
      // arriving days ∪ stale-key days in ONE collect (they fed two
      // separate driver round-trips before — r8 job-count trim; the
      // union is still a tiny day list)
      val days = updatesP.select(col(PartitionCol).cast("string"))
        .unionByName(read(spark, dir)
          .select((PartitionCol +: keyCols).map(col): _*)
          .join(updKeys, keyCols, "left_semi")
          // partition inference types p_date as DATE on read — normalize
          .select(col(PartitionCol).cast("string")))
        .distinct()
        .collect().map(_.getString(0)).toSeq
      (readDays(spark, dir, days).withColumn("_src", lit(0))
        .unionByName(updatesP), days)
    }
    // NULL keys never match in MERGE (SQL semantics; the Required rule owns
    // them) — they never collapse into one window group. But a bare
    // pass-through would break idempotence: a replayed batch's null-key
    // rows arrive AGAIN next to the copies already read back from the
    // arriving day (_src=0), growing the table per replay. So null-key
    // rows dedupe by FULL ROW CONTENT across existing∪arriving (identical
    // byte-for-byte duplicates collapse to one — documented semantics;
    // rows differing in any column are all kept). Final tie-break hashes
    // the row so repeated upserts are bit-deterministic even on
    // (key, version) ties.
    val keyedCond = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val rowHash = xxhash64(merged.columns
      .filterNot(Set(PartitionCol, "_src"))
      .map(c => col(c).cast("string")): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*) // GLOBAL latest per key, not per day
      .orderBy(col("_src").desc, col(versionCol).desc, rowHash.asc)
    val deduped = merged.where(keyedCond)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn", "_src")
      .unionByName(merged.where(!keyedCond).drop("_src").distinct())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // dynamic overwrite: only partitions present in `deduped` are replaced
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val keptDays = deduped.select(col(PartitionCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSet
      val nOut = math.max(filesPerDay,
        spark.sessionState.conf.numShufflePartitions)
      // tidy path: the kept-day list is ALREADY collected above, so the
      // write width can be exact — one task per day (bounded by the
      // session width), instead of either AQE's single serial task or
      // (width − days) empty task commits (see [[write]])
      val spread =
        if (filesPerDay == 1) deduped.repartition(
          math.max(1, math.min(keptDays.size,
            spark.sessionState.conf.numShufflePartitions)),
          col(PartitionCol))
        else deduped.repartition(nOut, col(PartitionCol),
          pmod(xxhash64(deduped.columns.filterNot(_ == PartitionCol)
            .map(c => col(c).cast("string")): _*), lit(filesPerDay)))
      spread
        .write.mode(SaveMode.Overwrite)
        .partitionBy(PartitionCol)
        .parquet(dir)
      // a day whose every row was a stale version of an arriving key ends
      // up empty — dynamic overwrite leaves its old files; drop them
      mergeDays.filterNot(keptDays).foreach { day =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$PartitionCol=$day")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    } finally {
      deduped.unpersist()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
