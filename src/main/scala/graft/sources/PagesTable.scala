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
    */
  def write(pages: DataFrame, dir: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    pages
      .withColumn(PartitionCol, date_format(col("warc_ts"), "yyyy-MM-dd"))
      .repartition(col(PartitionCol)) // one shuffle → one file set per day
      .write.mode(mode)
      .partitionBy(PartitionCol)
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Read only the given days — the filter lands in the scan's
    * PartitionFilters, so unlisted days are never opened.
    */
  def readDays(spark: SparkSession, dir: String, days: Seq[String]): DataFrame =
    read(spark, dir).where(col(PartitionCol).isin(days: _*))
}
