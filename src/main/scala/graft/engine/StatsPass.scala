package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-stats pass (SURVEY.md §7 step 3; north_star "column stats" leg).
  *
  * One `groupBy(partition)` aggregation computes, for every column:
  * row count, null count/rate, approx distinct (HyperLogLog++ via
  * `approx_count_distinct`), min/max — and, for the columns named in
  * `EngineConfig.quantilesFor`, approximate quantiles (the KLL role from
  * the north_star → built-in `percentile_approx`, whose sketch merges
  * across partial aggregation; like any Greenwald-Khanna-style summary the
  * merged result is exact only within the sketch's error bound — different
  * partition cuts may shift a quantile within that bound).
  *
  * Scale: partial aggregation (map-side combine) means the shuffle carries
  * only (numPartitions × numColumns) sketch buffers, not rows. The result
  * doubles as the per-partition `checked` count for verdict assembly, so no
  * extra scan is spent on counting.
  */
object StatsPass {

  /** Long-form profile from pre-resolved (name, Column) measures — the
    * shared core of [[profile]] (reads the source) and
    * `ValidationEngine.runToSink` (reads the staged projection).
    * One row per (part, column): count, nulls, HLL distinct, min/max, and
    * `quantiles: array<double>` (null for columns without quantiles).
    */
  private[engine] def profileFrom(df: DataFrame, partCol: Column,
      named: Seq[(String, Column)], cfg: EngineConfig): DataFrame = {
    val cols = named.map(_._1)
    val qFor = cfg.quantilesFor.toSet
    val probs = array(cfg.quantileProbs.map(lit): _*)
    val aggs: Seq[Column] = count(lit(1)).as("_rows") +: named.flatMap {
      case (c, e) =>
        Seq(
          sum(when(e.isNull, 1L).otherwise(0L)).as(s"_null_$c"),
          approx_count_distinct(e).as(s"_dist_$c"),
          // aggregate in the column's NATIVE type, cast the result — the
          // profile row is string-typed but min(cast-to-string) would
          // order numerics lexicographically ("9" > "100")
          min(e).cast("string").as(s"_min_$c"),
          max(e).cast("string").as(s"_max_$c")) ++
        (if (qFor.contains(c))
          Seq(percentile_approx(e.cast("double"), probs,
            lit(cfg.quantileAccuracy)).as(s"_q_$c"))
         else Nil)
    }
    val wide = df.groupBy(partCol.as("part")).agg(aggs.head, aggs.tail: _*)

    // melt wide → long with a stack() over the per-column measure structs
    val stackArgs = cols.map { c =>
      struct(lit(c).as("column"), col(s"_null_$c").as("nullCount"),
        col(s"_dist_$c").as("approxDistinct"),
        col(s"_min_$c").as("min"), col(s"_max_$c").as("max"),
        (if (qFor.contains(c)) col(s"_q_$c")
         else lit(null).cast("array<double>")).as("quantiles"))
    }
    wide.select(col("part"), col("_rows").as("rowCount"),
        explode(array(stackArgs: _*)).as("m"))
      .select(
        col("part"), col("m.column").as("column"),
        col("rowCount"), col("m.nullCount").as("nullCount"),
        (col("m.nullCount").cast("double") /
          when(col("rowCount") === 0, 1L).otherwise(col("rowCount"))).as("nullRate"),
        col("m.approxDistinct").as("approxDistinct"),
        col("m.min").as("min"), col("m.max").as("max"),
        col("m.quantiles").as("quantiles"))
  }

  /** Long-form profile: one row per (part, column) — graft.model.ColumnProfile.
    * NULL partition values key as "(null)", matching every other pass.
    */
  def profile(df: DataFrame, cfg: EngineConfig,
      columns: Seq[String] = Nil): DataFrame = {
    val named: Seq[(String, Column)] =
      if (cfg.statsExprs.nonEmpty) cfg.statsExprs.map { case (n, e) => (n, expr(e)) }
      else if (columns.nonEmpty) columns.map(c => (c, col(c)))
      else df.columns.toSeq.map(c => (c, col(c)))
    profileFrom(df,
      coalesce(expr(cfg.partExpr).cast("string"), lit("(null)")), named, cfg)
  }

  /** Approximate quantiles of a numeric expression per partition
    * (standalone form; the wired path is `quantilesFor` in the profile).
    */
  def numericQuantiles(df: DataFrame, cfg: EngineConfig, exprSql: String,
      probabilities: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99),
      accuracy: Int = 10000): DataFrame = {
    df.groupBy(coalesce(expr(cfg.partExpr).cast("string"), lit("(null)")).as("part"))
      .agg(percentile_approx(expr(exprSql),
        array(probabilities.map(lit): _*), lit(accuracy)).as("quantiles"))
  }

  /** Fixed-width histogram of a numeric expression per partition — the
    * drift-check input. Bin width chosen by caller; counts shuffle as
    * (part, bin) partials only.
    */
  def histogram(df: DataFrame, cfg: EngineConfig, exprSql: String,
      binWidth: Double): DataFrame = {
    df.select(
        coalesce(expr(cfg.partExpr).cast("string"), lit("(null)")).as("part"),
        floor(expr(exprSql).cast("double") / binWidth).as("bin"))
      .where(col("bin").isNotNull) // null-rates live in the profile pass
      .groupBy(col("part"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
