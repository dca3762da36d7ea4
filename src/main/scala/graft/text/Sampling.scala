package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` uses per-partition RNG: the selected set changes with
  * partitioning, retries, and Spark version — useless for reproducible
  * corpus construction or for the "train the quantizer on 0.1%" idiom
  * ([[graft.sim.Similarity.ivfTrain]]'s scale note). These samplers decide
  * membership from xxhash64 of the ROW KEY alone, so the same row is
  * in or out regardless of parallelism, ordering, retries, or how many
  * times the job runs — and a rerun at a larger rate is a SUPERSET of the
  * smaller one (hash < t₁ ⊂ hash < t₂), which makes growing a training
  * set monotonic instead of a reshuffle.
  */
object Sampling {

  /** hash(key, seed) mapped to [0, 1) — the membership coordinate. */
  private def coord(keyCol: Column, seed: Long): Column =
    (pmod(xxhash64(keyCol, lit(seed)), lit(1000000000L)).cast("double")
      / 1000000000.0)

  /** Keep ~`rate` of rows, decided per key hash. Deterministic, exact
    * per-row membership; the realized fraction concentrates around `rate`
    * (binomial over distinct keys). Equal keys sample together — usually
    * what a dedup-aware pipeline wants (a re-crawled url is in or out as
    * a unit).
    */
  def deterministicSample(df: DataFrame, keyCol: String, rate: Double,
      seed: Long = 42L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of range: $rate")
    df.where(coord(col(keyCol), seed) < rate)
  }

  /** Per-stratum rates (`sampleBy` without its RNG): rows in strata absent
    * from `rates` are dropped, like Spark's own `sampleBy`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0), rates.toString)
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.where(coord(col(keyCol), seed) < rateCol)
  }

  /** Deterministic global shuffle — training corpora are shuffled before
    * sharding, and the shuffle must replay identically: order by the key
    * hash (ties by key, so DISTINCT keys order totally). PRECONDITION:
    * `keyCol` must be unique — rows sharing a key have identical sort
    * keys and no defined relative order (dedup first, or pass a unique
    * key). A range sort, so it scales like any global orderBy.
    *
    * AT 10^12 ROWS don't ask for one global order: shard first, sort
    * within shards —
    * {{{
    * df.repartition(n, shardColumn(col(key), n))
    *   .sortWithinPartitions(xxhash64(col(key), lit(seed)), col(key))
    *   .write.partitionBy(...)
    * }}}
    * Each output shard then reads in exactly the order this global sort
    * would give that shard's rows (same hash, same tie-break — only the
    * cross-shard interleaving differs, which training loaders don't
    * consume anyway). One hash-partition exchange instead of a
    * range-sample + range exchange. Pinned by SamplingSpec.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String,
      seed: Long = 42L): DataFrame =
    df.orderBy(xxhash64(col(keyCol), lit(seed)), col(keyCol))

  /** Stable shard assignment: `shard = hash(key, seed) mod n`. A row keeps
    * its shard across reruns and cluster sizes — write with
    * `.write.partitionBy(shardCol)` for n reproducible training shards.
    */
  def shardColumn(keyCol: Column, nShards: Int, seed: Long = 42L): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    pmod(xxhash64(keyCol, lit(seed)), lit(nShards.toLong)).cast("int")
  }

  /** Deterministic named split (train/val/test): the unit interval is
    * cut at the cumulative weights, and a row's split is the segment
    * its hash coordinate falls in. Same-key rows split together;
    * partitioning/rerun/cluster-size invariant; REBALANCING-SAFE in the
    * prefix sense — growing an early split's weight only ever steals
    * rows from later splits, never reshuffles within. Weights must sum
    * to 1 (±1e-9); the last split also absorbs the boundary, so
    * assignment is total.
    */
  def splitColumn(keyCol: Column, splits: Seq[(String, Double)],
      seed: Long = 42L): Column = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.forall(_._2 >= 0.0), splits.toString)
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val c = coord(keyCol, seed)
    // when-chain in declared order against a RUNNING double sum — an
    // external re-derivation must reproduce the same literal additions
    // ((0.8 + 0.1), not 0.9) or boundary rows flip
    var cum = 0.0
    var out: Option[Column] = None
    splits.dropRight(1).foreach { case (name, w) =>
      cum += w
      val branch = c < cum
      out = Some(out.fold(when(branch, name))(_.when(branch, name)))
    }
    out.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
  }

  /** Exact equal-frequency bucketing for DISCRETE scores — the CCNet
    * head/middle/tail recipe (Wenzek et al. 2020 cut corpora into
    * perplexity terciles per language; here per `byCols` group, k
    * buckets, any integer-valued score). Histogram-based, so the corpus
    * is never sorted: one groupBy on (group, score) builds the per-group
    * value histogram, a cumulative window runs over THAT histogram (its
    * size is distinct score values per group — bounded for discretized
    * scores, which is this recipe's shape; do NOT feed raw doubles), and
    * the bucket map broadcasts back onto the corpus.
    *
    * `bucket(v) = (k * rows_below_v) div group_total ∈ [0, k)` — exact
    * integer arithmetic, rank cuts fall on value boundaries, so ties
    * always share a bucket and realized bucket sizes are equal up to tie
    * mass (a value holding more than 1/k of a group leaves later buckets
    * empty — that is the data speaking, not a bug). With distinct scores
    * and group size divisible by k, buckets are exactly equal.
    *
    * NULLs are data, not silent drops: a row with a NULL in the score
    * or any group column keeps its row and gets a NULL bucket (it is
    * excluded from the histogram, so the cuts are over the scored
    * population) — filter or audit them downstream.
    */
  def quantileBuckets(df: DataFrame, scoreCol: String, byCols: Seq[String],
      k: Int, out: String = "bucket"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(!df.columns.contains(out), s"output column exists: $out")
    require(!df.columns.exists(Set("_n", "_below", "_total")),
      "quantileBuckets reserves the _n/_below/_total column names")
    import org.apache.spark.sql.expressions.Window
    val gb = byCols.map(col)
    val nonNull = (byCols :+ scoreCol).map(col(_).isNotNull)
      .reduce(_ && _)
    val hist = df.where(nonNull).groupBy(gb :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("_n"))
    val wCum = Window.partitionBy(gb: _*).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(gb: _*)
    val buckets = hist
      .withColumn("_below", coalesce(sum(col("_n")).over(wCum), lit(0L)))
      .withColumn("_total", sum(col("_n")).over(wTot))
      .withColumn(out,
        expr(s"CAST((_below * ${k}L) DIV _total AS INT)"))
      .select(gb :+ col(scoreCol) :+ col(out): _*)
    df.join(broadcast(buckets), byCols :+ scoreCol, "left")
  }

  /** Exact per-key top-k cap — the Gopher/FineWeb "at most k documents
    * per host" rule: within each `keyCols` group, keep the first k rows
    * under `order` and drop the rest. `order` MUST be a total order
    * within every key (tie-break by a unique id) or the kept set is
    * nondeterministic across runs — the same contract as
    * [[deterministicShuffle]].
    *
    * SKEW: a plain row_number window sorts each key in ONE task — a
    * mega-host with 10^8 rows is a straggler or an OOM. `saltOn` (a
    * unique row expression, e.g. the id column) enables the exact
    * two-phase form: phase 1 windows over (key, hash(salt) mod
    * `nSalts`) — groups 1/nSalts the size — and keeps k per salted
    * group; phase 2 re-windows the ≤ nSalts·k survivors per key. The
    * global per-key top-k is contained in the union of per-salt top-ks,
    * so the result is IDENTICAL to the unsalted form (SamplingSpec pins
    * equality), for one extra shuffle of the pre-capped survivors.
    */
  /** Source mixing (the Pile / GPT-3 recipe): given mixture weights over
    * sources and a total token budget, each source should contribute
    * ~`tokenBudget * weight` tokens — so each of its documents is kept
    * `rate = budget*weight / sourceTokens` times. `rate < 1` is
    * downsampling; `rate > 1` is deterministic UPSAMPLING (the Pile
    * trains small high-quality sources for >1 epoch): every document
    * gets `floor(rate)` whole copies and one more iff its hash
    * coordinate falls under the fractional part — so the realized token
    * count concentrates on the target, reruns are bit-stable, and
    * growing the budget only ever ADDS copies (monotone, like
    * [[deterministicSample]]). `maxRate` caps upsampling (unbounded
    * epochs over a tiny source is a quality bug, not a mixture).
    *
    * Sources absent from `weights` get weight 0 → 0 copies (kept in the
    * output with copies=0: drops are data, filter or audit them).
    *
    * Returns the input plus a `copies` column. Feed [[explodeCopies]]
    * to materialize one row per (document, epoch).
    *
    * SCALE: the per-source totals frame is |sources| rows — broadcast
    * back; the corpus is touched by exactly one aggregate scan and one
    * map-side join. Nothing driver-side.
    */
  def mixtureCopies(df: DataFrame, keyCol: String, sourceCol: String,
      tokensCol: Column, weights: Map[String, Double], tokenBudget: Long,
      maxRate: Double = 8.0, seed: Long = 42L): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    require(maxRate > 0.0, s"maxRate must be positive: $maxRate")
    require(weights.values.forall(w => w >= 0.0), weights.toString)
    require(!df.columns.exists(Set("copies", "_t", "_rate")),
      "mixtureCopies reserves the copies/_t/_rate column names")
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(tokensCol.cast("long")).as("_t"))
    val weightCol = weights.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col(sourceCol) === k, lit(w)).otherwise(acc)
    }
    // fixed-order double arithmetic — (budget * w) / tokens — so an
    // external re-derivation (the DuckDB oracle) lands on the same bits
    val rate = least(
      (lit(tokenBudget.toDouble) * weightCol) / col("_t").cast("double"),
      lit(maxRate))
    df.join(broadcast(totals), Seq(sourceCol))
      .withColumn("_rate", rate)
      .withColumn("copies",
        floor(col("_rate")).cast("long") +
          when(coord(col(keyCol), seed) < col("_rate") - floor(col("_rate")),
            1L).otherwise(0L))
      .drop("_t", "_rate")
  }

  /** One row per (document, epoch 1..copies); rows with 0 copies drop.
    * `sequence()` is bounded by [[mixtureCopies]]'s `maxRate`, so the
    * expansion is at most maxRate× the kept corpus.
    */
  def explodeCopies(df: DataFrame, copiesCol: String = "copies"): DataFrame = {
    require(!df.columns.contains("epoch"),
      "explodeCopies reserves the epoch column name")
    df.where(col(copiesCol) > 0L)
      .withColumn("epoch", explode(sequence(lit(1L), col(copiesCol))))
  }

  def capPerKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column],
      k: Int, saltOn: Option[Column] = None, nSalts: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(nSalts >= 2, s"nSalts must be >= 2: $nSalts")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(!df.columns.contains("_rn") && !df.columns.contains("_salt"),
      "capPerKey reserves the _rn and _salt column names")
    import org.apache.spark.sql.expressions.Window
    def cap(d: DataFrame, parts: Seq[Column]): DataFrame = d
      .withColumn("_rn",
        row_number().over(Window.partitionBy(parts: _*).orderBy(order: _*)))
      .where(col("_rn") <= k).drop("_rn")
    val keys = keyCols.map(col)
    saltOn match {
      case None => cap(df, keys)
      case Some(salt) =>
        val phase1 = cap(
          df.withColumn("_salt", shardColumn(salt, nSalts, seed)),
          keys :+ col("_salt")).drop("_salt")
        cap(phase1, keys)
    }
  }
}
