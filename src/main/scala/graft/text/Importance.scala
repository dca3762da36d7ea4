package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): documents are bags of
  * HASHED n-grams (unigrams + bigrams folded into `nBuckets` buckets);
  * the target corpus and the raw corpus each induce a multinomial over
  * buckets, and a raw document's importance weight is
  *
  *   log p_target(doc) − log p_raw(doc)
  *     = Σ_b cnt_b·(log θ_t[b] − log θ_r[b])
  *
  * with add-alpha smoothed θ. Selection keeps the top weights (compose
  * with [[Sampling.capPerKey]] / a threshold — selection is a filter,
  * not a new operator).
  *
  * The computation splits at the transcendental boundary exactly like
  * [[LangModel]]: the INTEGER core — per-doc hashed bucket counts and
  * their joins against the two corpus bucket tables — is graded
  * bit-for-bit by the DuckDB oracle (`q_dsir_features`, via the same
  * byte-exact string-XXH64 port as q_fingerprint); the log-space weight
  * is pinned in ImportanceSpec against a driver-side reference instead
  * of hash-graded (log bits are libm's business, not the engine's).
  *
  * SCALE: one explode linear in corpus grams; bucket counts
  * partial-aggregate map-side, so the shuffle carries (doc, distinct
  * bucket ≤ nBuckets) rows; both corpus bucket tables are
  * nBuckets-bounded → broadcast. Nothing is ever collected.
  */
object Importance {

  /** One row per (id, bucket, cnt): hashed unigram+bigram counts.
    * `bucket = pmod(xxhash64(gram), nBuckets)` — Spark's default seed,
    * so the oracle's string-hash port applies verbatim. Documents with
    * no tokens emit no rows (an empty bag has no features).
    */
  def hashedNgramCounts(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val toks = TextFunctions.tokens(col(textCol))
    val bigrams = TextFunctions.adjacentPairs(toks)
    df.select(col(idCol), explode(concat(toks, bigrams)).as("gram"))
      .select(col(idCol),
        pmod(xxhash64(col("gram")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Corpus bucket totals — the multinomial's sufficient statistic.
    * At most nBuckets rows regardless of corpus size.
    */
  def bucketTotals(features: DataFrame): DataFrame =
    features.groupBy("bucket").agg(sum("cnt").as("total"))

  /** Per-document log importance weight over precomputed features and
    * corpus bucket tables. Smoothing: θ_c[b] = (cnt_c[b] + α)/(C + αB),
    * so absent buckets cost log α, never −∞. The normalizers enter once
    * as `n_grams·(log(T+αB) − log(R+αB))` rather than per bucket —
    * same sum, one transcendental pair instead of |doc buckets|.
    *
    * Output: (idCol, n_grams, weight). The weight column is DOUBLE and
    * deliberately not oracle-graded — order/selection downstream is.
    * Reproducible up to fp-summation order (the per-doc aggregate adds
    * a handful of doubles in partition order); a selection that needs
    * bit-stable cuts should tie-break on the id, the same rule as every
    * ordered operator here.
    */
  def importanceWeights(rawFeatures: DataFrame, targetTotals: DataFrame,
      rawTotals: DataFrame, idCol: String, nBuckets: Int,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive: $alpha")
    require(!rawFeatures.columns.exists(Set("_t", "_r", "_tt", "_rt")),
      "importanceWeights reserves the _t/_r/_tt/_rt column names")
    // coalesce: an EMPTY corpus table must read as total 0 (the
    // smoothing then carries everything), not poison every weight NULL
    val tTot = targetTotals.agg(coalesce(sum(col("total")), lit(0L)).as("_tt"))
    val rTot = rawTotals.agg(coalesce(sum(col("total")), lit(0L)).as("_rt"))
    val aB = alpha * nBuckets
    rawFeatures
      .join(broadcast(targetTotals.withColumnRenamed("total", "_t")),
        Seq("bucket"), "left")
      .join(broadcast(rawTotals.withColumnRenamed("total", "_r")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .groupBy(col(idCol))
      .agg(
        sum(col("cnt")).as("n_grams"),
        sum(col("cnt") *
          (log(coalesce(col("_t"), lit(0L)) + alpha) -
            log(coalesce(col("_r"), lit(0L)) + alpha))).as("_dot"),
        max(col("_tt")).as("_tt"), max(col("_rt")).as("_rt"))
      .withColumn("weight",
        col("_dot") - col("n_grams") *
          (log(col("_tt") + aB) - log(col("_rt") + aB)))
      .select(col(idCol), col("n_grams"), col("weight"))
  }
}
