package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training corpus statistics: exact global unigram counts,
  * top-k vocabulary selection, and adjacent-pair counts (the statistic a
  * BPE merge iteration maximizes — Sennrich et al. 2016, applied here at
  * the whitespace-word level; a real subword trainer runs the same
  * count-shape over its own symbol sequences).
  *
  * Shapes, not samples: every count is exact. The scale story is the
  * classic word-count one — explode is linear in corpus tokens, the
  * groupBy partial-aggregates map-side so only (distinct token, count)
  * rows cross the wire, and top-k plans as TakeOrderedAndProject (each
  * task keeps its own k, the driver merges n_partitions × k rows — no
  * global sort exchange ever materializes the full vocabulary in order).
  */
object Vocab {

  /** Exact global unigram counts over whitespace tokens
    * ([[TextFunctions.tokens]] — null/blank docs contribute nothing).
    * One linear explode + one hash exchange on token; map-side partial
    * aggregation collapses each task to its distinct tokens before the
    * shuffle, so wire volume is vocabulary-, not corpus-, sized.
    */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))

  /** Adjacent-token-pair counts. Pairs are built inside the token array
    * (zip of the array with itself shifted by one) before the explode, so
    * the corpus is scanned once and no positional self-join exists — the
    * join-on-(doc, pos+1) formulation would shuffle every token twice.
    */
  def pairCounts(df: DataFrame, textCol: String): DataFrame = {
    val pairs = TextFunctions.adjacentPairs(TextFunctions.tokens(col(textCol)))
    df.select(explode(pairs).as("pair")).groupBy("pair")
      .agg(count(lit(1)).as("n"))
  }

  /** Top-k vocabulary by (count DESC, token ASC). The tie-break makes the
    * selected SET deterministic at the k boundary. k is driver-small by
    * contract (a vocabulary, not a table): the plan is
    * TakeOrderedAndProject — per-partition top-k, driver merge.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    unigramCounts(df, textCol).orderBy(col("n").desc, col("token")).limit(k)
  }

  /** Top-k adjacent pairs — one BPE merge step's candidate ranking. Same
    * contract and plan shape as [[topTokens]].
    */
  def topPairs(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    pairCounts(df, textCol).orderBy(col("n").desc, col("pair")).limit(k)
  }
}
