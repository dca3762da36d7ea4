package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a cleaned corpus and a training
  * run: concatenate documents (plus one end-of-document separator token
  * each) in a deterministic order and chop the stream into fixed-length
  * blocks of `blockLen` tokens, documents crossing block boundaries
  * (the GPT-2/3 chunking recipe — no padding waste; contrast with
  * first-fit bin packing, which is inherently sequential and pads).
  *
  * The whole computation is offsets, not text: each document only needs
  * to know where its token span starts, which is a per-shard prefix sum
  * of (n_tokens + 1) in the deterministic order. No document bytes move
  * until the training-shard writer consumes the map.
  *
  * Determinism contract (same as [[Sampling.deterministicShuffle]]):
  * order within a shard is (xxhash64(id, seed), id), so the block map
  * replays identically across partitioning, retries, cluster sizes and
  * reruns. PRECONDITION: `idCol` unique.
  *
  * AT 10^12 ROWS: one hash-partition exchange on `shard` + a per-shard
  * sort — the sharded form of the deterministic global shuffle
  * (Sampling scaladoc). Shards are independent streams: pick `nShards`
  * so a shard's rows fit a sort spill comfortably (10^9 rows/shard is
  * fine — the sort key is 16 bytes + the offset payload); blocks are
  * numbered per shard, so the (shard, block) pair is the global block
  * id and no cross-shard coordination exists.
  */
object Packing {

  /** Block map for the packed-token stream: for every document, its
    * shard, token count, start offset in the shard's stream, and the
    * first/last block its tokens land in.
    *
    * Every document contributes `n_tokens + 1` stream positions (its
    * tokens, then one separator token — the EOS between documents, also
    * emitted after the last document). A document's own tokens span
    * `[offset, offset + n_tokens)`; blocks are `blockLen`-sized windows
    * of the stream. An EMPTY document (0 tokens, e.g. null text)
    * contributes only its separator; its first/last block is the block
    * its separator lands in.
    *
    * `tokensCol` must be non-negative; nulls read as 0 (empty doc).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      blockLen: Int, nShards: Int, seed: Long = 42L): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1: $blockLen")
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    val reserved = Set("shard", "n_tokens", "offset", "first_block",
      "last_block", "_h")
    require(!df.columns.exists(reserved),
      s"packSequences reserves ${reserved.mkString("/")}")
    val id = col(idCol)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_h"), id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", Sampling.shardColumn(id, nShards, seed))
      .withColumn("_h", xxhash64(id, lit(seed)))
      .withColumn("n_tokens",
        coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("offset",
        coalesce(sum(col("n_tokens") + 1L).over(w), lit(0L)))
      .withColumn("first_block", floor(col("offset") / blockLen))
      .withColumn("last_block",
        when(col("n_tokens") > 0,
          floor((col("offset") + col("n_tokens") - 1L) / blockLen))
          .otherwise(floor(col("offset") / blockLen)))
      .drop("_h")
  }

  /** Per-DOCUMENT sliding windows — the BERT/embedding-model chunking
    * recipe, the complement of cross-document packing: a long document
    * becomes overlapping fixed-length windows (`windowLen` tokens,
    * starts every `stride ≤ windowLen`), a short one becomes a single
    * window, an empty one contributes nothing. Window starts are
    * `0, stride, 2·stride, …` with
    * `n_windows = floor((max(n − windowLen, 0) + stride − 1) / stride) + 1`
    * — the last window always reaches the document's final token and is
    * the only one allowed to be short.
    *
    * One row per (document, window) with `win` (0-based), `tok_start`,
    * `tok_len`. Pure per-row arithmetic + a bounded explode
    * (≤ n_tokens/stride + 1 rows per doc): no shuffle at all — chunking
    * composes with whatever partitioning the caller already has. To
    * materialize a window's text:
    * `array_join(slice(TextFunctions.tokens(text), tok_start + 1,
    * tok_len), " ")` — the map stays offsets until the embed/write step
    * consumes it, same as [[packSequences]].
    */
  def docWindows(df: DataFrame, idCol: String, tokensCol: Column,
      windowLen: Int, stride: Int): DataFrame = {
    require(windowLen >= 1, s"windowLen must be >= 1: $windowLen")
    require(stride >= 1 && stride <= windowLen,
      s"stride must be in [1, windowLen]: $stride vs $windowLen")
    require(!df.columns.exists(Set("win", "tok_start", "tok_len", "_n")),
      "docWindows reserves the win/tok_start/tok_len/_n column names")
    df.withColumn("_n", coalesce(tokensCol.cast("long"), lit(0L)))
      .where(col("_n") > 0L)
      .withColumn("win", explode(sequence(lit(0L),
        expr(s"(greatest(_n - ${windowLen}L, 0L) + ${stride - 1}L)" +
          s" DIV ${stride}L"))))
      .withColumn("tok_start", col("win") * stride)
      .withColumn("tok_len",
        least(lit(windowLen.toLong), col("_n") - col("tok_start")))
      .drop("_n")
  }

  /** Materialize the packed blocks themselves: one row per
    * (shard, block) carrying the block's token sequence in stream order
    * — each document's whitespace tokens followed by one `eos`
    * separator, exactly the stream [[packSequences]]'s offsets index
    * into. `packed` must still carry the text column. The final block
    * of a shard may be short (the stream ends mid-block); every other
    * block holds exactly `blockLen` tokens.
    *
    * This is the only packing-family member that moves text: one
    * explode per token (tokenizer-pass cost class), one hash exchange
    * on (shard, block), and a per-block sort of ≤ blockLen elements.
    * Run it as the final writer stage, after every doc-level gate.
    *
    * PRECONDITION (ADVICE r7): `packed`'s offsets must have been
    * computed from WHITESPACE token counts
    * (`TextFunctions.tokenCount`) — this stage re-tokenizes `textCol`
    * with [[TextFunctions.tokens]] and trusts the offsets as stream
    * positions, so offsets derived from any other tokenization (e.g.
    * `bpeishTokenCount`) silently overlap/gap the stream. A per-row
    * `size(tokens(text)) == n_tokens` assert would put an extra token
    * pass on the writer's hot path to guard a misuse no caller here
    * performs; the contract is stated instead.
    */
  def blockTokens(packed: DataFrame, textCol: String, blockLen: Int,
      eos: String = "<eos>"): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1: $blockLen")
    val toks = TextFunctions.tokens(col(textCol))
    packed
      .select(col("shard"), col("offset"),
        posexplode(concat(toks, array(lit(eos)))).as(Seq("_pos", "_tok")))
      .select(col("shard"), (col("offset") + col("_pos")).as("_spos"),
        col("_tok"))
      .withColumn("block", floor(col("_spos") / blockLen))
      .groupBy(col("shard"), col("block"))
      .agg(count(lit(1)).as("n_filled"),
        array_join(transform(
          array_sort(collect_list(struct(col("_spos"), col("_tok")))),
          x => x.getField("_tok")), " ").as("block_text"))
  }

  /** Materialization map for [[packSequences]] output: one row per
    * (document, block) with the doc-local token sub-range that block
    * takes — `tok_start` (0-based index into the doc's tokens) and
    * `tok_len`. A block writer groups these by (shard, block) and
    * concatenates slices in `offset` order; no step needs the whole
    * doc stream, so assembly parallelizes per block.
    *
    * An empty document emits one row with tok_len = 0 (its separator
    * placeholder). Expansion is bounded: a doc emits
    * `ceil(n_tokens / blockLen) + 1` rows at most — the same order as
    * the corpus itself.
    *
    * Block-diagonal attention masks fall out of this frame: a block's
    * document-boundary positions are
    * `greatest(0, offset - block*blockLen)` over its rows with
    * `tok_start = 0` (true document starts, not continuations).
    */
  def blockSlices(packed: DataFrame, blockLen: Int): DataFrame = {
    require(blockLen >= 1, s"blockLen must be >= 1: $blockLen")
    require(!packed.columns.exists(Set("block", "tok_start", "tok_len")),
      "blockSlices reserves the block/tok_start/tok_len column names")
    packed
      .withColumn("block",
        explode(sequence(col("first_block"), col("last_block"))))
      .withColumn("tok_start",
        greatest(lit(0L), col("block") * blockLen - col("offset")))
      .withColumn("tok_len",
        least(col("n_tokens"),
          (col("block") + 1L) * blockLen - col("offset"))
          - col("tok_start"))
  }
}
