package graft.text

import org.apache.spark.sql.{types, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end train-set preparation — the composition every training run
  * executes AFTER corpus cleaning ([[CorpusPipeline]] ends where this
  * begins): deterministic split → mixture weights → epoch explosion →
  * sequence packing, with a per-stage survivor report.
  *
  * Composition is where these operators disagree if the contracts are
  * loose, so they are pinned here: the mixture rates are computed over
  * the TRAIN SPLIT's token totals (not the whole corpus — val/test mass
  * must not dilute a source's rate); each upsampled epoch copy gets its
  * own position in the packed stream via a composite `epoch_key`
  * (`id·16 + epoch`), so a 3-epoch source is spread through the stream
  * instead of packed back-to-back; and token counts are computed ONCE
  * and carried as a column through mixing into packing.
  *
  * The epoch key packs the epoch into the low 4 bits: `maxRate` must
  * stay ≤ 14 (epochs ≤ 15) and ids below 2^59 — both loose bounds for
  * real corpora (maxRate > ~10 epochs is a data-quality smell long
  * before it is a key-width problem).
  *
  * SCALE: split and epoch keys are per-row expressions; mixing is one
  * aggregate + broadcast join ([[Sampling.mixtureCopies]]); packing is
  * one hash exchange + per-shard sort ([[Packing.packSequences]]). The
  * report adds one count-aggregate per stage over frames the main path
  * already computes.
  */
object TrainPipeline {

  /** Returns (packed block map — one row per (doc, epoch) with
    * shard/n_tokens/offset/first_block/last_block — and the stage
    * report (ord, stage, docs)).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, splits: Seq[(String, Double)], trainSplit: String,
      weights: Map[String, Double], tokenBudget: Long, maxRate: Double = 8.0,
      blockLen: Int = 1024, nShards: Int = 64,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    require(splits.exists(_._1 == trainSplit),
      s"trainSplit '$trainSplit' not among splits: $splits")
    require(maxRate <= 14.0,
      s"epoch_key packs the epoch into id*16 — maxRate must be <= 14: $maxRate")
    val reserved = Set("split", "copies", "epoch", "epoch_key", "_toks")
    require(!docs.columns.exists(reserved),
      s"TrainPipeline reserves ${reserved.mkString("/")}")
    val idType = docs.schema(idCol).dataType
    require(Seq(types.ByteType, types.ShortType, types.IntegerType,
        types.LongType).contains(idType),
      s"epoch_key = id*16 + epoch needs an integral id column; " +
        s"'$idCol' is $idType (ids must also stay below 2^59)")

    val withSplit = docs.withColumn("split",
      Sampling.splitColumn(col(idCol), splits, seed))
    val train = withSplit.where(col("split") === trainSplit).drop("split")
    val toks = train.withColumn("_toks",
      TextFunctions.tokenCount(col(textCol)).cast("long"))
    val mixed = Sampling.mixtureCopies(toks, idCol, sourceCol,
      col("_toks"), weights, tokenBudget, maxRate, seed)
    val epochs = Sampling.explodeCopies(mixed)
      .withColumn("epoch_key", col(idCol) * 16L + col("epoch"))
    val packed = Packing.packSequences(
      epochs.select(col(idCol), col(sourceCol), col("epoch"),
        col("epoch_key"), col("_toks")),
      "epoch_key", col("_toks"), blockLen, nShards, seed)
      .drop("_toks")

    def stage(ord: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("docs"))
        .select(lit(ord).as("ord"), lit(name).as("stage"), col("docs"))
    val report = Seq(
      "input" -> docs, "train_split" -> train,
      "mixed" -> mixed.where(col("copies") > 0L), "epochs" -> epochs)
      .zipWithIndex
      .map { case ((name, df), ord) => stage(ord, name, df) }
      .reduce(_.unionByName(_))

    (packed, report)
  }
}
