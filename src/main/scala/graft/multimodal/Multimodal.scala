package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, processed in batched
  * per-partition passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, feature
  * join-back) is real and tested; the actual byte decoding is STUBBED with
  * a deterministic fake (this container has no image/audio codecs — in
  * production the `decodeStub` body is replaced by the real decoder, the
  * surrounding dataflow is unchanged).
  */
object Multimodal {

  /** media(id, kind, bytes, meta{width,height,sample_rate,duration_ms}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)))

  final case class MediaRow(id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeature(id: Long, kind: String, ok: Boolean,
      featureDim: Int, feature: Array[Float])

  /** Derive a media table from the pages table: the html bytes stand in
    * for fetched media payloads (schema-faithful, content-stubbed).
    */
  def mediaFromPages(pages: DataFrame): DataFrame =
    pages.where(col("html").isNotNull).select(
      xxhash64(col("url")).as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("url"), lit(7)), lit(3)) + 1).cast("int")).as("kind"),
      col("html").as("bytes"),
      struct(
        (pmod(xxhash64(col("url"), lit(1)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col("url"), lit(2)), lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(xxhash64(col("url"), lit(3)), lit(60000)) + 1).as("duration_ms")
      ).as("meta"))

  /** Media table derived from the documents testdata with a SQL-derivable
    * identity (`id = doc_id`, `kind = doc_id mod 3`) instead of xxhash64 —
    * so the driver's DuckDB oracle can independently re-derive the
    * per-row (id, kind, ok, featureDim) output of [[extractFeatures]].
    * Null-text docs keep a NULL payload on purpose: they exercise the
    * decode-failure path (ok = false, featureDim = 0).
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (pmod(col("doc_id") * 7, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 13, lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id") * 17, lit(60000)) + 1).as("duration_ms")
      ).as("meta"))

  /** STUB decoder: deterministic fake feature vector derived from the byte
    * content (so tests are stable and byte-identity propagates to feature
    * identity). Replace the body with a real codec in production — the
    * signature (bytes in, fixed-dim float vector out) is the contract.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.empty[Float]
    var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    Array.tabulate(dim) { d =>
      val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      val m = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Batched per-partition feature extraction — the Scala analog of a
    * pandas_udf/mapInPandas pass: rows stream through the executor in
    * partition-sized batches, the decoder is called once per row, output
    * joins back by id. `repartition(n)` upstream controls batch sizing the
    * way `spark.sql.execution.arrow.maxRecordsPerBatch` would for Arrow.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.select(col("id"), col("kind"), col("bytes"),
        coalesce(col("meta.width"), lit(0)).as("width"),
        coalesce(col("meta.height"), lit(0)).as("height"))
      .as[MediaRow]
    typed.mapPartitions { it =>
      it.map { r =>
        val f = decodeStub(r.bytes, dim)
        MediaFeature(r.id, r.kind, f.nonEmpty, f.length, f)
      }
    }.toDF()
  }

  final case class ResizedMedia(id: Long, kind: String, ok: Boolean,
      width: Int, height: Int, bytes: Array[Byte])

  /** Resize plan + stub execution for image rows: the REAL part is the
    * target-geometry computation (aspect-preserving fit into
    * `maxSide`×`maxSide`, never upscale — pure integer arithmetic, checked
    * in tests) and the batched per-partition pass; the byte transform is
    * the stubbed codec boundary (here: truncate payload proportionally to
    * the area ratio so size relationships are testable), replaced by a
    * real image library in production with the same signature.
    */
  def resizeImages(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.where(col("kind") === "image").select(
        col("id"), col("kind"), col("bytes"),
        coalesce(col("meta.width"), lit(0)).as("width"),
        coalesce(col("meta.height"), lit(0)).as("height"))
      .as[MediaRow]
    typed.mapPartitions { it =>
      it.map { r =>
        val scale =
          if (r.width <= 0 || r.height <= 0) 0.0
          else math.min(1.0, maxSide.toDouble / math.max(r.width, r.height))
        if (scale == 0.0 || r.bytes == null)
          ResizedMedia(r.id, r.kind, ok = false, 0, 0, Array.empty[Byte])
        else {
          // never upscale; round half-up like typical image pipelines
          val w = math.max(1, math.round(r.width * scale).toInt)
          val h = math.max(1, math.round(r.height * scale).toInt)
          val keep = math.max(1,
            math.min(r.bytes.length, (r.bytes.length * scale * scale).toInt))
          ResizedMedia(r.id, r.kind, ok = true, w, h, r.bytes.take(keep))
        }
      }
    }.toDF()
  }

  /** Frame-sampling plan for video rows (pure expressions): sample one
    * frame every `everyMs` ms of duration — emits (id, frame_no, ts_ms)
    * rows, the unit a real decoder would be applied to. Videos with an
    * unknown or non-positive duration emit NO frames — greatest() skips
    * NULLs, so without the explicit guard a NULL duration_ms would
    * fabricate a frame at ts 0 for a video nothing can decode (the other
    * malformed-media paths quarantine via ok=false / zero output; this
    * one quarantines by emitting nothing).
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.where(col("kind") === "video" &&
        col("meta.duration_ms").isNotNull && col("meta.duration_ms") > 0)
      .select(col("id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1,
          lit(everyMs))).as("ts_ms"))
      .withColumn("frame_no", (col("ts_ms") / everyMs).cast("long"))
}
