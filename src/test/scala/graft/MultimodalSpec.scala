package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.fixtures.PagesGen

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val pages = PagesGen.generate(spark, nRows = 500L, nDays = 2).pages
  private lazy val media = Multimodal.mediaFromPages(pages).cache()

  test("media table conforms to the declared schema") {
    val got = media.schema
    assert(got("id").dataType.typeName === "long")
    assert(got("bytes").dataType.typeName === "binary")
    assert(got("meta").dataType.typeName === "struct")
    assert(media.count() > 0)
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("batched feature extraction: fixed dim, deterministic, byte-identity → feature-identity") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    assert(f1.where($"ok" && $"featureDim" === 16).count() === media.count())
    val m1 = f1.select("id", "feature").as[(Long, Seq[Float])].collect().toMap
    val m2 = Multimodal.extractFeatures(media.repartition(9), dim = 16)
      .select("id", "feature").as[(Long, Seq[Float])].collect().toMap
    assert(m1 === m2)
    // identical bytes → identical features (pin one row by min id —
    // limit(1) would be order-nondeterministic)
    val orig = media.agg(min($"id")).as[Long].head()
    val dup = media.where($"id" === orig).withColumn("id", $"id" + 999999L)
    val fDup = Multimodal.extractFeatures(dup, dim = 16)
      .select("feature").as[Seq[Float]].head()
    assert(fDup === m1(orig))
  }

  test("resize: aspect-preserving fit, never upscales, deterministic") {
    val r = Multimodal.resizeImages(media, maxSide = 256)
    val rows = r.select("id", "ok", "width", "height")
      .as[(Long, Boolean, Int, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2))
    val origins = media.where($"kind" === "image")
      .select($"id", $"meta.width", $"meta.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    rows.foreach { case (id, _, w, h) =>
      val (ow, oh) = origins(id)
      assert(w <= 256 && h <= 256, s"$id not fitted: ${w}x$h")
      assert(w <= ow && h <= oh, s"$id upscaled: ${ow}x$oh -> ${w}x$h")
      // aspect preserved to rounding: long side hits 256 unless no downscale
      if (math.max(ow, oh) > 256)
        assert(math.max(w, h) === 256, s"$id long side ${math.max(w, h)}")
      else assert((w, h) === ((ow, oh)), s"$id resized needlessly")
      // aspect preserved to rounding: each side within 1px of ideal scale
      // (1px covers the clamp-to-1 case for extreme ratios)
      val scale = math.min(1.0, 256.0 / math.max(ow, oh))
      assert(math.abs(w - ow * scale) <= 1.0, s"$id w=$w ideal=${ow * scale}")
      assert(math.abs(h - oh * scale) <= 1.0, s"$id h=$h ideal=${oh * scale}")
    }
    // deterministic across partitioning
    val b1 = r.select("id", "width", "height").as[(Long, Int, Int)].collect().toSet
    val b2 = Multimodal.resizeImages(media.repartition(7), maxSide = 256)
      .select("id", "width", "height").as[(Long, Int, Int)].collect().toSet
    assert(b1 === b2)
  }

  test("video frame sampling emits one frame per interval") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    // LEFT join + null-safe inequality: an inner join would pass
    // vacuously if the sampler emitted no rows at all (every video must
    // appear with exactly its expected count, missing == got NULL == fail)
    val check = media.where($"kind" === "video")
      .select($"id", (floor(($"meta.duration_ms" - 1) / 1000L) + 1).as("want"))
      .join(frames.groupBy("id").agg(count(lit(1)).as("got")), Seq("id"), "left")
      .where(!($"want" <=> $"got"))
    assert(check.isEmpty, check.collect().take(3).mkString(","))
    assert(frames.count() > 0)
  }

  test("unknown/non-positive duration videos emit NO frames (no fabricated ts 0)") {
    // greatest() skips NULLs, so an unguarded plan would invent a frame at
    // ts 0 for a video nothing can decode
    val rows = Seq(
      (1L, "video", Some(2500L)), // 3 frames
      (2L, "video", None),        // unknown duration → nothing
      (3L, "video", Some(0L)),    // zero duration → nothing
      (4L, "image", Some(1000L))  // not a video → nothing
    ).toDF("id", "kind", "duration_ms")
      .select($"id", $"kind", struct($"duration_ms").as("meta"))
    val got = Multimodal.sampleFrames(rows, everyMs = 1000L)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L), got.toString)
  }
}
