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

  test("video frame sampling emits one frame per interval") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val check = media.where($"kind" === "video")
      .select($"id", (floor(($"meta.duration_ms" - 1) / 1000L) + 1).as("want"))
      .join(frames.groupBy("id").agg(count(lit(1)).as("got")), Seq("id"))
      .where($"want" =!= $"got")
    assert(check.isEmpty, check.collect().take(3).mkString(","))
  }
}
