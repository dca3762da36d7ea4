package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage wall attribution for the CorpusPipeline funnel: inject an
  * EAGER materializer that times each stage's checkpoint, so the
  * composed run's cost decomposes stage by stage (the lazy default
  * smears everything into whatever job touches it first).
  *
  * Usage: runMain graft.tools.FunnelProbe [base|full|spans]
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val variant = if (args.nonEmpty) args(0) else "full"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var i = 0
    val mat: DataFrame => DataFrame = { df =>
      val t0 = System.nanoTime()
      val r = df.localCheckpoint(true)
      i += 1
      System.err.println(
        f"[funnel] stage $i materialized in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 0 until 2) {
      System.err.println(s"[funnel] === $variant rep $rep ===")
      i = 0
      val t0 = System.nanoTime()
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
      val (kept, report) = variant match {
        case "full" =>
          val g = expr("doc_id div 2")
          val hostId = pmod(g, lit(20)).cast("string")
          val docs = docs0.withColumn("url",
            when(pmod(col("doc_id"), lit(2)) === 0,
              concat(lit("https://H"), hostId, lit(".EXAMPLE.com/doc/"),
                g.cast("string"), lit("?utm_campaign=c#sec")))
            .otherwise(
              concat(lit("HTTPS://h"), hostId, lit(".example.com:443/doc/"),
                g.cast("string"))))
          graft.text.CorpusPipeline.build(docs, "doc_id", "text", "lang",
            "source", canonicalizeUrlCol = Some("url"),
            maxDocsPerKey = Some(8), materialize = mat)
        case "spans" =>
          val boiler = array_join(
            transform(sequence(lit(1), lit(40)),
              j => concat(lit("boil"), j.cast("string"))), " ")
          val filler = array_join(
            transform(sequence(lit(1), lit(60)),
              j => concat(lit("u"), col("doc_id").cast("string"),
                lit("_"), j.cast("string"))), " ")
          val docs = docs0.withColumn("text",
            when(col("doc_id") % 7 === 0,
              concat(boiler, lit(" "), filler)).otherwise(col("text")))
          graft.text.CorpusPipeline.build(docs, "doc_id", "text", "lang",
            "source", maxRepeatedSpanFraction = Some(0.3), spanK = 8,
            materialize = mat)
        case _ =>
          graft.text.CorpusPipeline.build(docs0, "doc_id", "text", "lang",
            "source", materialize = mat)
      }
      val n = report.count() + kept.groupBy(col("shard")).count().count()
      System.err.println(
        f"[funnel] total ${(System.nanoTime() - t0) / 1e9}%.3f s (rows $n)")
    }
    spark.stop()
  }
}
