package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.WetFiles

/** WET source/sink: byte-exact round trip under adversarial payloads
  * (content-length framing, not delimiter splitting), deterministic
  * writes, and loud failure on truncation.
  */
class WetFilesSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    ("https://a.example.com/1", "2024-01-01 10:00:00", "plain text doc"),
    // ADVERSARIAL: payload contains a line that LOOKS like a record start —
    // a delimiter-split parser would shear the record here
    ("https://a.example.com/2", "2024-01-02 11:30:00",
      "quoted spec:\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nnot a real record"),
    ("https://b.example.com/3", "2024-01-03 12:00:00", "unicode: üß … 汉字"),
    ("https://b.example.com/4", "2024-01-04 13:00:00", null.asInstanceOf[String]),
    ("https://c.example.com/5", "2024-01-05 14:00:00", "")
  ).toDF("url", "ts", "text")
    .select($"url", $"ts".cast("timestamp").as("warc_ts"), $"text")

  test("write → read round-trips exactly, including WARC-lookalike payloads") {
    val dir = Files.createTempDirectory("wet_rt").toString
    WetFiles.write(docs, dir, nFiles = 2)
    val back = WetFiles.read(spark, dir)
      .select($"url", $"warc_ts".cast("string").as("ts"), $"text")
      .as[(String, String, String)].collect()
      .map { case (u, t, x) => u -> ((t, x)) }.toMap
    val want = docs
      .select($"url", $"warc_ts".cast("string"), coalesce($"text", lit("")))
      .as[(String, String, String)].collect()
      .map { case (u, t, x) => u -> ((t, x)) }.toMap
    assert(back === want) // null renders as empty payload — WET has no null
  }

  test("writes are deterministic regardless of input partitioning") {
    def checksums(d: String): Map[String, Long] = {
      val dirFile = new java.io.File(d)
      dirFile.listFiles().filter(_.getName.endsWith(".warc.wet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        f.getName -> java.util.Arrays.hashCode(bytes).toLong
      }.toMap
    }
    val d1 = Files.createTempDirectory("wet_d1").toString
    val d2 = Files.createTempDirectory("wet_d2").toString
    WetFiles.write(docs.repartition(5), d1, nFiles = 2)
    WetFiles.write(docs.coalesce(1), d2, nFiles = 2)
    assert(checksums(d1) === checksums(d2))
  }

  test("real-crawl shape: warcinfo prologue frame-skipped, gzip inflated") {
    val warcinfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 24\r\n\r\n" +
      "software: graft-test 1.0\r\n\r\n").getBytes("UTF-8")
    val conv = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/1\r\nWARC-Date: 2024-06-01T12:30:00Z\r\n" +
      "Content-Length: 5\r\n\r\nhello\r\n\r\n").getBytes("UTF-8")
    val file = warcinfo ++ conv
    val recs = WetFiles.parse(file).toList
    assert(recs === List(("https://x/1", 1717245000L, "hello")))
    // the same bytes gzipped parse identically (the .warc.wet.gz shape)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(file); gz.close()
    assert(WetFiles.parse(bos.toByteArray).toList === recs)
  }

  test("url with CR/LF is rejected at write (WARC header injection)") {
    // a crawled URL containing \r\n could smuggle an injected
    // Content-Length header line that mis-frames every subsequent record
    // on read — the writer must reject it loudly, never render it
    val dir = Files.createTempDirectory("wet_inj").toString
    val evil = Seq(
      ("https://a.example.com/ok", "2024-01-01 10:00:00", "fine"),
      ("https://evil.example.com/x\r\nContent-Length: 0",
        "2024-01-02 11:00:00", "payload")
    ).toDF("url", "ts", "text")
      .select($"url", $"ts".cast("timestamp").as("warc_ts"), $"text")
    val e = intercept[Exception] { WetFiles.write(evil, dir, nFiles = 1) }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("control characters")), chain.mkString(" | "))
  }

  test("truncated payload fails loudly, never returns sheared records") {
    val rec = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: https://x/1\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n" +
      "Content-Length: 9999\r\n\r\nshort").getBytes("UTF-8")
    val e = intercept[IllegalArgumentException] {
      WetFiles.parse(rec).toList
    }
    assert(e.getMessage.contains("truncated"))
  }
}
