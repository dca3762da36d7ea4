package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET (WARC conversion-record) source/sink — the format Common-Crawl text
  * extracts actually arrive in, so a user can point the engine at a crawl
  * drop without a pre-conversion step.
  *
  * Reading is CONTENT-LENGTH FRAMED, exactly like the spec (ISO 28500):
  * each record is a header block (terminated by a blank line) whose
  * `Content-Length` gives the payload's BYTE length; the payload may
  * contain anything, including lines that look like record headers — a
  * delimiter-split parser corrupts on such payloads, a framed parser
  * cannot. Files parse independently (one WET file = one parse unit,
  * matching Common Crawl's ~1 GB segment grain), via `binaryFile` +
  * `mapPartitions` — the same justified codec-boundary shape as the
  * multimodal decode: the framing is inherently sequential WITHIN a file,
  * the parallelism is ACROSS files, and everything after the parse is
  * ordinary columnar Spark.
  *
  * The writer renders the same framing deterministically (records
  * hash-assigned to files by url, sorted within each file), so
  * write→read round-trips bit-exactly — which is what the driver oracle
  * checks against the source table (`q_wet_roundtrip`).
  */
object WetFiles {

  private val HeaderEnd = "\r\n\r\n".getBytes(UTF_8)

  /** Render one conversion record: WARC/1.0 headers + framed payload.
    *
    * The url is interpolated into a header LINE, so control characters in
    * it would be header injection: a crawled URL containing `\r\n` could
    * smuggle a second `Content-Length` field that silently mis-frames
    * every subsequent record on read (the parser takes the first matching
    * field). The WARC spec requires Target-URIs to be percent-encoded —
    * anything with raw CR/LF (or any other control char) is rejected
    * loudly here rather than written unreadably.
    */
  private def renderRecord(url: String, isoDate: String,
      text: String): Array[Byte] = {
    require(url != null && !url.exists(c => c < ' ' || c == 0x7f),
      s"WET write: url contains control characters (header injection): " +
        s"${if (url == null) "null" else url.take(120)}")
    val payload = (if (text == null) "" else text).getBytes(UTF_8)
    val header =
      s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: $isoDate\r\nContent-Length: ${payload.length}\r\n\r\n"
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(h.length + payload.length) = '\r'
    out(h.length + payload.length + 1) = '\n'
    out(h.length + payload.length + 2) = '\r'
    out(h.length + payload.length + 3) = '\n'
    out
  }

  /** Write `docs` (url, warc_ts, text) as `nFiles` WET files under `dir`.
    * Deterministic: records are hash-assigned to files by url and sorted
    * by (url, warc_ts, text) within each file — the full record, so even
    * duplicate urls (a re-crawl) serialize in one order and the same
    * table always produces the same bytes regardless of input
    * partitioning.
    *
    * WARC-Date carries SECOND precision (the WARC/1.0 mandate; the read
    * side's epoch-seconds model matches). Sub-second timestamps would
    * silently break the advertised bit-exact round trip, so they FAIL
    * LOUDLY unless `truncateSubSecond = true` opts into the loss.
    */
  def write(docs: DataFrame, dir: String, nFiles: Int,
      truncateSubSecond: Boolean = false): Unit = {
    val spark = docs.sparkSession
    // Hadoop Configuration is not serializable; Spark's wrapper ships it
    // to tasks so FS-scheme settings (s3a creds etc.) survive
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // clear stale part files first: a previous write with a larger nFiles
    // would otherwise leave files the read glob silently picks up
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dirFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (dirFs.exists(dirPath)) {
      dirFs.globStatus(new org.apache.hadoop.fs.Path(dir, "*.warc.wet*"))
        .foreach(st => dirFs.delete(st.getPath, false))
    }
    docs.select(col("url"), col("warc_ts"), col("text"))
      .repartition(nFiles, col("url"))
      .sortWithinPartitions(col("url"), col("warc_ts"), col("text"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val path = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.wet")
        // temp-write + rename: a speculative or retried task never
        // interleaves bytes into the live file
        val tmp = new org.apache.hadoop.fs.Path(
          f"$dir/.part-$pid%05d.$attempt%d.tmp")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(tmp, true)
        try it.foreach { r =>
          // loud on null warc_ts — a bare NPE from toInstant would fail
          // the task with no row context (url and text nulls are handled
          // explicitly; the timestamp must be too)
          require(!r.isNullAt(1),
            s"WET write: null warc_ts for url=${r.getString(0)}")
          // WARC-Date is an INSTANT: format from epoch in the JVM, never
          // through session-timezone string conversion
          val inst = r.getTimestamp(1).toInstant
          require(truncateSubSecond || inst.getNano == 0,
            s"WET write: sub-second warc_ts $inst for url=${r.getString(0)} " +
              "cannot round-trip through second-precision WARC-Date; pass " +
              "truncateSubSecond = true to accept the loss")
          val iso = java.time.format.DateTimeFormatter.ISO_INSTANT.format(
            inst.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))
          out.write(renderRecord(r.getString(0), iso,
            if (r.isNullAt(2)) null else r.getString(2)))
        } finally out.close()
        if (!fs.rename(tmp, path)) {
          fs.delete(tmp, false)
          if (!fs.exists(path))
            sys.error(s"WET write: rename failed for $path")
        }
      }
  }

  /** Parse one WET file's bytes into (url, epochSeconds, text) CONVERSION
    * records. Non-conversion records (the `warcinfo` prologue every real
    * Common-Crawl WET file starts with) are frame-skipped via their own
    * Content-Length, not errors. Gzipped input (the actual distribution
    * format, `.warc.wet.gz`) is detected by magic bytes and inflated
    * first.
    */
  private[graft] def parse(raw: Array[Byte])
      : Iterator[(String, Long, String)] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B) {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw))
        try in.readAllBytes() finally in.close()
      } else raw

    def indexOfHeaderEnd(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    val all = new Iterator[Option[(String, Long, String)]] {
      private var pos = 0
      private def skipSeparators(): Unit =
        while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1

      skipSeparators()
      override def hasNext: Boolean = pos < bytes.length
      override def next(): Option[(String, Long, String)] = {
        val he = indexOfHeaderEnd(pos)
        require(he >= 0, s"unterminated WARC header block at byte $pos")
        val header = new String(bytes, pos, he - pos, UTF_8)
        require(header.startsWith("WARC/1.0"),
          s"record at byte $pos does not start with WARC/1.0")
        def field(name: String): Option[String] =
          header.split("\r\n").collectFirst {
            case l if l.startsWith(name + ":") => l.drop(name.length + 1).trim
          }
        val len = field("Content-Length").map(_.toInt).getOrElse(
          sys.error(s"missing Content-Length at byte $pos"))
        val payloadStart = he + HeaderEnd.length
        require(payloadStart + len <= bytes.length,
          s"truncated payload at byte $payloadStart (want $len)")
        val isConversion =
          field("WARC-Type").contains("conversion") &&
            field("WARC-Target-URI").isDefined
        val rec =
          if (!isConversion) None // warcinfo/request/etc: frame-skip
          else {
            val url = field("WARC-Target-URI").get
            val epoch = field("WARC-Date")
              .map(d => java.time.Instant.parse(d).getEpochSecond)
              .getOrElse(0L)
            Some((url, epoch,
              new String(bytes, payloadStart, len, UTF_8)))
          }
        pos = payloadStart + len
        skipSeparators()
        rec
      }
    }
    all.flatten
  }

  /** Read a directory of WET files as (url, warc_ts, text). One task per
    * file (the framing is sequential within a file); everything downstream
    * is columnar.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wet*") // plain or .gz
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parse))
      .toDF("url", "epoch", "text")
      // timestamp from epoch seconds: session-timezone-independent (the
      // instant was parsed from the record's UTC WARC-Date in the JVM)
      .select(col("url"), timestamp_seconds(col("epoch")).as("warc_ts"),
        col("text"))
  }
}
