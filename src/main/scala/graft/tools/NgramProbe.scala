package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for VERDICT r3 item 6: per-row cost of the repetition-signal
  * n-gram pass at corpus scale, HOF implementation vs tight-loop port.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{TextFunctions => TF}

    // ~120-token docs with planted repetition, deterministic
    val corpus = spark.range(nRows).select(col("id"),
      concat_ws(" ",
        (0 until 40).map(i => concat(lit(s"tok$i"), pmod(col("id") + i, lit(97)))) ++
        (0 until 40).map(i => concat(lit(s"tok$i"), pmod(col("id") + i, lit(97)))) ++
        (0 until 40).map(i => concat(lit(s"w$i"), pmod(col("id") * 31 + i, lit(89)))): _*)
        .as("text"))
      .localCheckpoint(true) // materialize so the probe times ONLY the pass

    // r4 measurements on this host (200k rows x ~120 tokens, local[32]):
    //   HOF formulation:   212-285 s  (~1.1-1.4 ms/row) — interpreted HOFs
    //   tight-loop expr:   0.35-0.40 s warm (~2 us/row) — the shipped path
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      val s1 = corpus.select(avg(TF.duplicateNgramFraction(col("text"), 3))).first().getDouble(0)
      val tFast = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val s2 = corpus.select(avg(TF.duplicateLineFraction(col("text")))).first().getDouble(0)
      val tLine = (System.nanoTime() - t0) / 1e9
      println(f"[ngram] rep$rep rows=$nRows exprNgram=$tFast%.2fs (${tFast * 1e6 / nRows}%.2f us/row, avg=$s1%.4f) lineFrac=$tLine%.2fs")
      if (sys.env.contains("SPARK_GRAFT_PROBE_HOF")) {
        t0 = System.nanoTime()
        val s3 = corpus.select(avg(TF.duplicateNgramFractionHof(col("text"), 3))).first().getDouble(0)
        val tHof = (System.nanoTime() - t0) / 1e9
        println(f"[ngram] rep$rep hofNgram=$tHof%.2fs (${tHof * 1e6 / nRows}%.1f us/row, avg=$s3%.4f)")
      }
    }
    spark.stop()
  }
}
