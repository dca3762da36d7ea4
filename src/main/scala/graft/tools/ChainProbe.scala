package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Adversarial-chain scale observable for connected components (dev tool,
  * feeds BENCH.md): a PATH graph is the worst case the large-star/
  * small-star rewrite exists for — min-label propagation needs
  * O(diameter) = O(n) join rounds on it, Kiveris et al. bound the
  * alternating rounds O(log n). DedupSpec pins a 10^4-node path; this
  * probe measures the round count and wall at 10^5-10^6 nodes, where the
  * log-vs-linear difference is 4-5 orders of magnitude of shuffles.
  *
  * Ids are bit-reversal permuted so the chain is NOT laid out in id
  * order — the component minimum sits at a structurally arbitrary
  * position, like a real template-boilerplate family.
  *
  * Usage: ChainProbe [nNodes] [threads]
  */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // bit-reverse within the smallest power of two covering n — a
    // deterministic permutation, so edge (i, i+1) connects two ids far
    // apart in value
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val perm = udfFreeBitReverse(bits)
    val edges = spark.range(n - 1).toDF("i")
      .select(perm(col("i")).as("a_id"), perm(col("i") + 1).as("b_id"))

    val t0 = System.nanoTime()
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(edges, "a_id", "b_id",
        maxIters = 60)
    val comps = labels.select(countDistinct(col("comp"))).first().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[chain] n=$n rounds=$rounds components=$comps " +
      f"(expect 1) wall=$secs%.1fs  — propagation would need ~$n rounds")
    require(comps == 1, s"path graph must form ONE component, got $comps")
    spark.stop()
  }

  /** Bit-reversal as a pure Column expression (no UDF): reverse the low
    * `bits` bits of a non-negative long.
    */
  private def udfFreeBitReverse(bits: Int): org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column = { c =>
    (0 until bits).map { b =>
      // bit b of input → bit (bits-1-b) of output
      shiftleft(shiftright(c, b) % 2, bits - 1 - b)
    }.reduce(_ + _)
  }
}
