package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Sub-document dedup scaling probe (dev tool) for the round-6 rewrite
  * and contamination operators, at corpus ×1 vs ×10 on the same host:
  *
  *  - [[Dedup.commonLineRemoval]]: the duplicated-line set is bounded by
  *    the number of DISTINCT repeated lines (the planted pools here), so
  *    10× the docs should cost ~linear wall — the wide work is
  *    (id, line-hash) pairs and the per-doc reassembly, never a pair
  *    explosion in the hot pool lines.
  *  - [[Dedup.removeRepeatedSpans]]: the position expansion and the
  *    rebuild are proportional to the DUPLICATED text — ×10 docs
  *    carrying ×10+ the deleted token mass should cost ~linear wall,
  *    and clean docs never enter the rebuild shuffle.
  *  - [[Dedup.ngramContamination]]: eval side FIXED while train grows
  *    10× — the eval window set (broadcast build side) is constant, so
  *    added train docs pay only their own linear window scan.
  *
  * Prints best-of-N wall + result cardinalities per level for BENCH.md.
  */
object SubdocProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()

    // the q_line_dedup construction, wider pools so the duplicated-line
    // set has realistic cardinality (40 boilerplate lines) while each
    // still repeats across ~n/40 docs
    def framed(d: DataFrame): DataFrame = d.select(col("doc_id"),
      concat_ws("\n",
        concat(lit("nav variant "), pmod(col("doc_id"), lit(20))),
        col("text"),
        lit(""),
        concat(lit("footer variant "), pmod(col("doc_id"), lit(20))),
        concat(lit("doc "), col("doc_id"))).as("text"))

    def level(tag: String, d: DataFrame)(run: DataFrame => Long): Unit = {
      val n = d.count()
      // one DISCARDED warmup rep: ×1 always ran before ×10, so JIT/codegen
      // cache warmup landed entirely on the ×1 leg and produced
      // "×10 faster than ×1" readings best-of-N can't fix (ADVICE r6)
      run(d)
      var best = Double.MaxValue
      var out = -1L
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        out = run(d)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[probe] $tag%-16s docs=$n%6d wall=$best%6.2fs out=$out")
    }

    def lineRun(d: DataFrame): Long =
      Dedup.commonLineRemoval(framed(d), "doc_id", "text", minDocs = 5)
        .agg(sum("n_removed")).head.getLong(0)
    level("lines_x1", docs.where(col("doc_id") < 500))(lineRun)
    level("lines_x10", docs)(lineRun)

    // span removal: the expansion step is proportional to deleted text
    // (the near-dup pairs), so x10 docs with x10 dup mass should cost
    // ~linear wall
    def spanRun(d: DataFrame): Long =
      Dedup.removeRepeatedSpans(d, "doc_id", "text", k = 8, minDocs = 2)
        .agg(sum("tokens_removed")).head.getLong(0)
    level("spanrm_x1", docs.where(col("doc_id") < 500))(spanRun)
    level("spanrm_x10", docs)(spanRun)

    // eval fixed across levels (every ~170th doc), train grows 10x.
    // Train EXCLUDES eval (ngramContamination's disjointness
    // precondition — an eval doc left in train shares all its own
    // windows and counts as contaminated by construction)
    val eval = docs.where(col("doc_id") % 170 === 0)
    val trainAll = docs.where(col("doc_id") % 170 =!= 0)
    println(s"[probe] eval docs: ${eval.count()}")
    def ngramRun(train: DataFrame): Long =
      Dedup.ngramContamination(train, eval, "doc_id", "text", n = 13)
        .where(col("contaminated")).count()
    level("ngram_x1", trainAll.where(col("doc_id") < 500))(ngramRun)
    level("ngram_x10", trainAll)(ngramRun)
    spark.stop()
  }
}
