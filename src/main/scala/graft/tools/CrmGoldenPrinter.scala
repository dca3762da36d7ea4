package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates `SparkEntry.CrmReplayGolden` from the live engine output.
  *
  * The golden is a checked-in VALUES literal that duplicates engine
  * violation MESSAGE strings — any message change in CrmChecks/RuleCompiler
  * must be mirrored there or the driver's correctness row goes red while
  * ScalaTest stays green. Instead of editing by hand:
  *
  *   sbt -batch "runMain graft.tools.CrmGoldenPrinter"
  *
  * and paste the printed literal over `CrmReplayGolden` in SparkEntry.scala.
  * The 0x1f unit separator inside composite uniqueness keys prints as the
  * `<US>` placeholder the literal's `.replace` re-substitutes (a raw 0x1f
  * in Scala source gets mangled by editors/tools). Each printed row must
  * still be justified against CrmReplaySpec's expected map — this tool
  * formats, it does not decide correctness.
  */
object CrmGoldenPrinter {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.queries("q_crm_replay")(spark, "").collect()
    def lit(s: String): String =
      "'" + s.replace("'", "''").replace((0x1f).toChar.toString, "<US>") + "'"
    val body = rows.map { r =>
      "         (" + (0 until 6).map(i => lit(r.getString(i))).mkString(", ") + ")"
    }.mkString(",\n")
    println("SELECT * FROM (VALUES\n" + body +
      ")\n         AS t(key, part, rule_id, path, message, severity)")
    spark.stop()
  }
}
