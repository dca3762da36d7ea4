package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: `SparkEntry.entry` must return
  * rows > 0 on sf0.001. Run: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(20, truncate = false)
    println(s"[smoke] entry rows=$n (must be > 0)")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
