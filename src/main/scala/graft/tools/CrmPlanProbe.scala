package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: physical-plan shape of the CRM read-models (CustomerLedger,
  * InvoiceEmail) — joins must be broadcast on the dimension side and the
  * only exchanges the aggregation shuffles. Run:
  * `sbt "runMain graft.tools.CrmPlanProbe"`.
  */
object CrmPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.fixtures.CrmFixtures.build(spark)
    def shapes(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"=== $name ===")
      println(df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.take(120)).mkString("\n"))
    }
    shapes("customerBalances", graft.crm.CustomerLedger.customerBalances(
      t.customers, t.invoices, t.charges,
      graft.fixtures.CrmFixtures.FrozenTodaySql))
    shapes("renderEmails", graft.crm.InvoiceEmail.renderEmails(
      t.invoices, t.charges, t.customers,
      graft.fixtures.CrmFixtures.FrozenTodaySql))
    spark.stop()
  }
}
