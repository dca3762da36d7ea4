package graft.crm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's default customer read-model
  * (`cerberus/models/customer.py:27-57` CustomerManager.get_queryset +
  * `:125-128` uninvoiced_count) — every customer list/detail view renders
  * these per-customer balances, so this is the CRM's single hottest read
  * shape.
  *
  * Faithful to the Django ORM's generated SQL, INCLUDING its join-fanout
  * artifact: the ORM left-joins customers→invoices→charges once and then
  * computes `Sum(invoices__adjustment)` over the *joined* rows, so an
  * invoice's adjustment is counted once per charge on it (not once per
  * invoice). That double-count is what the reference application actually
  * displays, so it is replicated here deliberately rather than "fixed";
  * the distinct invoice counts are immune (COUNT(DISTINCT id)).
  *
  * Scale shape: one hash aggregation keyed on customer_id after the two
  * FK joins (both shuffle on their natural keys — at warehouse scale
  * invoices/charges co-partition by customer), plus a second skinny
  * aggregation for uninvoiced charges joined back. No row ever carries
  * more than the few numeric columns projected here.
  */
object CustomerLedger {

  /** One row per customer: invoiced_unpaid, unpaid_count, overdue_count,
    * uninvoiced_count. `todaySql` freezes `datetime.today()` from the
    * overdue filter (engine frozen-clock discipline, F4).
    */
  def customerBalances(customers: DataFrame, invoices: DataFrame,
      charges: DataFrame, todaySql: String): DataFrame = {
    val inv = invoices.select(
      col("id").as("_inv_id"), col("customer_id").as("_inv_cust"),
      col("state").as("_inv_state"), col("due").as("_inv_due"),
      col("adjustment").as("_inv_adj"))
    val chg = charges.where(col("invoice_id").isNotNull).select(
      col("invoice_id").as("_chg_inv"),
      (col("line") * col("quantity")).as("_chg_amt"))

    val joined = customers.select(col("id").as("customer_id"), col("name"))
      .join(inv, col("customer_id") === col("_inv_cust"), "left")
      .join(chg, col("_inv_id") === col("_chg_inv"), "left")

    val unpaid = col("_inv_state") === "unpaid"
    val balances = joined
      .groupBy(col("customer_id"), col("name"))
      .agg(
        (coalesce(sum(col("_inv_adj")), lit(0)) +
          coalesce(sum(when(unpaid, col("_chg_amt"))), lit(0)))
          .cast("decimal(14,2)").as("invoiced_unpaid"),
        count_distinct(when(unpaid, col("_inv_id"))).as("unpaid_count"),
        count_distinct(when(
          CrmChecks.overdue(col("_inv_due"), col("_inv_state"), todaySql),
          col("_inv_id"))).as("overdue_count"))

    val uninvoiced = charges.where(col("invoice_id").isNull)
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("_uninv"))
    balances
      .join(uninvoiced, Seq("customer_id"), "left")
      .select(col("customer_id"), col("name"), col("invoiced_unpaid"),
        col("unpaid_count"), col("overdue_count"),
        coalesce(col("_uninv"), lit(0L)).as("uninvoiced_count"))
  }
}
