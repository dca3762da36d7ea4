package graft.crm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S8 repair jobs — the reference's conditional data-fix scans
  * re-expressed as set-oriented passes.
  */
object CrmRepairs {

  /** `fixcustomers` (`management/commands/fixcustomers.py:16-31`): a
    * customer with an EMPTY invoice_email whose contacts contain EXACTLY
    * ONE email-type entry (the F6 classifier — `set_as_invoice` refuses
    * non-email contacts, contact.py:63-68) gets that contact's address as
    * the repaired invoice_email. The reference loops customer-by-customer
    * with a Counter; here it is one classify + group-count + join pass.
    * Returns the repair plan (customer_id, name, new_invoice_email); a
    * MERGE/upsert applies it (same write shape as PagesTable.upsert).
    */
  def repairInvoiceEmails(customers: DataFrame,
      contacts: DataFrame): DataFrame = {
    val emailContacts = contacts
      .where(CrmCatalog.contactType(col("details")) === "email")
      .groupBy(col("customer_id"))
      .agg(count(lit(1)).as("_n_email"), max(col("details")).as("_email"))
      .where(col("_n_email") === 1)
    customers
      .where(col("invoice_email") === "")
      .join(emailContacts, col("id") === emailContacts("customer_id"))
      .select(col("id").as("customer_id"), col("name"),
        col("_email").as("new_invoice_email"))
  }
}
