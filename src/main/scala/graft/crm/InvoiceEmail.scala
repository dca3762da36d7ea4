package graft.crm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringFunctions

/** S6 — the reference's invoice e-mail/PDF sink re-expressed as a batch
  * render job (`cerberus/models/invoice.py:161-209` send/send_email,
  * `:299-313` get_pdf, `templates/emails/invoice.txt`).
  *
  * The reference renders one invoice at a time inside a Django transition;
  * here the whole sendable set renders in one declarative pass — a
  * broadcast join to customers, one aggregation over charges for the
  * totals, and pure-`Column` string assembly (whole-stage codegen, no
  * UDFs). A mail/PDF gateway would consume the resulting frame via
  * `df.write` / `foreachBatch`; the render itself is the data job.
  *
  * Faithful semantics:
  *  - sendable = state ∈ {draft, unpaid} (draft→unpaid is the `send`
  *    transition; unpaid may `resend_email`, invoice.py:176-179) AND
  *    `can_send` (invoice.py:116-118): the customer exists and has zero
  *    issues (customer.py:130-140 — empty invoice_email, '&' in last
  *    name). The violation-side of this guard is
  *    [[CrmChecks.invoiceSendGuard]]; this is the happy path.
  *  - `send()` side effects mirrored as derived columns
  *    (invoice.py:161-170): due defaults to today + 1 week when unset;
  *    customer_name is snapshotted from the joined customer.
  *  - total = adjustment + Σ(line×quantity) over the invoice's charges
  *    (invoice.py:43-44 annotation; empty → 0 like the Python property's
  *    `sum([])`).
  *  - subject/from/reply-to verbatim from invoice.py:294-297 (including
  *    the reference's "Stretch there legs" typo); body is the
  *    emails/invoice.txt template with `send_notes` empty, canonicalized
  *    to \n line endings.
  *
  * PDF bytes are a STUBBED CODEC BOUNDARY (like multimodal decode): the
  * reference shells out to xhtml2pdf (`pisa.CreatePDF`), a renderer that
  * isn't a data-processing concern. The stub emits deterministic bytes
  * derived from the rendered body so the attachment plumbing (name, size,
  * content column) is real and testable end-to-end.
  */
object InvoiceEmail {

  val Subject = "Invoice %s - Stretch there legs" // typo verbatim, invoice.py:295
  val FromEmail = "Stretch there legs - Accounts<admin@stretchtheirlegs.co.uk>"
  val ReplyTo = "Stef <stef@stretchtheirlegs.co.uk>"

  /** emails/invoice.txt with send_notes empty, \n-canonical. */
  private def bodyCol(customerName: Column, invName: Column,
      total: Column, due: Column): Column =
    concat(
      lit("Hi "), customerName, lit(",\n\n"),
      lit("Please find attached your latest invoice "), invName, lit(".\n"),
      lit("Payment of "), total.cast("string"),
      lit(" is due "), due.cast("string"), lit(".\n\n"),
      lit("Kind regards,\nStef Dua\n\nOwner\nStretch Their Legs\n\n"),
      lit("07712 613 763\nstef@stretchtheirlegs.co.uk\nwww.stretchtheirlegs.co.uk"))

  /** One row per sendable invoice: the fully-assembled e-mail with its
    * (stubbed) PDF attachment. Customers is dimension-sized → broadcast;
    * the charges aggregation is the only shuffle.
    */
  def renderEmails(invoices: DataFrame, charges: DataFrame,
      customers: DataFrame, todaySql: String): DataFrame = {
    val subtotals = CrmChecks.invoiceSubtotals(charges, as = "_subtotal")

    val sendable = invoices.alias("i")
      .where(col("state").isin("draft", "unpaid"))
      .join(broadcast(customers.select(col("id").as("_cust_id"),
        col("name").as("_cust_name"),
        col("invoice_email").as("_cust_email"),
        col("last_name").as("_cust_last"))),
        col("i.customer_id") === col("_cust_id"), "left")
      // can_send: customer present, zero issues (customer.py:130-140).
      // last_name is non-null in the reference ('' possible, NULL not);
      // a NULL here lifts to '' → no '&' → NO issue. The bare
      // !contains(NULL) would be NULL and silently drop the row from
      // BOTH the sendable set and every issue surface.
      .where(col("_cust_id").isNotNull &&
        col("_cust_email").isNotNull && col("_cust_email") =!= "" &&
        (col("_cust_last").isNull || !col("_cust_last").contains("&")))

    val withTotals = sendable
      .join(subtotals, col("i.id") === subtotals("invoice_id"), "left")
      .select(
        col("i.id").as("invoice_id"),
        StringFunctions.invoiceName(col("i.id")).as("name"),
        col("_cust_name").as("customer_name"), // send() snapshot
        col("_cust_email").as("_email"),
        // send() defaults a missing due to today + 1 week (invoice.py:167-168)
        coalesce(col("i.due"), date_add(expr(todaySql), 7)).as("due"),
        // adjustment is non-null in the reference (invoice.py:63
        // default=0.0); a NULL lifts to 0 — left raw it would NULL the
        // total and concat-propagate into a NULL email body
        (coalesce(col("_subtotal"), lit(0)) +
          coalesce(col("i.adjustment"), lit(0)))
          .cast("decimal(14,2)").as("total"))

    val body = bodyCol(col("customer_name"), col("name"),
      col("total"), col("due"))
    withTotals.select(
      col("invoice_id"), col("name"),
      format_string(Subject, col("name")).as("subject"),
      concat(col("customer_name"), lit(" <"), col("_email"), lit(">"))
        .as("sent_to"),
      lit(FromEmail).as("from_email"),
      lit(ReplyTo).as("reply_to"),
      body.as("body"),
      col("total"), col("due"),
      concat(col("name"), lit(".pdf")).as("pdf_name"),
      // STUB: deterministic placeholder for pisa.CreatePDF output — real
      // PDF encoding is a codec boundary, not data processing. Bytes are
      // a function of the rendered body, so attachment identity follows
      // render identity.
      encode(concat(lit("%PDF-STUB "), hex(xxhash64(body))), "UTF-8")
        .as("pdf_bytes"))
  }
}
