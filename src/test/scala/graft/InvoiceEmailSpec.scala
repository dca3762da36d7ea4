package graft

import org.apache.spark.sql.functions._

import graft.crm.InvoiceEmail
import graft.fixtures.CrmFixtures

/** S6: the invoice e-mail/PDF render job over the CRM fixture, pinned to
  * the reference's send semantics (invoice.py:116-118 can_send,
  * :161-209 send/send_email, templates/emails/invoice.txt).
  */
class InvoiceEmailSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = CrmFixtures.build(spark)
  private def render() = InvoiceEmail.renderEmails(
    t.invoices, t.charges, t.customers, CrmFixtures.FrozenTodaySql)

  test("sendable set = draft/unpaid with an issue-free existing customer") {
    // excluded: 3,4 paid; 5 bogus state; 6 missing customer (can_send
    // false); 4's customer also has both issues
    val ids = render().select($"invoice_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 7L))
  }

  test("NULL last_name / NULL adjustment render, never silently drop or NULL the body") {
    // reference fields are non-null ('' / 0.0 defaults); NULLs in the
    // nullable Spark columns lift to those defaults. Before the fix,
    // !contains(NULL,'&') three-valued-dropped the row from the sendable
    // set AND every issue surface, and a NULL adjustment concat-propagated
    // into a NULL email body.
    val cust = Seq((50L, "Nu", null.asInstanceOf[String], "Nu", "nu@x.com",
      true, None: Option[Long]))
      .toDF("id", "first_name", "last_name", "name", "invoice_email",
        "active", "vet_id")
    val inv = Seq((90L, 50L, "draft", null.asInstanceOf[String],
      null.asInstanceOf[java.sql.Date]))
      .toDF("id", "customer_id", "state", "details", "due")
      .withColumn("adjustment", lit(null).cast("decimal(14,2)"))
      .withColumn("customer_name", lit("Nu"))
      .withColumn("invoice_address", lit(""))
    val chg = Seq((900L, Some(90L), "unpaid", BigDecimal("12.00"), 2))
      .toDF("id", "invoice_id", "state", "line", "quantity")
      .withColumn("parent_charge_id", lit(null).cast("long"))
    val r = InvoiceEmail.renderEmails(inv, chg, cust,
      CrmFixtures.FrozenTodaySql)
      .select($"invoice_id", $"total".cast("string"), $"body")
      .as[(Long, String, String)].collect()
    assert(r.length === 1)
    assert(r.head._2 === "24.00")          // NULL adjustment lifted to 0
    assert(r.head._3 != null && r.head._3.contains("Payment of 24.00"))
  }

  test("totals, due-defaulting and addressing match send() semantics") {
    val rows = render()
      .select($"invoice_id", $"total".cast("string"), $"due".cast("string"),
        $"subject", $"sent_to")
      .as[(Long, String, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // invoice 1: charges 5.00×1 (void Ghost still counts — the reference
    // annotation sums ALL charges) + 15.00×2 = 35.00
    assert(rows(1L)._2 === "35.00")
    assert(rows(1L)._3 === "2017-05-20")
    // invoice 2: no charges → sum([]) = 0
    assert(rows(2L)._2 === "0.00")
    // invoice 7: draft with no due → send() defaults today + 1 week
    assert(rows(7L)._3 === "2017-05-28")
    assert(rows(1L)._4 === "Invoice INV-001 - Stretch there legs")
    assert(rows(1L)._5 === "Bob Smith <bob@x.com>")
  }

  test("body is the emails/invoice.txt render, \\n-canonical") {
    val body = render().where($"invoice_id" === 1L)
      .select($"body").as[String].head()
    assert(body ===
      """Hi Bob Smith,
        |
        |Please find attached your latest invoice INV-001.
        |Payment of 35.00 is due 2017-05-20.
        |
        |Kind regards,
        |Stef Dua
        |
        |Owner
        |Stretch Their Legs
        |
        |07712 613 763
        |stef@stretchtheirlegs.co.uk
        |www.stretchtheirlegs.co.uk""".stripMargin)
  }

  test("pdf attachment stub: named after the invoice, deterministic bytes") {
    val a = render().select($"invoice_id", $"pdf_name", $"pdf_bytes")
      .as[(Long, String, Array[Byte])].collect().map(r => r._1 -> r).toMap
    assert(a(1L)._2 === "INV-001.pdf")
    assert(new String(a(1L)._3, "UTF-8").startsWith("%PDF-STUB "))
    // render identity → attachment identity (two runs, same bytes)
    val b = render().select($"invoice_id", $"pdf_bytes")
      .as[(Long, Array[Byte])].collect().toMap
    assert(a.keys.forall(k => java.util.Arrays.equals(a(k)._3, b(k))))
    // distinct invoices → distinct attachments
    assert(a.values.map(v => new String(v._3, "UTF-8")).toSet.size === a.size)
  }
}
