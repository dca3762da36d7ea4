package graft

import graft.crm.CustomerLedger
import graft.fixtures.CrmFixtures

/** The default customer read-model (customer.py:27-57,125-128) over the
  * CRM fixture, with the Django join-fanout semantics pinned explicitly.
  */
class CustomerLedgerSpec extends SparkSuite {
  import spark.implicits._

  test("per-customer balances match the ORM's joined-row semantics") {
    val t = CrmFixtures.build(spark)
    val got = CustomerLedger.customerBalances(t.customers, t.invoices,
      t.charges, CrmFixtures.FrozenTodaySql)
      .select($"customer_id", $"invoiced_unpaid".cast("string"),
        $"unpaid_count", $"overdue_count", $"uninvoiced_count")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // customer 1: unpaid invoices 1 (charges 5.00 + 15.00×2 = 35.00) and 2
    // (no charges); all adjustments 0; invoice 1 overdue (due 05-20 <
    // frozen today 05-21); six uninvoiced charges (100-105)
    assert(got(1L) === ((1L, "35.00", 2L, 1L, 6L)))
    // customer 2: only PAID invoice 4 — but its 10.00 adjustment rides the
    // invoices×charges join three times (charges 110-112) = 30.00: the
    // reference ORM's fanout double-count, replicated deliberately
    assert(got(2L) === ((2L, "30.00", 0L, 0L, 0L)))
    // customers with no invoices/charges: all-zero row survives (left join)
    assert(got(3L) === ((3L, "0.00", 0L, 0L, 0L)))
    assert(got(4L) === ((4L, "0.00", 0L, 0L, 0L)))
  }

  test("clean_slots GC keeps exactly the booking-protected slots") {
    val t = CrmFixtures.build(spark)
    val kept = graft.crm.CrmChecks.gcOrphanSlots(t.bookingSlots, t.bookings)
      .select($"id").as[Long].collect().toSet
    // orphans 2, 3, 13 (the orphan_slot warn rows in the replay golden)
    // are dropped; every referenced slot survives
    val all = t.bookingSlots.select($"id").as[Long].collect().toSet
    assert(kept === all -- Set(2L, 3L, 13L), kept.toString)
  }

  test("fixcustomers repair: empty invoice_email + exactly one email contact") {
    val t = CrmFixtures.build(spark)
    val got = graft.crm.CrmRepairs
      .repairInvoiceEmails(t.customers, t.contacts)
      .as[(Long, String, String)].collect().toSeq
    // only customer 2: invoice_email is '' and contact 4 is its single
    // email-classified contact; phone contacts never qualify
    // (set_as_invoice raises InvalidEmailError, contact.py:63-65)
    assert(got === Seq((2L, "Eve Jones&Co", "eve@x.com")))
  }
}
