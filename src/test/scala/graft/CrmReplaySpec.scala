package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine._
import graft.crm.{CrmCatalog, CrmChecks}
import graft.fixtures.CrmFixtures

/** Replays the reference's error-fixture corpus (SURVEY.md §5.3) over the
  * CRM-shaped tables: the engine + cross-row checks must emit exactly the
  * golden violation set, with reference-verbatim messages where the
  * reference has one.
  */
class CrmReplaySpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = CrmFixtures.build(spark)

  private def cfgFor(entity: String) = EngineConfig(
    keyExpr = s"concat('$entity:', cast(id as string))",
    partExpr = s"'$entity'")

  private lazy val dims = Map(
    "customers" -> t.customers, "services" -> t.services,
    "invoices" -> t.invoices)

  private lazy val allViolations: DataFrame = Seq(
    ValidationEngine.run(t.bookings, CrmCatalog.bookingRules, dims, cfgFor("booking")).violations,
    ValidationEngine.run(t.bookingSlots, CrmCatalog.slotRules, dims, cfgFor("booking_slot")).violations,
    ValidationEngine.run(t.customers, CrmCatalog.customerRules, dims, cfgFor("customer")).violations,
    ValidationEngine.run(t.contacts, CrmCatalog.contactRules, dims, cfgFor("contact")).violations,
    ValidationEngine.run(t.services, CrmCatalog.serviceRules, dims, cfgFor("service")).violations,
    ValidationEngine.run(t.invoices, CrmCatalog.invoiceRules, dims, cfgFor("invoice")).violations,
    ValidationEngine.run(t.charges, CrmCatalog.chargeRules, dims, cfgFor("charge")).violations,
    ValidationEngine.run(t.payments, CrmCatalog.paymentRules, dims, cfgFor("payment")).violations,
    ValidationEngine.run(t.pets, CrmCatalog.petRules, dims, cfgFor("pet")).violations,
    CrmChecks.overlappingSlots(t.bookingSlots, t.bookings),
    CrmChecks.multipleServicesPerSlot(t.bookings),
    CrmChecks.capacity(t.bookings, t.bookingPets, t.services),
    CrmChecks.fsmLegality(t.stateLog, "booking"),
    CrmChecks.fsmLegality(t.stateLog, "invoice"),
    CrmChecks.fsmLegality(t.stateLog, "charge"),
    CrmChecks.completeRequiresPastEnd(t.bookings, CrmFixtures.FrozenNowSql),
    CrmChecks.invoiceSendGuard(t.invoices, t.customers),
    CrmChecks.accountingInvariants(t.invoices, t.charges, t.payments),
    CrmChecks.immutabilityDrift(t.invoices, t.invoicesAfter),
    CrmChecks.petOwnership(t.bookings, t.bookingPets, t.pets),
    CrmChecks.orphanSlots(t.bookingSlots, t.bookings),
    CrmChecks.monitorConsistency(t.invoices, t.stateLog,
      "invoice", "paid", "paid_on")
  ).reduce(_.unionByName(_)).cache()

  private lazy val byRule: Map[String, Set[String]] =
    allViolations.select("rule_id", "key").as[(String, String)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def keys(rule: String): Set[String] = byRule.getOrElse(rule, Set.empty)

  test("golden violation set matches the reference error fixtures exactly") {
    val expected = Map(
      // R1 start < end (IntegrityError, tests/test_bookings.py:48-56,288-297)
      "start_before_end" -> Set("booking:5", "booking_slot:3"),
      // R2 enum states
      "valid_state" -> Set("booking:6", "invoice:5"),
      // R3 canceled ⇔ no slot (tests/test_bookings.py:299-315)
      "canceled_has_no_slot" -> Set("booking:3"),
      "active_has_slot" -> Set("booking:2"),
      // R4 payment ≥ 0
      "amount_gte_0" -> Set("payment:3"),
      // R9 referential
      "booking_customer_fk" -> Set("booking:21"),
      "invoice_customer_fk" -> Set("invoice:6"),
      "pet_customer_fk" -> Set("pet:3"),
      "payment_invoice_fk" -> Set("payment:4"),
      // R10 overlap (truth table tests/test_bookings.py:58-92)
      "no_overlap" -> Set("booking_slot:2", "booking_slot:7", "booking_slot:8"),
      // R11 capacity (tests/test_bookings.py:215-248)
      "max_pets" -> Set("booking_slot:4"),
      "max_customers" -> Set("booking_slot:5"),
      "single_service" -> Set("booking_slot:6"),
      // R12 transition legality
      "fsm_legal" -> Set("booking:6", "invoice:4", "charge:100"),
      "complete_requires_past_end" -> Set("booking:20"),
      // R12 send guard (invoice.py:117-118 can_send): invoice 4 was sent to
      // a customer with BOTH issues; invoice 6's customer doesn't exist
      "send_guard" -> Set("invoice:4", "invoice:6"),
      // R13 immutability (tests/test_invoices.py:80-87)
      "immutable_after_send" -> Set("invoice:1"),
      // R14 generated column (tests/test_customer.py:19-21)
      "generated_name" -> Set("customer:3"),
      // R15 ownership (tests/test_bookings.py:328-337)
      "pets_belong_to_customer" -> Set("booking:22"),
      // R16 issues heuristics (customer.py:130-140)
      "no_invoice_email" -> Set("customer:2"),
      "last_name_looks_wrong" -> Set("customer:2"),
      // R17 accounting (tests/test_invoices.py:96-163, test_charges.py:45-88)
      "paid_equals_total" -> Set("invoice:4"),
      "refund_within_amount" -> Set("charge:101"),
      // R18 orphans
      "orphan_slot" -> Set("booking_slot:2", "booking_slot:3", "booking_slot:13"),
      // bad pet enum
      "valid_sex" -> Set("pet:4"),
      // void() detaches invoice (charge.py:91-93)
      "void_charge_detached" -> Set("charge:106"),
      // W7 MonitorField drift: stored paid_on vs state-log reconstruction
      "paid_on_consistent" -> Set("invoice:4")
    )
    expected.foreach { case (rule, want) =>
      assert(keys(rule) === want, s"rule $rule")
    }
    // uniqueness rules (composite keys): one distinct-dup violation each
    assert(keys("unique_start_end").size === 1)
    assert(keys("unique_customer_slot").size === 1)
    assert(keys("unique_name_customer").size === 1)
    assert(keys("unique_service").size === 1)
    // and nothing else fired
    val covered = expected.keySet ++ Set("unique_start_end",
      "unique_customer_slot", "unique_name_customer", "unique_service")
    assert(byRule.keySet === covered,
      s"unexpected rules fired: ${byRule.keySet -- covered}")
  }

  test("capacity messages match the reference strings verbatim (booking.py:372,375)") {
    val msgs = allViolations
      .where($"rule_id".isin("max_pets", "max_customers", "refund_within_amount", "no_overlap"))
      .select("rule_id", "message").as[(String, String)].collect().toMap
    assert(msgs("max_pets") === "Booking has max pets for service, 4")
    assert(msgs("max_customers") === "Booking has max customers for service, 2")
    assert(msgs("refund_within_amount") === "Refund amount exceeds the refundable amount")
    assert(msgs("no_overlap") === "BookingSlot overlaps another BookingSlot")
  }

  test("send guard fires one row per failed can_send clause") {
    val msgs = allViolations.where($"rule_id" === "send_guard")
      .select("key", "message").as[(String, String)].collect().toSet
    assert(msgs === Set(
      ("invoice:4", "sent to customer with issue: no invoice email set"),
      ("invoice:4", "sent to customer with issue: last name doesn't look right"),
      ("invoice:6", "sent invoice has no customer")))
  }

  test("issue messages match customer.py:130-140 verbatim") {
    val msgs = allViolations.where($"key" === "customer:2")
      .select("message").as[String].collect().toSet
    assert(msgs === Set("no invoice email set", "last name doesn't look right"))
  }

  test("R10 overlap predicate truth table (booking.py:72-78, tests :58-92)") {
    def overlaps(aS: Int, aE: Int, bS: Int, bE: Int): Boolean = {
      val df = Seq((aS, aE, bS, bE)).toDF("as_", "ae", "bs", "be")
      df.select(CrmChecks.overlapPredicate(
        $"as_", $"ae", $"bs", $"be").as("o")).as[Boolean].head()
    }
    assert(overlaps(10, 20, 15, 25))   // straddles end
    assert(overlaps(10, 20, 5, 15))    // straddles start
    assert(overlaps(10, 20, 10, 20))   // equal
    assert(overlaps(10, 20, 12, 18))   // contained
    assert(overlaps(10, 20, 5, 25))    // other contains self (caught by
      // clause 1: other.start < self.start ∧ other.end > self.start)
    assert(overlaps(10, 20, 20, 30) === false) // touching, exclusive bounds
    assert(overlaps(10, 20, 0, 10) === false)
  }

  test("F6 contact classifier matches the reference corpus (tests/test_contacts.py)") {
    val phones = Seq("+441234567890", "01234567890", "(01234)567890", "01234 567890")
    val mobiles = Seq("+447234567890", "07234567890", "(07234)567890", "07234 567890")
    val names = Seq("blueberry1234", "sunflower_87", "pineapplemaster456",
      "techwizard789", "rainbowsparkle22")
    val domains = Seq("example.com", "mail.co.uk", "hotmail.fr", "gmail.net",
      "yahoo.co.jp")
    val emails = for (n <- names; d <- domains) yield s"$n@$d"
    val corpus = phones.map((_, "phone")) ++ mobiles.map((_, "mobile")) ++
      emails.map((_, "email")) ++ Seq(("gibberish!!", "unknown"), ("", "unknown"))
    val df = corpus.toDF("details", "want")
    val wrong = df.withColumn("got", CrmCatalog.contactType($"details"))
      .where($"got" =!= $"want")
    assert(wrong.isEmpty, wrong.collect().mkString(","))
  }

  test("F6 classifier on generated emails (hypothesis st.emails() analog)") {
    val emailGen = for {
      l <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
      a <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
      b <- Gen.oneOf("com", "org", "co.uk", "io")
    } yield s"$l@$a.$b"
    val emails = (0 until 200).flatMap(i =>
      emailGen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(emails.size > 150)
    val wrong = emails.toDF("details")
      .withColumn("got", CrmCatalog.contactType($"details"))
      .where($"got" =!= "email")
    assert(wrong.isEmpty, wrong.collect().mkString(","))
  }

  test("W7 monitor timestamps: stored paid_on vs audit-log reconstruction") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val invoices = Seq(
      (3L, Some(ts("2017-05-03 10:00:00"))), // matches the log → clean
      (4L, Some(ts("2017-05-09 09:00:00"))), // log says 05-02 → violation
      (7L, None)                             // never paid, no log row → clean
    ).toDF("id", "paid_on")
    val log = Seq(
      ("invoice", 3L, ts("2017-05-02 10:00:00"), "draft", "unpaid"),
      ("invoice", 3L, ts("2017-05-03 10:00:00"), "unpaid", "paid"),
      ("invoice", 4L, ts("2017-05-02 10:00:00"), "draft", "paid")
    ).toDF("entity", "entity_id", "ts", "source_state", "state")
    val bad = CrmChecks.monitorConsistency(invoices, log,
      "invoice", "paid", "paid_on")
      .select("key").as[String].collect().toSet
    assert(bad === Set("invoice:4"))
  }

  test("overdue: expression == recompute (invoice.py:45 vs :130-132)") {
    val annotated = t.invoices.withColumn("overdue",
      CrmChecks.overdue($"due", $"state", CrmFixtures.FrozenTodaySql))
    val got = annotated.where($"overdue").select("id").as[Long].collect().toSet
    assert(got === Set(1L))
    // property == annotation: recompute via independent driver-side logic
    val today = java.time.LocalDate.parse("2017-05-21")
    val recomputed = t.invoices.select("id", "state", "due")
      .as[(Long, String, Option[java.sql.Date])].collect()
      .filter { case (_, st, due) =>
        st == "unpaid" && due.exists(_.toLocalDate.isBefore(today)) }
      .map(_._1).toSet
    assert(got === recomputed)
  }

  test("R17 Σ equality corpus: annotation-style vs property-style totals agree exactly (test_invoices.py:166-188)") {
    // 10 customers × 2 invoices × 3 charges with decimal money values
    val n = 10
    val invs = (0 until n * 2).map(i =>
      (i.toLong, (i % n).toLong, "unpaid", BigDecimal(i % 7).setScale(2)))
      .toDF("id", "customer_id", "state", "adjustment")
      .withColumn("adjustment", $"adjustment".cast("decimal(14,2)"))
    val chs = (0 until n * 2 * 3).map { j =>
      (j.toLong, j.toLong % (n * 2), BigDecimal("12.37") * (j % 9 + 1), (j % 3) + 1)
    }.toDF("id", "invoice_id", "line", "quantity")
      .withColumn("line", $"line".cast("decimal(14,2)"))
    // annotation style: one SQL-pushed join+groupBy (manager, invoice.py:37-47)
    val annotated = invs.alias("i")
      .join(chs.alias("c"), $"i.id" === $"c.invoice_id", "left")
      .groupBy($"i.customer_id")
      .agg(sum($"c.line" * $"c.quantity").as("subtotal_sum"))
    // property style: per-invoice totals first (invoice.py:283-297), then sum
    val perInvoice = chs.groupBy($"invoice_id")
      .agg(sum($"line" * $"quantity").as("subtotal"))
      .join(invs, $"invoice_id" === invs("id"))
    val propStyle = perInvoice.groupBy($"customer_id")
      .agg(sum($"subtotal").as("subtotal_sum"))
    val a = annotated.select($"customer_id", $"subtotal_sum".cast("string"))
      .as[(Long, String)].collect().toMap
    val b = propStyle.select($"customer_id", $"subtotal_sum".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(a === b)
  }
}
