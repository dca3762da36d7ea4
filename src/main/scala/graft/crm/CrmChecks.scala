package graft.crm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-row / cross-table CRM checks (the rule species that need joins or
  * windows rather than row predicates) — each emits the engine's standard
  * violation schema so all rule outputs union into one sink.
  *
  * Every check is set-oriented: the reference evaluates these row-at-a-time
  * in `clean()`/`save()` hooks; here each is one join/aggregation pass.
  */
object CrmChecks {

  /** Per-invoice charge subtotal — sum(line × quantity) over attached
    * charges (invoice.py:283-285). The ONE definition shared by the
    * accounting invariants and the e-mail render so the two cannot drift
    * (e.g. one gaining a state filter the other misses).
    */
  def invoiceSubtotals(charges: DataFrame,
      as: String = "subtotal"): DataFrame =
    charges
      .where(col("invoice_id").isNotNull)
      .groupBy(col("invoice_id"))
      .agg(sum(col("line") * col("quantity")).as(as))

  import graft.engine.ValidationEngine.violationCols

  private def shape(df: DataFrame, entity: String, keyCol: Column,
      ruleId: String, path: String, msg: Column,
      severity: String = "error"): DataFrame =
    df.select(
      concat(lit(entity + ":"), keyCol.cast("string")).as("key"),
      lit(entity).as("part"),
      lit(ruleId).as("rule_id"),
      lit(path).as("path"),
      msg.as("message"),
      lit(severity).as("severity"))
      .select(violationCols.map(col): _*)

  /** The reference's 4-clause interval-overlap predicate
    * (`cerberus/models/booking.py:72-78`), replicated exactly:
    * other.start<s ∧ other.end>s  ∨  other.start<e ∧ other.end>e
    * ∨ equal ∨ strictly-contained.
    */
  def overlapPredicate(aStart: Column, aEnd: Column,
      bStart: Column, bEnd: Column): Column =
    (bStart < aStart && bEnd > aStart) ||
    (bStart < aEnd && bEnd > aEnd) ||
    (bStart === aStart && bEnd === aEnd) ||
    (bStart > aStart && bEnd < aEnd)

  /** R10: slots overlapping another slot that has live bookings
    * (`booking.py:80-83`, ValidationError `:87` "BookingSlot overlaps
    * another BookingSlot").
    *
    * Scale: a naive self-theta-join is O(n²) per partition. We explode each
    * interval into fixed-width time buckets and equi-join on the bucket, so
    * the join is hash-partitioned by time and only near-in-time pairs are
    * compared (SURVEY.md §2.3 J7). Any overlapping pair shares ≥1 bucket.
    */
  def overlappingSlots(slots: DataFrame, bookings: DataFrame,
      bucketSeconds: Long = 3600L): DataFrame = {
    val withBookings = bookings
      .where(col("booking_slot_id").isNotNull && col("state") =!= "canceled")
      .select(col("booking_slot_id").as("id")).distinct()

    def bucketed(prefix: String, df: DataFrame): DataFrame =
      df.select(
        col("id").as(s"${prefix}_id"),
        col("start").as(s"${prefix}_start"),
        col("end").as(s"${prefix}_end"),
        explode(sequence(
          floor(unix_timestamp(col("start")) / bucketSeconds),
          floor(unix_timestamp(col("end")) / bucketSeconds))).as("bucket"))

    val a = bucketed("a", slots)
    val b = bucketed("b", slots.join(withBookings, Seq("id"), "left_semi"))
    val pairs = a.join(b,
        a("bucket") === b("bucket") && col("a_id") =!= col("b_id") &&
        overlapPredicate(col("a_start"), col("a_end"),
          col("b_start"), col("b_end")))
      .select(col("a_id").as("id")).distinct()

    shape(pairs, "booking_slot", col("id"), "no_overlap", "start",
      lit("BookingSlot overlaps another BookingSlot"))
  }

  /** R11 single-service-per-slot (`booking.py:89-90`). */
  def multipleServicesPerSlot(bookings: DataFrame): DataFrame = {
    val bad = bookings
      .where(col("booking_slot_id").isNotNull && col("state") =!= "canceled")
      .groupBy(col("booking_slot_id"))
      .agg(countDistinct(col("service_id")).as("n_services"))
      .where(col("n_services") > 1)
    shape(bad, "booking_slot", col("booking_slot_id"), "single_service",
      "service_id", lit("BookingSlot has multiple services"))
  }

  /** R11 capacity: pets per slot ≤ service.max_pet, distinct customers per
    * slot ≤ service.max_customer (`booking.py:365-383`). Messages verbatim
    * from MaxPetsError/MaxCustomersError (`booking.py:372,375`).
    */
  def capacity(bookings: DataFrame, bookingPets: DataFrame,
      services: DataFrame): DataFrame = {
    val live = bookings
      .where(col("booking_slot_id").isNotNull && col("state") =!= "canceled")
    val petCounts = live.alias("b")
      .join(bookingPets.alias("bp"), col("b.id") === col("bp.booking_id"), "left")
      .groupBy(col("b.booking_slot_id").as("slot_id"),
        col("b.service_id").as("service_id"))
      .agg(
        count(col("bp.pet_id")).as("pet_count"),
        countDistinct(col("b.customer_id")).as("customer_count"))
    val joined = petCounts
      .join(broadcast(services.select(col("id").as("service_id"),
        col("max_pet"), col("max_customer"))), Seq("service_id"))

    val maxPets = joined.where(col("pet_count") > col("max_pet"))
    val maxCust = joined.where(col("customer_count") > col("max_customer"))
    shape(maxPets, "booking_slot", col("slot_id"), "max_pets", "pets",
      concat(lit("Booking has max pets for service, "),
        col("max_pet").cast("string")))
      .unionByName(
        shape(maxCust, "booking_slot", col("slot_id"), "max_customers",
          "customer_id",
          concat(lit("Booking has max customers for service, "),
            col("max_customer").cast("string"))))
  }

  /** R12: FSM transition legality over the audit log (W6). Validates each
    * logged (source_state → state) edge against the entity's transition
    * matrix (`CrmCatalog.transitionsFor`); `complete` additionally requires
    * end < now (`booking.py:389-390,449-455`).
    */
  def fsmLegality(stateLog: DataFrame, entity: String): DataFrame = {
    val legal = CrmCatalog.transitionsFor(entity).toSeq
    val legalDf = broadcast(
      stateLog.sparkSession.createDataFrame(legal)
        .toDF("source_state", "state"))
    val bad = stateLog.where(col("entity") === entity)
      .join(legalDf, Seq("source_state", "state"), "left_anti")
    shape(bad, entity, col("entity_id"), "fsm_legal", "state",
      concat(lit("illegal transition "), col("source_state"),
        lit(" -> "), col("state"))
    )
  }

  /** R12 guard on the draft→unpaid transition: `Invoice.send` runs only
    * when `can_send` holds (`cerberus/models/invoice.py:117-118,153-170`) —
    * the customer exists and has NO issues (`customer.py:130-140`: empty
    * invoice_email, '&' in last_name). Batch form: any invoice in a
    * post-send state (unpaid/paid — both necessarily passed through send;
    * void is excluded since draft→void skips the guard) whose customer is
    * missing or has issues could not have been sent legally. One violation
    * row per failed clause, issue messages verbatim.
    */
  def invoiceSendGuard(invoices: DataFrame, customers: DataFrame): DataFrame = {
    val sent = invoices.where(col("state").isin("unpaid", "paid"))
      .alias("i")
      .join(broadcast(customers.select(col("id").as("_cust_id"),
        col("invoice_email").as("_cust_email"),
        col("last_name").as("_cust_last"))),
        col("i.customer_id") === col("_cust_id"), "left")
    val noCustomer = sent.where(col("_cust_id").isNull)
    val noEmail = sent.where(col("_cust_id").isNotNull &&
      (col("_cust_email").isNull || col("_cust_email") === ""))
    val badLast = sent.where(col("_cust_id").isNotNull &&
      col("_cust_last").contains("&"))
    shape(noCustomer, "invoice", col("i.id"), "send_guard", "customer_id",
      lit("sent invoice has no customer"))
      .unionByName(shape(noEmail, "invoice", col("i.id"), "send_guard",
        "customer_id", lit("sent to customer with issue: no invoice email set")))
      .unionByName(shape(badLast, "invoice", col("i.id"), "send_guard",
        "customer_id",
        lit("sent to customer with issue: last name doesn't look right")))
  }

  /** R12 condition: completed bookings must have end < frozen now. */
  def completeRequiresPastEnd(bookings: DataFrame, nowSql: String): DataFrame = {
    val bad = bookings.where(col("state") === "completed" &&
      !(col("end") < expr(nowSql)))
    shape(bad, "booking", col("id"), "complete_requires_past_end", "end",
      lit("cannot complete a booking before its end"))
  }

  /** R17 accounting invariants (`invoice.py:211-231`, `charge.py:98-119`;
    * exact Decimal equality — tests/test_invoices.py:166-188):
    *  - total = adjustment + Σ(line×quantity)     (loaded == computed)
    *  - paid invoices: Σ payments == total        (pay() balances in full)
    *  - per charge: Σ refund children ≤ amount    (ChargeRefundError)
    */
  def accountingInvariants(invoices: DataFrame, charges: DataFrame,
      payments: DataFrame): DataFrame = {
    val subtotals = invoiceSubtotals(charges)
    val paid = payments
      .where(col("invoice_id").isNotNull)
      .groupBy(col("invoice_id"))
      .agg(sum(col("amount")).as("paid"))
    val inv = invoices.alias("i")
      .join(subtotals, col("i.id") === subtotals("invoice_id"), "left")
      .join(paid, col("i.id") === paid("invoice_id"), "left")
      .select(col("i.id").as("id"), col("i.state").as("state"),
        // adjustment is non-null in the reference (default=0.0); lift
        // NULL to 0 like the e-mail render so total never goes NULL
        coalesce(col("i.adjustment"), lit(0).cast("decimal(14,2)"))
          .as("adjustment"),
        coalesce(col("subtotal"), lit(0).cast("decimal(14,2)")).as("subtotal"),
        coalesce(col("paid"), lit(0).cast("decimal(14,2)")).as("paid"))
      .withColumn("total", col("adjustment") + col("subtotal"))

    val paidMismatch = inv.where(col("state") === "paid" &&
      !(col("paid") <=> col("total")))
    val v1 = shape(paidMismatch, "invoice", col("id"), "paid_equals_total",
      "paid", concat(lit("paid "), col("paid").cast("string"),
        lit(" != total "), col("total").cast("string")))

    // refunds: children with state='refund' carry negative line values
    val refunded = charges.where(col("state") === "refund" &&
        col("parent_charge_id").isNotNull)
      .groupBy(col("parent_charge_id").as("_parent_id"))
      .agg((-sum(col("line") * col("quantity"))).as("refunded"))
    val overRefund = charges.alias("c")
      .join(refunded, col("c.id") === col("_parent_id"))
      .where(col("refunded") > col("c.line") * col("c.quantity"))
    val v2 = shape(overRefund, "charge", col("c.id"), "refund_within_amount",
      "line", lit("Refund amount exceeds the refundable amount"))

    v1.unionByName(v2)
  }

  /** R13 immutability after send (`invoice.py:92-108`; test
    * tests/test_invoices.py:80-87): business fields of post-draft invoices
    * must be identical across two snapshots.
    */
  def immutabilityDrift(before: DataFrame, after: DataFrame,
      protectedCols: Seq[String] =
        Seq("details", "due", "adjustment", "customer_name",
          "invoice_address")): DataFrame = {
    val b = before.select((Seq(col("id"), col("state")) ++
      protectedCols.map(c => col(c).as(s"b_$c"))): _*)
    val a = after.select((col("id") +: protectedCols.map(c => col(c).as(s"a_$c"))): _*)
    val joined = b.join(a, Seq("id")).where(col("state") =!= "draft")
    // ONE join + one explode of per-column violation structs (the
    // RuleCompiler violationsArray shape) — a per-column union would put
    // protectedCols.length copies of the join subtree in the plan and
    // scan/shuffle both snapshots once per protected field
    val vioStructs = protectedCols.map { c =>
      when(!(col(s"b_$c") <=> col(s"a_$c")), struct(
        lit(c).as("path"),
        lit(s"post-send edit to protected field $c").as("message")))
    }
    joined.select(col("id"), explode(array(vioStructs: _*)).as("v"))
      .where(col("v").isNotNull)
      .select(
        concat(lit("invoice:"), col("id").cast("string")).as("key"),
        lit("invoice").as("part"),
        lit("immutable_after_send").as("rule_id"),
        col("v.path").as("path"),
        col("v.message").as("message"),
        lit("error").as("severity"))
      .select(violationCols.map(col): _*)
  }

  /** R15: a booking's pets must belong to the booking's customer
    * (`booking.py:298-300`).
    */
  def petOwnership(bookings: DataFrame, bookingPets: DataFrame,
      pets: DataFrame): DataFrame = {
    val bad = bookings.alias("b")
      .join(bookingPets.alias("bp"), col("b.id") === col("bp.booking_id"))
      .join(pets.alias("p"), col("bp.pet_id") === col("p.id"))
      .where(!(col("p.customer_id") <=> col("b.customer_id")))
    shape(bad, "booking", col("b.id"), "pets_belong_to_customer", "pets",
      concat(lit("pet "), col("p.id").cast("string"),
        lit(" does not belong to booking customer")))
  }

  /** R18: orphan slots — no bookings at all (reference GC-deletes them,
    * `booking.py:149-151`); surfaced as warn-severity violations.
    */
  def orphanSlots(slots: DataFrame, bookings: DataFrame): DataFrame = {
    val used = bookings.where(col("booking_slot_id").isNotNull)
      .select(col("booking_slot_id").as("id")).distinct()
    val bad = slots.join(used, Seq("id"), "left_anti")
    shape(bad, "booking_slot", col("id"), "orphan_slot", "id",
      lit("slot has no bookings"), severity = "warn")
  }

  /** R18 write-path companion (`management/commands/clean_slots.py`): the
    * reference tries to delete EVERY slot and suppresses ProtectedError,
    * keeping exactly the slots some booking still references. Batch form:
    * one semi-join — the retained table to overwrite with. (The
    * warn-severity detection side is [[orphanSlots]].)
    */
  def gcOrphanSlots(slots: DataFrame, bookings: DataFrame): DataFrame = {
    val used = bookings.where(col("booking_slot_id").isNotNull)
      .select(col("booking_slot_id").as("id"))
    slots.join(used, Seq("id"), "left_semi")
  }

  /** Overdue predicate — must equal the reference's annotation AND its
    * Python property (`invoice.py:45` vs `:130-132`): unpaid ∧ due < today.
    */
  def overdue(due: Column, state: Column, todaySql: String): Column =
    state === "unpaid" && due.isNotNull && due < expr(todaySql)

  /** W7 MonitorField reconstruction: "the last time `entity`'s state
    * entered `state`" from the audit log (`paid_on`/`sent_on`,
    * `cerberus/models/invoice.py:70-71`) — `max(when(state = v, ts))`
    * per entity, one aggregation.
    */
  def monitorTimestamp(stateLog: DataFrame, entity: String,
      state: String, out: String): DataFrame =
    stateLog.where(col("entity") === entity)
      .groupBy(col("entity_id"))
      .agg(max(when(col("state") === state, col("ts"))).as(out))

  /** R14-adjacent: stored MonitorField column must equal the audit-log
    * reconstruction (e.g. invoices.paid_on vs max state→paid ts).
    */
  def monitorConsistency(entities: DataFrame, stateLog: DataFrame,
      entity: String, state: String, storedCol: String): DataFrame = {
    val recon = monitorTimestamp(stateLog, entity, state, "_recon")
    val bad = entities.alias("e")
      .join(recon, col("e.id") === recon("entity_id"), "left")
      .where(!(col(s"e.$storedCol") <=> col("_recon")))
    shape(bad, entity, col("e.id"), s"${storedCol}_consistent", storedCol,
      concat(lit(s"stored $storedCol "), col(s"e.$storedCol").cast("string"),
        lit(" != audit-log reconstruction "), col("_recon").cast("string")))
  }
}
