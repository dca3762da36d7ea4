package graft.crm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.rules._

/** The reference CRM's validation surface as rule catalogs (SURVEY.md §2.10
  * R1-R18) — replayed over CRM-shaped tables to prove the engine reproduces
  * the reference's pass/fail verdicts and violation rows.
  *
  * Messages match the reference strings verbatim where the reference has
  * one (e.g. `cerberus/models/booking.py:372` "Booking has max pets for
  * service, {n}"; `cerberus/models/customer.py:130-140` issue strings).
  */
object CrmCatalog {

  val BookingStates: Seq[String] =
    Seq("enquiry", "preliminary", "confirmed", "canceled", "completed")
  val InvoiceStates: Seq[String] = Seq("draft", "unpaid", "paid", "void")
  val ChargeStates: Seq[String] = Seq("unpaid", "paid", "void", "refund")

  /** Legal FSM transitions (django-fsm @transition decorators):
    * booking `cerberus/models/booking.py:429-457`, invoice
    * `invoice.py:153-241`, charge `charge.py:85-93`.
    */
  val BookingTransitions: Set[(String, String)] = Set(
    "enquiry" -> "preliminary",        // process
    "preliminary" -> "confirmed",      // confirm
    "enquiry" -> "canceled",           // cancel (STATES_CANCELABLE)
    "preliminary" -> "canceled",
    "confirmed" -> "canceled",
    "canceled" -> "enquiry",           // reopen
    "confirmed" -> "completed")        // complete (requires end < now)

  val InvoiceTransitions: Set[(String, String)] = Set(
    "draft" -> "unpaid",               // send
    "unpaid" -> "paid",                // pay
    "draft" -> "void", "unpaid" -> "void")

  val ChargeTransitions: Set[(String, String)] = Set(
    "unpaid" -> "paid", "unpaid" -> "void")

  def transitionsFor(entity: String): Set[(String, String)] = entity match {
    case "booking" => BookingTransitions
    case "invoice" => InvoiceTransitions
    case "charge"  => ChargeTransitions
    case other => throw new IllegalArgumentException(s"no FSM for $other")
  }

  // --- row-rule catalogs per table -------------------------------------

  /** bookings: R1 start<end (CHECK booking.py:268), R2 state enum (CHECK
    * :274), R3 canceled ⇔ no slot (CHECK :269-273), R9 customer FK.
    */
  def bookingRules: Seq[ValidationRule] = Seq(
    ExprRule("start_before_end", "start",
      "(start < end) OR start IS NULL OR end IS NULL"),
    Allowed("valid_state", "state", BookingStates),
    Dependency("canceled_has_no_slot", "booking_slot_id",
      "state = 'canceled'", "booking_slot_id IS NULL"),
    Dependency("active_has_slot", "booking_slot_id",
      "state != 'canceled'", "booking_slot_id IS NOT NULL"),
    Required("customer_required", "customer_id"),
    Referential("booking_customer_fk", "customer_id", "customers", "id"),
    Referential("booking_service_fk", "service_id", "services", "id"),
    Unique("unique_customer_slot", Seq("customer_id", "booking_slot_id"))
  )

  /** booking_slots: R1 start<end (CHECK booking.py:51), R5 unique
    * (start,end) (:50).
    */
  def slotRules: Seq[ValidationRule] = Seq(
    ExprRule("start_before_end", "start",
      "(start < end) OR start IS NULL OR end IS NULL"),
    Unique("unique_start_end", Seq("start", "end"))
  )

  /** customers: R14 generated name (customer.py:76-80), R16 soft issues
    * (:130-140, messages verbatim), R8 length bounds (:72-74).
    */
  def customerRules: Seq[ValidationRule] = Seq(
    GeneratedConsistent("generated_name", "name",
      "concat(first_name, ' ', last_name)"),
    // reference invoice_email is a NON-NULL field with '' as the no-email
    // sentinel (customer.py:83 default=""), so NULL in a nullable Spark
    // column lifts to '' — flagged, same as the send guard and can_send
    // (an email can't be sent to NULL any more than to '')
    ExprRule("no_invoice_email", "invoice_email",
      "coalesce(invoice_email, '') != ''",
      severity = "warn", message = "no invoice email set"),
    ExprRule("last_name_looks_wrong", "last_name",
      "last_name IS NULL OR NOT contains(last_name, '&')",
      severity = "warn", message = "last name doesn't look right"),
    MaxLength("first_name_max_length", "first_name", 125),
    MaxLength("last_name_max_length", "last_name", 125)
  )

  /** contacts: R5 unique (name, customer) (contact.py:43), R8 255 bound. */
  def contactRules: Seq[ValidationRule] = Seq(
    Unique("unique_name_customer", Seq("name", "customer_id")),
    MaxLength("name_max_length", "name", 255),
    MaxLength("details_max_length", "details", 255),
    Referential("contact_customer_fk", "customer_id", "customers", "id")
  )

  /** services: R5 five-column unique (service.py:29). */
  def serviceRules: Seq[ValidationRule] = Seq(
    Unique("unique_service",
      Seq("name", "cost", "max_pet", "max_customer", "length_s"))
  )

  /** invoices: R2 state enum; fields nullable by design. */
  def invoiceRules: Seq[ValidationRule] = Seq(
    Allowed("valid_state", "state", InvoiceStates),
    Referential("invoice_customer_fk", "customer_id", "customers", "id")
  )

  /** charges: R2 state enum; R4-adjacent quantity ≥ 1 default. */
  def chargeRules: Seq[ValidationRule] = Seq(
    Allowed("valid_state", "state", ChargeStates),
    MaxLength("name_max_length", "name", 255),
    // void() detaches the invoice (charge.py:91-93): a void charge still
    // pointing at an invoice is inconsistent state
    ExprRule("void_charge_detached", "invoice_id",
      "state != 'void' OR invoice_id IS NULL")
  )

  /** payments: R4 CHECK amount ≥ 0 (invoice.py:360-363). */
  def paymentRules: Seq[ValidationRule] = Seq(
    MinMax("amount_gte_0", "amount", Some("0"), None),
    Referential("payment_invoice_fk", "invoice_id", "invoices", "id")
  )

  /** pets: enums (pet.py:30-82): sex/neutered nullable enums,
    * social_media_concent closed non-null.
    */
  def petRules: Seq[ValidationRule] = Seq(
    Allowed("valid_sex", "sex", Seq("male", "female")),
    Allowed("valid_neutered", "neutered", Seq("yes", "no", "implant")),
    Allowed("valid_concent", "social_media_concent", Seq("yes", "no", "annon")),
    Referential("pet_customer_fk", "customer_id", "customers", "id")
  )

  // --- F6 contact-type classifier (contact.py:24-26,48-61) -------------
  // Python re.match is prefix-anchored: anchor with ^ but no trailing $
  // unless the reference pattern has one. First match wins: email → mobile
  // → phone → unknown; mobile ⊂ phone so order matters.

  val EmailPattern = "^[^@]+@[^@]+\\.[^@]+"
  val MobilePattern = "^(\\+447|\\(?07)[0-9()\\s]+$"
  val PhonePattern = "^\\+?[0-9()\\s]+$"

  /** `Column`-level classifier — a plain Scala function of Column, not a
    * UDF (SURVEY.md §2.9): stays in whole-stage codegen.
    */
  def contactType(details: Column): Column = {
    val d = coalesce(details, lit(""))
    when(d.rlike(EmailPattern), "email")
      .when(d.rlike(MobilePattern), "mobile")
      .when(d.rlike(PhonePattern), "phone")
      .otherwise("unknown")
  }
}
