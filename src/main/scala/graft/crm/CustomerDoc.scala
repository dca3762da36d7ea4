package graft.crm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's primary API read-model: the nested customer document
  * (reference: `cerberus/api/serializers.py:232-256` — CustomerSerializer
  * walks pets/contacts/bookings per customer row, an N+1 query per
  * relation in the ORM). SURVEY.md §3.1 mandates the Spark re-expression:
  * ONE join-based denormalization, not per-row lookups.
  *
  * Shape: aggregate-then-join. Each child relation is collapsed to
  * (customer_id, sorted array<struct>) FIRST — one hash shuffle per
  * relation, map-side partial collect — and the results LEFT-join onto
  * customers. The alternative (join children row-wise, then group the
  * fanned-out product back) multiplies the customer row by |pets| ×
  * |contacts| × |bookings| before collapsing and needs a dedup per
  * relation; this form never fans out, scans the customer side once, and
  * keeps every join on the same key so the planner reuses the
  * customer-side hash partitioning across the chain (PhysicalPlanSpec
  * pins one exchange per relation, no re-scan).
  *
  * Array ordering: `sort_array` on structs whose FIRST field is the
  * child's unique id — deterministic, partition-invariant output (the
  * serializer's stable-order contract). Timestamps are rendered to
  * 'yyyy-MM-dd HH:mm:ss' strings inside the struct so the document is
  * engine-portable (JSON-safe, no tz ambiguity).
  *
  * Scale: children shuffle as compact (fk, struct) rows; a customer's
  * array is bounded by its own relation fanout (the reference's UI-page
  * shape — thousands, not millions, per customer). A pathological hub
  * customer makes one big ROW, not a skewed join explosion: collect_list
  * partials combine map-side.
  */
object CustomerDoc {

  private def nest(child: DataFrame, fk: String, out: String,
      shape: Column): DataFrame =
    child.groupBy(col(fk).as("customer_id"))
      .agg(sort_array(collect_list(shape)).as(out))

  def nestedCustomers(customers: DataFrame, pets: DataFrame,
      contacts: DataFrame, bookings: DataFrame): DataFrame = {
    val petsAgg = nest(pets, "customer_id", "pets",
      struct(col("id").as("pet_id"), col("name"), col("sex"),
        col("neutered")))
    val contactsAgg = nest(contacts, "customer_id", "contacts",
      struct(col("id").as("contact_id"), col("name"), col("details")))
    val bookingsAgg = nest(bookings, "customer_id", "bookings",
      struct(col("id").as("booking_id"),
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("start"),
        date_format(col("end"), "yyyy-MM-dd HH:mm:ss").as("end"),
        col("state")))
    def emptyLike(agg: DataFrame, c: String): Column =
      array().cast(agg.schema(c).dataType)
    customers
      .select(col("id").as("customer_id"), col("name"), col("invoice_email"))
      .join(petsAgg, Seq("customer_id"), "left")
      .join(contactsAgg, Seq("customer_id"), "left")
      .join(bookingsAgg, Seq("customer_id"), "left")
      .select(col("customer_id"), col("name"), col("invoice_email"),
        coalesce(col("pets"), emptyLike(petsAgg, "pets")).as("pets"),
        coalesce(col("contacts"), emptyLike(contactsAgg, "contacts"))
          .as("contacts"),
        coalesce(col("bookings"), emptyLike(bookingsAgg, "bookings"))
          .as("bookings"))
  }
}
