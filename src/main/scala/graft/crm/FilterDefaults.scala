package graft.crm

import org.apache.spark.sql.{Column, DataFrame}

/** P11 — the reference's default-filter injection
  * (`FilterDefaults.__init__`, `cerberus/filters.py:31-55,74-76`): a list
  * view applies `active=True` UNLESS the caller's explicit params already
  * constrain that key — an explicit filter on the same key replaces the
  * default rather than ANDing with it.
  *
  * Per-key replace semantics matter: `defaults ++ explicit` means an
  * explicit `status` predicate silently wins over the default `status`
  * predicate, exactly like the reference's dict merge — and unlike a
  * naive `where(default).where(explicit)`, which would AND them into an
  * empty result for any explicit value other than the default.
  *
  * Every surviving predicate lands in the same scan-stage filter
  * (Catalyst conjunction), so defaults are free at 100 TB: they prune in
  * the same pushed filter set as the explicit ones.
  */
object FilterDefaults {

  def withDefaults(df: DataFrame, explicit: Map[String, Column],
      defaults: Map[String, Column]): DataFrame =
    (defaults ++ explicit).values.foldLeft(df)((d, p) => d.where(p))
}
