package graft.crm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P12 — the reference's match-case dispatch filter
  * (`CustomerFilter.filter_status`, `cerberus/filters.py:82-93`): a named
  * status parameter selects one of several EXISTS predicates over a
  * related table (BOOKINGS / UNINVOICED / UNPAID / OVERDUE), and any
  * other value falls through to no filter (the reference's `match`
  * default returns the queryset unchanged).
  *
  * Each arm compiles to a LEFT SEMI join on the relating key — the
  * 100-TB shape for EXISTS: no fanout, no post-join dedup, shuffles only
  * on the key both sides already relate on, and Spark broadcasts the
  * filtered inner side whenever the predicate makes it small.
  */
object StatusDispatch {

  /** Filter `entities` to rows with at least one `related` row matching
    * the arm selected by `status`; unknown statuses return `entities`
    * unchanged.
    *
    * @param entityKey  join key column name on `entities`
    * @param relatedKey the corresponding key column name on `related`
    * @param arms       status name → predicate over `related` columns
    */
  def filterByStatus(entities: DataFrame, related: DataFrame,
      entityKey: String, relatedKey: String,
      arms: Map[String, Column], status: String): DataFrame =
    arms.get(status) match {
      case Some(pred) =>
        entities.join(
          related.where(pred).select(col(relatedKey).as(entityKey)),
          Seq(entityKey), "left_semi")
      case None => entities
    }
}
