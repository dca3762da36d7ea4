package graft

import org.apache.spark.sql.functions._
import graft.crm.StatusDispatch

/** P12 dispatch-filter semantics (CustomerFilter.filter_status,
  * filters.py:82-93): named arms select EXISTS predicates; unknown
  * statuses fall through to the unfiltered frame; arms are semi-joins
  * (never fan out on duplicate related rows).
  */
class StatusDispatchSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = {
    val ents = Seq(1L, 2L, 3L, 4L).toDF("id")
    // entity 1: two open rows (fanout bait); 2: one closed; 3: none
    val rel = Seq((1L, "open"), (1L, "open"), (2L, "closed"), (4L, "open"))
      .toDF("eid", "st")
    (ents, rel)
  }
  private val arms = Map(
    "ANY" -> lit(true),
    "OPEN" -> (col("st") === "open"))

  test("each arm admits exactly the EXISTS set, without join fanout") {
    val (ents, rel) = fixture
    def ids(status: String): Set[Long] =
      StatusDispatch.filterByStatus(ents, rel, "id", "eid", arms, status)
        .select($"id").as[Long].collect().toSet
    assert(ids("ANY") === Set(1L, 2L, 4L))
    assert(ids("OPEN") === Set(1L, 4L))
    // duplicate related rows for entity 1 must not duplicate the entity
    assert(StatusDispatch.filterByStatus(ents, rel, "id", "eid", arms,
      "OPEN").count() === 2L)
  }

  test("unknown status falls through to no filter (reference match default)") {
    val (ents, rel) = fixture
    val out = StatusDispatch.filterByStatus(ents, rel, "id", "eid", arms,
      "NO_SUCH_STATUS")
    assert(out.count() === 4L)
    // the fallthrough is the SAME frame, not a rebuilt one — no join in
    // its plan at all
    assert(!out.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("arm plans are left-semi joins") {
    val (ents, rel) = fixture
    val plan = StatusDispatch.filterByStatus(ents, rel, "id", "eid", arms,
      "OPEN").queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
  }
}
