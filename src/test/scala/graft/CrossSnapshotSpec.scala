package graft

import org.apache.spark.sql.functions._
import graft.engine.CrossSnapshot
import graft.fixtures.PagesGen

/** The north_star byte-identity invariant: text per url must be
  * byte-identical across snapshots; planted mutations are caught exactly,
  * identical snapshots produce zero violations.
  */
class CrossSnapshotSpec extends SparkSuite {
  import spark.implicits._

  private lazy val data = PagesGen.generate(spark, nRows = 10000L, nDays = 3)
  // restrict to unique non-null urls (dup-url rows would make per-key
  // hashes ambiguous; uniqueness is its own rule)
  private lazy val base = data.pages.where($"url".isNotNull)
    .dropDuplicates("url")

  test("identical snapshots → zero byte-identity violations") {
    val vios = CrossSnapshot.byteIdentity(base, base, "url", "text")
    assert(vios.isEmpty)
  }

  test("planted text mutations are caught exactly (no false positives)") {
    val (after, expected) = PagesGen.mutateSnapshot(base)
    val got = CrossSnapshot.byteIdentity(base, after, "url", "text")
      .where($"severity" === "error")
      .select($"key").as[String].collect().toSet
    val want = expected.as[String].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("keys missing from the later snapshot surface as warnings") {
    val after = base.where(pmod(xxhash64($"url"), lit(10L)) =!= 0)
    val vios = CrossSnapshot.byteIdentity(base, after, "url", "text")
    val warns = vios.where($"severity" === "warn").count()
    val truth = base.count() - after.count()
    assert(warns === truth && warns > 0)
  }
}
