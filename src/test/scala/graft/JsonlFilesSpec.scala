package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JsonlFiles

/** The JSONL quarantine reader: good/bad split semantics, and the scale
  * contract that neither side pins anything in executor storage (the read
  * is two plain text scans — no InMemoryRelation anywhere in the plan).
  */
class JsonlFilesSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  private def stage(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_spec").toString
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("good rows parse under the schema; malformed lines quarantine with the raw line") {
    val dir = stage(Seq(
      """{"id":1,"text":"alpha"}""",
      """{"id":2,"text":"beta"}""",
      """this is not json""",
      """{"id":3"""", // truncated
      """{"id":4,"text":null}"""))
    val ingest = JsonlFiles.read(spark, dir, schema)
    val good = ingest.good.orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(good.toSeq === Seq((1L, Some("alpha")), (2L, Some("beta")),
      (4L, None)))
    val bad = ingest.quarantined.collect().map(_.getString(0)).sorted
    assert(bad.toSeq === Seq("this is not json", """{"id":3""""))
  }

  test("neither side of the ingest pins a cache (no InMemoryRelation)") {
    val dir = stage(Seq("""{"id":1,"text":"x"}""", "garbage"))
    val ingest = JsonlFiles.read(spark, dir, schema)
    Seq(ingest.good, ingest.quarantined).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("InMemoryRelation"),
        s"ingest side must be a plain scan, found cache in:\n$plan")
    }
    // release is a declared no-op now — calling it must not throw and the
    // frames stay usable after it
    ingest.release()
    assert(ingest.good.count() === 1L)
    assert(ingest.quarantined.count() === 1L)
  }

  test("a schema declaring the reserved corrupt column is rejected") {
    val bad = schema.add(JsonlFiles.CorruptCol, StringType)
    val dir = stage(Seq("""{"id":1}"""))
    intercept[IllegalArgumentException] {
      JsonlFiles.read(spark, dir, bad)
    }
  }

  test("blank lines are skipped; a bare JSON null literal quarantines") {
    // blank/whitespace separators are tolerated (DataFrameReader.json
    // parity — NOT surfaced as all-null good rows), while `null` — which
    // from_json maps to a NULL struct, not a corrupt record — is not a
    // document and must quarantine with its raw line
    val dir = stage(Seq(
      """{"id":1,"text":"a"}""",
      "",
      "   ",
      "null",
      """{"id":2,"text":"b"}"""))
    val ingest = JsonlFiles.read(spark, dir, schema)
    assert(ingest.good.count() === 2L)
    assert(ingest.quarantined.collect().map(_.getString(0)).toSeq === Seq("null"))
  }

  test("type-mismatch rows quarantine rather than silently nulling") {
    val dir = stage(Seq("""{"id":"not a number","text":"x"}"""))
    val ingest = JsonlFiles.read(spark, dir, schema)
    // PERMISSIVE from_json flags the line via the corrupt column; the
    // reader must route it to quarantine, not emit a half-null good row
    assert(ingest.good.count() === 0L)
    assert(ingest.quarantined.count() === 1L)
  }
}
