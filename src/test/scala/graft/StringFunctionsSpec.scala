package graft

import org.apache.spark.sql.functions._
import graft.functions.{StringFunctions => SF}

/** Replays the reference string-util corpus (tests/test_utils.py,
  * tests/test_string_utils.py) against the Column implementations.
  */
class StringFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def f(c: org.apache.spark.sql.Column, v: String): String =
    Seq(Option(v)).toDF("v").select(c.as("r")).as[String].head()

  test("minimize_whitespace corpus (utils.py:27-31)") {
    assert(f(SF.minimizeWhitespace($"v"), "    This is a test string") ===
      "This is a test string")
    assert(f(SF.minimizeWhitespace($"v"), "This is a test string    ") ===
      "This is a test string")
    assert(f(SF.minimizeWhitespace($"v"), "This is a test\nstring") ===
      "This is a teststring")
    // verified against Python: re.sub(r"(^\s+|[\n\r]+)", "", v, MULTILINE).strip()
    assert(f(SF.minimizeWhitespace($"v"), "  a\n   b\r\n c  ") === "abc")
  }

  test("linebreakto joins all line-break flavours (string_utils.py:19-21)") {
    assert(f(SF.linebreakTo($"v", ", "), "a\nb\r\nc\rd") === "a, b, c, d")
  }

  test("unslug (string_utils.py:24-26)") {
    assert(f(SF.unslug($"v"), "a_b_c") === "a b c")
  }

  test("mailto wraps valid emails, passes others (string_utils.py:10-16)") {
    assert(f(SF.mailto($"v"), "a@b.com") ===
      "<a href=\"mailto:a@b.com\">a@b.com</a>")
    assert(f(SF.mailto($"v"), "not an email") === "not an email")
  }

  test("invoice name INV-%03d (invoice.py:127-128)") {
    val got = Seq(1L, 42L, 1234L).toDF("v")
      .select(SF.invoiceName($"v").as("r")).as[String].collect().toSeq
    assert(got === Seq("INV-001", "INV-042", "INV-1234"))
  }

  test("truncate255 (booking.py:340)") {
    assert(f(SF.truncate255($"v"), "x" * 300).length === 255)
    assert(f(SF.truncate255($"v"), "short") === "short")
  }

  test("title strip (dummydata.py:82-87)") {
    assert(f(SF.stripTitle($"v"), "Dr Jane Smith") === "Jane Smith")
    assert(f(SF.stripTitle($"v"), "Professor X") === "X")
    assert(f(SF.stripTitle($"v"), "mr. bob") === "bob")
    assert(f(SF.stripTitle($"v"), "Drone Pilot") === "Drone Pilot") // no false prefix
  }

  test("round_date_time: 10-minute floor, seconds dropped (booking.py:66-70)") {
    val got = Seq("2017-05-21 10:17:43").toDF("v")
      .select(SF.roundDateTime10Min(to_timestamp($"v"))
        .cast("string").as("r")).as[String].head()
    assert(got === "2017-05-21 10:10:00")
  }

  test("choice_length (utils.py:13-14, test corpus value 5)") {
    assert(SF.choiceLength(Seq("one", "two", "three", "empty")) === 5)
  }

  test("icontains is case-insensitive substring (filters.py:46)") {
    val got = Seq("Bob SMITH", "eve", "smithy").toDF("v")
      .where(SF.icontains($"v", "Smith")).as[String].collect().toSeq
    assert(got === Seq("Bob SMITH", "smithy"))
  }

  test("naturaldate matches humanize branch-for-branch (booking.py:278)") {
    def nd(v: String): String =
      Seq(v).toDF("v").select(SF.naturalDate(to_date($"v"),
        expr("date'2017-05-21'")).as("r")).as[String].head()
    assert(nd("2017-05-21") === "today")
    assert(nd("2017-05-22") === "tomorrow")
    assert(nd("2017-05-20") === "yesterday")
    assert(nd("2017-03-03") === "Mar 03")       // within a year: no year shown
    assert(nd("2016-06-30") === "Jun 30")       // earlier YEAR but < 365 days
    assert(nd("2016-03-03") === "Mar 03 2016")  // ≥ 365 days: year shown
    assert(nd("2019-01-01") === "Jan 01 2019")  // future, ≥ 365 days
  }

  test("day_of_week maps Monday-indexed ints like calendar.day_name (date_utils.py:11-13)") {
    val got = Seq(0, 3, 6).toDF("v")
      .select(SF.dayOfWeek($"v").as("r")).as[String].collect().toSeq
    assert(got === Seq("Monday", "Thursday", "Sunday"))
  }

  test("precisedelta matches humanize (human_duration.py:19-20, min_unit minutes/seconds)") {
    def pd(secs: Long, unit: String): String =
      Seq(secs).toDF("v").select(SF.preciseDelta($"v", unit).as("r"))
        .as[String].head()
    // the reference's own call shape: service/booking lengths, minutes
    assert(pd(1800L, "minutes") === "30 minutes")
    assert(pd(3600L, "minutes") === "1 hour")
    assert(pd(5400L, "minutes") === "1 hour and 30 minutes")
    assert(pd(90L, "minutes") === "1.50 minutes")     // fractional fold-down
    assert(pd(7245L, "minutes") === "2 hours and 0.75 minutes")
    assert(pd(0L, "minutes") === "0 minutes")
    // seconds granularity
    assert(pd(90L, "seconds") === "1 minute and 30 seconds")
    assert(pd(90061L, "seconds") === "1 day, 1 hour, 1 minute and 1 second")
    assert(pd(0L, "seconds") === "0 seconds")
    // calendar decomposition (365-day years, 30.5-day months, %d-truncated
    // day remainder — humanize's own approximation)
    assert(pd(365L * 86400, "seconds") === "1 year")
    assert(pd(400L * 86400, "seconds") === "1 year, 1 month and 4 days")
  }

  test("naturaldelta matches humanize branch-for-branch (pet.py:97-101)") {
    val cases = Seq(
      0L -> "a moment", 1L -> "a second", 30L -> "30 seconds",
      90L -> "a minute", 300L -> "5 minutes", 4000L -> "an hour",
      10000L -> "2 hours", -90L -> "a minute", // humanize abs()es
      86400L -> "a day", 86400L * 17 -> "17 days",
      86400L * 40 -> "a month", 86400L * 200 -> "6 months",
      86400L * 365 -> "a year", 86400L * 385 -> "1 year, 20 days",
      86400L * 366 -> "1 year, 1 day", // ngettext singular remainder
      86400L * 405 -> "1 year, 1 month", 86400L * 565 -> "1 year, 6 months",
      86400L * 800 -> "2 years")
    val got = cases.map(_._1).toDF("v")
      .select($"v", SF.naturalDelta($"v").as("r"))
      .as[(Long, String)].collect().toMap
    cases.foreach { case (secs, want) =>
      assert(got(secs) === want, s"naturaldelta($secs)")
    }
  }
}
