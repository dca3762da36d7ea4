package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar string/date helpers (SURVEY.md §2.7 F-series) as
  * pure `Column` functions — no UDFs, everything stays in whole-stage
  * codegen.
  */
object StringFunctions {

  /** F9: runtime truncation to 255 chars (`cerberus/models/booking.py:340`). */
  def truncate255(c: Column): Column = substring(c, 1, 255)

  /** F10: zero-padded invoice name `INV-{pk:03}` (`invoice.py:127-128`). */
  def invoiceName(id: Column): Column =
    format_string("INV-%03d", id.cast("long"))

  /** F11: `linebreakto` — join lines with `to`
    * (`templatetags/string_utils.py:19-21`). Python splitlines covers
    * \n, \r\n, \r.
    */
  def linebreakTo(c: Column, to: String): Column =
    array_join(split(c, "\\r\\n|\\r|\\n"), to)

  /** F11: `unslug` — underscores to spaces (`string_utils.py:24-26`). */
  def unslug(c: Column): Column = regexp_replace(c, "_", " ")

  /** F12: `minimize_whitespace` (`cerberus/utils.py:27-31`): strip
    * leading whitespace per line and remove newlines, then trim — the
    * exact regex `(^\s+|[\n\r]+)` with MULTILINE.
    */
  def minimizeWhitespace(c: Column): Column =
    // (?d): UNIX_LINES, so '^' fires only after \n — Java's default
    // multiline also fires after a lone \r/\u0085/\u2028/\u2029,
    // which neither Python re.MULTILINE (the reference) nor the DuckDB
    // oracle's RE2 does (same divergence nonBlankLineCount pins)
    trim(regexp_replace(c, "(?dm)(^\\s+|[\\n\\r]+)", ""))

  /** F7: email validity — Django validate_email approximated; the F6
    * classifier's EMAIL regex is the reference's own loose form.
    */
  def emailValid(c: Column): Column =
    c.isNotNull && c.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$")

  /** F11: `mailto` — wrap valid emails in a mailto anchor, pass through
    * anything else (`string_utils.py:10-16`).
    */
  def mailto(c: Column): Column =
    when(emailValid(c),
      concat(lit("<a href=\"mailto:"), c, lit("\">"), c, lit("</a>")))
      .otherwise(c)

  /** F18: strip title prefixes (`management/commands/dummydata.py:82-87`,
    * `anonymise.py:21-27`).
    */
  def stripTitle(c: Column): Column =
    regexp_replace(c,
      "(?i)^(Sir|Madam|Mr|Mrs|Ms|Miss|Dr|Professor)\\.?\\s+", "")

  /** W9: `round_date_time` — floor to 10 minutes, dropping seconds
    * (`cerberus/models/booking.py:66-70`).
    */
  def roundDateTime10Min(ts: Column): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / 600L) * 600L)

  /** F14: `choice_length` — max literal length of a closed enum
    * (`cerberus/utils.py:13-14`); driver-side constant used when sizing
    * length rules for enum columns.
    */
  def choiceLength(values: Seq[String]): Int =
    values.map(_.length).max

  /** F8: case-insensitive substring filter (Django `icontains`,
    * `filters.py:46`).
    */
  def icontains(c: Column, needle: String): Column =
    // Locale.ROOT: the default-locale toLowerCase turns "ID" into dotless
    // "\u0131d" under tr_TR, silently matching nothing against Spark's
    // locale-independent lower()
    lower(c).contains(needle.toLowerCase(java.util.Locale.ROOT))

  /** P15: multi-field OR search — the DRF `SearchFilter` shape
    * (`cerberus/api.py:296-298`, `search_fields = ["name", "email"]`):
    * one query term [[icontains]]-matched across several columns, ORed.
    * NULL-safe: a NULL column never vetoes a match in another column and
    * an all-NULL row does not match (each leg coalesces to false — the
    * same rows Django's `Q(...) | Q(...)` returns, where a NULL leg is
    * simply not a match). Stays a single scan-stage filter: no join, no
    * shuffle, codegen'd `Contains` per leg.
    */
  def searchAny(needle: String, cols: Column*): Column = {
    require(cols.nonEmpty, "searchAny needs at least one search column")
    cols.map(c => coalesce(icontains(c, needle), lit(false))).reduce(_ || _)
  }

  /** F16: `humanize.naturaldate` (used for booking display names,
    * `cerberus/models/booking.py:278,302-303`): "today" / "tomorrow" /
    * "yesterday" relative to `today`; other dates within a year render
    * "Mon dd" and dates a year-or-more away "Mon dd yyyy" — the public
    * humanize library's exact branch structure (naturaldate →
    * naturalday with a "%b %d %Y" format once |Δ| ≥ 365 days).
    *
    * Pure `when` chain + `date_format` — stays in whole-stage codegen;
    * `today` is an explicit column (the engine's frozen-clock discipline,
    * F4) so results are deterministic and oracle-able.
    */
  def naturalDate(d: Column, today: Column): Column = {
    val delta = datediff(d, today)
    when(d.isNull, lit(null.asInstanceOf[String]))
      .when(delta === 0, lit("today"))
      .when(delta === 1, lit("tomorrow"))
      .when(delta === -1, lit("yesterday"))
      .when(abs(delta) >= 365, date_format(d, "MMM dd yyyy"))
      .otherwise(date_format(d, "MMM dd"))
  }

  /** F16-adjacent: `day_of_week` template filter
    * (`cerberus/templatetags/date_utils.py:11-13`): Python
    * `calendar.day_name[i]` — Monday-indexed weekday number → name.
    */
  def dayOfWeek(idx: Column): Column =
    element_at(array(Seq("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday").map(lit): _*), (idx % 7).cast("int") + 1)

  /** F16: `humanize.precisedelta` (booking/service length display,
    * `cerberus/templatetags/human_duration.py:19-20`, used with
    * `minimum_unit="minutes"` in booking_list/service_detail): exact
    * decomposition "1 year, 2 months, 3 days, 4 hours and 5 minutes" —
    * units below `minimumUnit` fold into it as a fractional value rendered
    * `%.2f` (humanize's default format) only when a fraction exists.
    * Calendar approximation is humanize's own (365-day years, 30.5-day
    * months, `%d` truncation of the fractional day remainder); components
    * join with ", " and a final " and "; zero durations render as
    * "0 <minimumUnit>". Negative durations are absolute-valued (the
    * reference only feeds nonnegative lengths). Supported minimumUnit:
    * "seconds" | "minutes" — the two the reference's templates use.
    *
    * Presentation-tier function: the final join uses one regexp_replace;
    * everything stays codegen'd `when`/`concat` chains.
    */
  def preciseDelta(seconds: Column, minimumUnit: String = "minutes"): Column = {
    require(minimumUnit == "seconds" || minimumUnit == "minutes",
      s"unsupported minimum_unit: $minimumUnit")
    val total = abs(seconds.cast("long"))
    val days = (total / 86400L).cast("long")
    val daySecs = total % 86400L
    val years = (days / 365L).cast("long")
    val remDays = days % 365L
    val months = floor(remDays / 30.5).cast("long")
    // humanize renders the (possibly fractional) day remainder with %d →
    // truncation; remainder is nonnegative so floor == truncation
    val showDays = floor(remDays.cast("double") - months.cast("double") * 30.5)
      .cast("long")
    val hours = (daySecs / 3600L).cast("long")
    val hourSecs = daySecs % 3600L

    def unitTxt(v: Column, name: String): Column =
      when(v > 0, concat(v.cast("string"), lit(" " + name),
        when(v === 1, lit("")).otherwise(lit("s"))))

    // the minimum unit: fractional when the sub-unit remainder is nonzero,
    // and always shown (as 0) when every other component is absent
    val (minCol, minName) =
      if (minimumUnit == "minutes") {
        val mf = hourSecs.cast("double") / 60.0
        val txt = when(hourSecs % 60L =!= 0,
            concat(format_string("%.2f", mf), lit(" minutes")))
          .when(mf === 1.0, lit("1 minute"))
          .when(mf > 0, concat((hourSecs / 60L).cast("long").cast("string"),
            lit(" minutes")))
        (txt, "minutes")
      } else {
        val mins = (hourSecs / 60L).cast("long")
        val secs = hourSecs % 60L
        val minsTxt = unitTxt(mins, "minute")
        val secsTxt = unitTxt(secs, "second")
        (when(minsTxt.isNotNull && secsTxt.isNotNull,
            concat(minsTxt, lit(", "), secsTxt))
          .otherwise(coalesce(minsTxt, secsTxt)), "seconds")
      }

    val joined = concat_ws(", ",
      unitTxt(years, "year"), unitTxt(months, "month"),
      unitTxt(showDays, "day"), unitTxt(hours, "hour"), minCol)
    val withAnd = regexp_replace(joined, ",(?=[^,]*+$)", " and")
    when(seconds.isNull, lit(null.asInstanceOf[String]))
      .when(joined === "", lit(s"0 $minName"))
      .otherwise(withAnd)
  }

  /** F16: `humanize.naturaldelta` (pet age, `cerberus/models/pet.py:97-101`)
    * over a duration in seconds — the library's full branch tree with
    * months enabled: "a moment", "N seconds", "a minute", "N minutes",
    * "an hour", "N hours", "a day", "N days", "a month", "N months",
    * "a year", "1 year, N days", "1 year, N months", "N years".
    * Calendar approximation is humanize's own: years = days/365,
    * months = remaining-days/30.5.
    */
  def naturalDelta(seconds: Column): Column = {
    val secs = abs(seconds.cast("long"))
    val days = (secs / 86400L).cast("long")
    val years = (days / 365L).cast("long")
    val remDays = days % 365L
    val months = floor(remDays / 30.5).cast("long")
    val s = secs % 86400L // humanize's delta.seconds: within-day remainder
    val str: Column => Column = _.cast("string")
    when(seconds.isNull, lit(null.asInstanceOf[String]))
      .when(years === 0 && days === 0,
        when(s === 0, lit("a moment"))
          .when(s === 1, lit("a second"))
          .when(s < 60, concat(str(s), lit(" seconds")))
          .when(s < 120, lit("a minute"))
          .when(s < 3600, concat(str((s / 60L).cast("long")), lit(" minutes")))
          .when(s < 7200, lit("an hour"))
          .otherwise(concat(str((s / 3600L).cast("long")), lit(" hours"))))
      .when(years === 0,
        when(days === 1, lit("a day"))
          .when(months === 0, concat(str(days), lit(" days")))
          .when(months === 1, lit("a month"))
          .otherwise(concat(str(months), lit(" months"))))
      .when(years === 1,
        when(months === 0 && remDays === 0, lit("a year"))
          // humanize ngettext singularizes the one-day remainder
          .when(months === 0 && remDays === 1, lit("1 year, 1 day"))
          .when(months === 0, concat(lit("1 year, "), str(remDays), lit(" days")))
          .when(months === 1, lit("1 year, 1 month"))
          .otherwise(concat(lit("1 year, "), str(months), lit(" months"))))
      .otherwise(concat(str(years), lit(" years")))
  }
}
