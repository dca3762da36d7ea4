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
    trim(regexp_replace(c, "(?m)(^\\s+|[\\n\\r]+)", ""))

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
    lower(c).contains(needle.toLowerCase)
}
