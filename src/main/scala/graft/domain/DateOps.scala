package graft.domain

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.time.temporal.IsoFields
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reporting-window date math, mirroring the reference exactly
  * (/root/reference/src/weekly/orchestrator.py:148-164). */
object DateOps {
  val Ymd: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMdd")

  final case class WeekWindow(dtFrom: String, dtTo: String, isoYear: Int, isoWeek: Int)

  /** Last full Monday..Sunday week strictly before the base date.
    * days_to_last_sunday = (weekday + 1) % 7, or 7 when that is 0
    * (i.e. base is Sunday -> previous Sunday, never itself).
    * ISO year/week are taken from last_sunday (ref :162-164). */
  def lastWeekWindow(baseDate: LocalDate): WeekWindow = {
    val weekday = baseDate.getDayOfWeek.getValue - 1 // Monday=0 like Python
    val days = { val d = (weekday + 1) % 7; if (d == 0) 7 else d }
    val lastSunday = baseDate.minusDays(days)
    val lastMonday = lastSunday.minusDays(6)
    WeekWindow(lastMonday.format(Ymd), lastSunday.format(Ymd),
      lastSunday.get(IsoFields.WEEK_BASED_YEAR),
      lastSunday.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR))
  }

  def lastWeekWindow(baseDate: String): WeekWindow =
    lastWeekWindow(LocalDate.parse(baseDate, Ymd))

  // ---- monthly / quarterly report windows (run_etl.py:68-77 DAY_GB
  // choices WEEK/MONTH/QUARTER; productivity.py:94-178 period W/M/Q) ----

  /** A reporting window with its `_calculate_period_info` identity:
    * statYear/periodNo are what TS_PRODUCTIVITY keys on
    * (productivity.py:148-178). */
  final case class PeriodWindow(dtFrom: String, dtTo: String,
                                statYear: Int, periodNo: Int)

  /** `_calculate_period_info` (productivity.py:148-178) for a stat
    * date: W -> ISO week 1..53, M -> month 1..12, Q -> (month-1)//3+1,
    * anything else -> 1 (the reference's silent else-branch).
    * statYear is the CALENDAR year in every mode — for W the
    * reference deliberately pairs dt.year with the ISO week, so at
    * the Dec/Jan ISO boundary (e.g. 2027-01-01 = ISO week 53 of
    * 2026) the pair is (2027, 53). Replicated, not "fixed". */
  def periodInfo(statDate: LocalDate, period: String): (Int, Int) = {
    val no = period match {
      case "W" => statDate.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR)
      case "M" => statDate.getMonthValue
      case "Q" => (statDate.getMonthValue - 1) / 3 + 1
      case _ => 1
    }
    (statDate.getYear, no)
  }

  /** period -> DAY_GB storage code (productivity.py:466-468):
    * W->WEEK, M->MON, Q->QT; unknown falls back to WEEK. */
  def dayGb(period: String): String =
    Map("W" -> "WEEK", "M" -> "MON", "Q" -> "QT").getOrElse(period, "WEEK")

  /** Last full calendar month strictly before the base date — the
    * monthly analogue of lastWeekWindow (run_monthly.sh fires on the
    * 1st, so the window is always the month just closed). */
  def monthWindow(baseDate: LocalDate): PeriodWindow = {
    val end = baseDate.withDayOfMonth(1).minusDays(1)
    val start = end.withDayOfMonth(1)
    PeriodWindow(start.format(Ymd), end.format(Ymd), end.getYear,
      periodInfo(end, "M")._2)
  }

  def monthWindow(baseDate: String): PeriodWindow =
    monthWindow(LocalDate.parse(baseDate, Ymd))

  /** Last full calendar quarter strictly before the base date. */
  def quarterWindow(baseDate: LocalDate): PeriodWindow = {
    val thisQStart = LocalDate.of(baseDate.getYear,
      ((baseDate.getMonthValue - 1) / 3) * 3 + 1, 1)
    val start = thisQStart.minusMonths(3)
    val end = thisQStart.minusDays(1)
    PeriodWindow(start.format(Ymd), end.format(Ymd), end.getYear,
      periodInfo(end, "Q")._2)
  }

  def quarterWindow(baseDate: String): PeriodWindow =
    quarterWindow(LocalDate.parse(baseDate, Ymd))

  /** SF_GET_LOCALE_VW_DATE_2022 (docs/db/ins/02_TABLE.md:97-100):
    * rows are stored in UTC; per-locale "view date" shifts by the
    * locale's fixed offset — KOR +09:00, VNM +07:00, anything else
    * stays UTC — and truncates to a yyyyMMdd date string. */
  def localeVwDate(utcTs: Column, locale: Column): Column = {
    val tz = when(locale === "KOR", "+09:00")
      .when(locale === "VNM", "+07:00")
      .otherwise("UTC")
    date_format(from_utc_timestamp(utcTs, tz), "yyyyMMdd")
  }

  // ---- column-level variants (same formula over a date column) ----

  /** (weekday+1)%7 or 7 — weekday() is Monday=0 in Spark, matching
    * Python's date.weekday(). */
  def daysToLastSunday(d: Column): Column = {
    val m = (weekday(d) + 1) % 7
    when(m === 0, 7).otherwise(m)
  }

  def lastSunday(d: Column): Column = date_sub(d, daysToLastSunday(d))
  def lastMonday(d: Column): Column = date_sub(lastSunday(d), 6)

  /** ISO week-numbering year via the Thursday trick (Spark has no
    * isoyear builtin; weekofyear IS ISO). */
  def isoYear(d: Column): Column = year(date_add(d, lit(3) - weekday(d)))
  def isoWeek(d: Column): Column = weekofyear(d)

  /** yyyyMMdd string <-> date, the storage convention of the domain
    * (FIXTURES.md: boundary types stay strings, compare lexicographic). */
  def ymdToDate(c: Column): Column = to_date(c, "yyyyMMdd")
  def dateToYmd(c: Column): Column = date_format(c, "yyyyMMdd")
}
