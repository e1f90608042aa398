package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.domain.DateOps

class DateOpsSpec extends AnyFunSuite {
  test("reference example: Monday 2025-11-10 -> last week 11-03..11-09") {
    // /root/reference/src/weekly/orchestrator.py:150-152 documents this case
    val w = DateOps.lastWeekWindow("20251110")
    assert(w.dtFrom == "20251103" && w.dtTo == "20251109")
    assert(w.isoYear == 2025 && w.isoWeek == 45)
  }

  test("Sunday base never uses itself as last Sunday") {
    val w = DateOps.lastWeekWindow("20251109") // a Sunday
    assert(w.dtTo == "20251102" && w.dtFrom == "20251027")
  }

  test("ISO year boundary: early January belongs to previous ISO year") {
    val w = DateOps.lastWeekWindow("20260101")
    assert(w.dtFrom == "20251222" && w.dtTo == "20251228")
    assert(w.isoYear == 2025 && w.isoWeek == 52)
    // 2021-01-01 -> last week ends 2020-12-27, ISO week 52 of 2020
    val w2 = DateOps.lastWeekWindow("20210101")
    assert(w2.dtTo == "20201227" && w2.isoYear == 2020 && w2.isoWeek == 52)
    // a week that lands in ISO W53 (2020 had 53 weeks)
    val w3 = DateOps.lastWeekWindow("20210104")
    assert(w3.dtFrom == "20201228" && w3.isoYear == 2020 && w3.isoWeek == 53)
  }

  test("periodInfo replays _calculate_period_info exactly (W/M/Q + else)") {
    // productivity.py:148-178: W -> isocalendar week, M -> month,
    // Q -> (month-1)//3+1, anything else -> 1; stat_year = dt.year
    assert(DateOps.periodInfo(LocalDate.of(2024, 12, 28), "W") == ((2024, 52)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 6, 15), "M") == ((2025, 6)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 12, 31), "Q") == ((2025, 4)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 1, 1), "Q") == ((2025, 1)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 3, 31), "Q") == ((2025, 1)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 4, 1), "Q") == ((2025, 2)))
    assert(DateOps.periodInfo(LocalDate.of(2025, 7, 7), "X") == ((2025, 1)))
    // the reference's calendar-year/ISO-week MIX at the boundary:
    // 2027-01-01 is ISO week 53 of 2026, but stat_year stays 2027
    assert(DateOps.periodInfo(LocalDate.of(2027, 1, 1), "W") == ((2027, 53)))
    assert(DateOps.periodInfo(LocalDate.of(2026, 1, 1), "W") == ((2026, 1)))
  }

  test("dayGb maps periods to storage codes (productivity.py:466-468)") {
    assert(DateOps.dayGb("W") == "WEEK" && DateOps.dayGb("M") == "MON" &&
      DateOps.dayGb("Q") == "QT" && DateOps.dayGb("?") == "WEEK")
  }

  test("monthWindow: last full month, including the January -> December year step") {
    val w = DateOps.monthWindow("20251112")
    assert(w.dtFrom == "20251001" && w.dtTo == "20251031")
    assert(w.statYear == 2025 && w.periodNo == 10)
    // run on the 1st (the run_monthly.sh schedule): window = month just closed
    val w1 = DateOps.monthWindow("20251101")
    assert(w1.dtFrom == "20251001" && w1.dtTo == "20251031")
    // January: previous month is December of the PREVIOUS year
    val wj = DateOps.monthWindow("20260115")
    assert(wj.dtFrom == "20251201" && wj.dtTo == "20251231")
    assert(wj.statYear == 2025 && wj.periodNo == 12)
    // leap February as the closed month
    val wf = DateOps.monthWindow("20240315")
    assert(wf.dtFrom == "20240201" && wf.dtTo == "20240229")
  }

  test("quarterWindow: last full quarter, including the Q1 -> Q4 year step") {
    val w = DateOps.quarterWindow("20251112") // in Q4 -> last full = Q3
    assert(w.dtFrom == "20250701" && w.dtTo == "20250930")
    assert(w.statYear == 2025 && w.periodNo == 3)
    // base in Q1: previous quarter is Q4 of the PREVIOUS year
    val wq = DateOps.quarterWindow("20260215")
    assert(wq.dtFrom == "20251001" && wq.dtTo == "20251231")
    assert(wq.statYear == 2025 && wq.periodNo == 4)
    // first day of a quarter: the quarter just closed
    val wb = DateOps.quarterWindow("20250401")
    assert(wb.dtFrom == "20250101" && wb.dtTo == "20250331" && wb.periodNo == 1)
  }

  test("month/quarter windows: full closed periods, adjacent to the base period (sweep)") {
    var d = LocalDate.of(2024, 11, 15)
    while (d.isBefore(LocalDate.of(2026, 3, 1))) {
      val m = DateOps.monthWindow(d.format(DateOps.Ymd))
      val mFrom = LocalDate.parse(m.dtFrom, DateOps.Ymd)
      val mTo = LocalDate.parse(m.dtTo, DateOps.Ymd)
      assert(mFrom.getDayOfMonth == 1)
      assert(mTo == mFrom.plusMonths(1).minusDays(1), "a full calendar month")
      assert(mFrom.plusMonths(1) == d.withDayOfMonth(1), "the month just closed")
      assert(m.statYear == mFrom.getYear && m.periodNo == mFrom.getMonthValue)
      val q = DateOps.quarterWindow(d.format(DateOps.Ymd))
      val qFrom = LocalDate.parse(q.dtFrom, DateOps.Ymd)
      val qTo = LocalDate.parse(q.dtTo, DateOps.Ymd)
      assert(qFrom.getDayOfMonth == 1 && (qFrom.getMonthValue - 1) % 3 == 0)
      assert(qTo == qFrom.plusMonths(3).minusDays(1), "a full calendar quarter")
      assert(!qTo.isAfter(d) && qTo.isAfter(d.minusMonths(4)), "the quarter just closed")
      assert(q.periodNo == (qFrom.getMonthValue - 1) / 3 + 1 && q.statYear == qFrom.getYear)
      d = d.plusDays(7)
    }
  }

  test("window is always Monday..Sunday, 7 days, strictly before base") {
    var d = LocalDate.of(2025, 1, 1)
    while (d.isBefore(LocalDate.of(2025, 3, 1))) {
      val w = DateOps.lastWeekWindow(d.format(DateOps.Ymd))
      val from = LocalDate.parse(w.dtFrom, DateOps.Ymd)
      val to = LocalDate.parse(w.dtTo, DateOps.Ymd)
      assert(from.getDayOfWeek.getValue == 1)
      assert(to.getDayOfWeek.getValue == 7)
      assert(java.time.temporal.ChronoUnit.DAYS.between(from, to) == 6)
      assert(to.isBefore(d))
      assert(java.time.temporal.ChronoUnit.DAYS.between(to, d) <= 7)
      d = d.plusDays(1)
    }
  }
}
