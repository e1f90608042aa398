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
