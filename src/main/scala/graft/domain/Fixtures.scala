package graft.domain

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic domain fixtures conforming to the reference's source
  * schemas (FIXTURES.md §1): sow master, work-event log, farrowing,
  * weaning, piglet transfers. Generated with a fixed LCG so the SAME
  * rows are rendered both as Spark DataFrames and as SQL VALUES
  * clauses for the DuckDB oracle — the domain queries are verified on
  * identical inputs in both engines.
  *
  * Lifecycles follow the reference's event grammar
  * (data_loader.py:28-46): per parity G -> (B -> E | F), gapless SEQ,
  * 2-year horizon around base date 2025-11-12 (the reference's own
  * test-date neighbourhood, orchestrator.py:31-41). Edge rows
  * included: sows with no work history (alert.py:108-117), a foster
  * mother (DAERI_YN='Y'), culled vs alive-sentinel OUT_DT.
  */
object Fixtures {
  val BaseDate = "20251112"            // Wednesday
  val DtFrom = "20251103"              // last-week window of BaseDate
  val DtTo = "20251109"

  private final class Lcg(seed: Long) {
    private var s = seed
    def next(n: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % n).toInt + n) % n
    }
  }

  private val ymd = DateOps.Ymd
  private def f(d: LocalDate) = d.format(ymd)

  // row buffers: (table schemas follow FIXTURES.md §1)
  final case class Tables(
    modon: Seq[Row], modonWk: Seq[Row], bunman: Seq[Row],
    eu: Seq[Row], trans: Seq[Row])

  lazy val generated: Tables = {
    val modon = ArrayBuffer[Row]()
    val wk = ArrayBuffer[Row]()
    val bun = ArrayBuffer[Row]()
    val eu = ArrayBuffer[Row]()
    val tr = ArrayBuffer[Row]()
    var trSeq = 0

    for (farm <- 1 to 2; i <- 1 to 30) {
      val rng = new Lcg(farm * 7919L + i * 104729L)
      val pig = "P%03d".format(i)
      val birth = LocalDate.of(2023, 1, 1).plusDays(rng.next(400))
      val inDt = birth.plusDays(220 + rng.next(40))

      if (i == 28) {
        // no work history: status falls back to TB_MODON.STATUS_CD
        // (branches 2/3 of the mating schedule, schedule.py:450-480)
        val (status, lastWk, bd) =
          if (farm == 1) ("010005", "20251020", null)
          else ("010001", null, "20250301") // birth+240 lands in the window
        modon += Row(farm, pig, status, f(inDt),
          Codes.AliveOutDt, if (bd != null) bd else f(birth), lastWk, 0, null, null, "Y")
      } else if (i == 22 && farm == 1) {
        // planted overdue-weaned sow: last E well past the 7-day
        // return interval at the base date (GB_OVER alert branch)
        wk += Row(farm, pig, 1, "20250601", "G", 1, null, "N", "Y")
        wk += Row(farm, pig, 2, "20250923", "B", 1, null, "N", "Y")
        bun += Row(farm, pig, "20250923", "B", 12, 1, 0, 13.8, "Y")
        wk += Row(farm, pig, 3, "20251017", "E", 1, null, "N", "Y")
        eu += Row(farm, pig, "20251017", "E", 10, 1, 24, 61.5, "N", "Y")
        modon += Row(farm, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
          "20251017", 0, null, null, "Y")
      } else if (i == 25) {
        // planted accident-as-latest sows: status 010006 (return) on
        // farm 1, 010007 (abortion) on farm 2 at the base date
        val sago = if (farm == 1) "020001" else "020002"
        wk += Row(farm, pig, 1, "20250920", "G", 1, null, "N", "Y")
        wk += Row(farm, pig, 2, "20251108", "F", 1, sago, "N", "Y")
        modon += Row(farm, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
          "20251108", 0, null, null, "Y")
      } else if (i == 26 || i == 27) {
        // planted schedule candidates (schedule.py:513-560): a
        // lactating sow (B + 21 lands in the report week) and a
        // pregnant sow (G + 115 lands in the report week)
        if (i == 26) {
          wk += Row(farm, pig, 1, "20250622", "G", 1, null, "N", "Y")
          wk += Row(farm, pig, 2, "20251015", "B", 1, null, "N", "Y")
          bun += Row(farm, pig, "20251015", "B", 11, 1, 0, 14.5, "Y")
          modon += Row(farm, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
            "20251015", 0, null, null, "Y")
        } else {
          wk += Row(farm, pig, 1, "20250714", "G", 1, null, "N", "Y")
          modon += Row(farm, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
            "20250714", 0, null, null, "Y")
        }
      } else {
        val culled = i == 30 || i == 24 || i == 23
        val foster = i == 29
        var t = LocalDate.of(2024, 1, 1).plusDays(rng.next(120))
        val endDate =
          if (i == 30) LocalDate.of(2025, 6, 1)
          else if (i == 24) LocalDate.of(2025, 10, 25)
          else if (i == 23) LocalDate.of(2025, 10, 8)
          else LocalDate.of(2025, 12, 1)
        var seq = 0; var parity = 1
        var lastDt: LocalDate = null
        while (t.isBefore(endDate)) {
          seq += 1
          wk += Row(farm, pig, seq, f(t), "G", parity, null, "N", "Y")
          lastDt = t
          val roll = rng.next(10)
          if (roll < 8) {
            val b = t.plusDays(114 + rng.next(3))
            if (b.isBefore(endDate)) {
              seq += 1
              val daeri = if (foster) "Y" else "N"
              wk += Row(farm, pig, seq, f(b), "B", parity, null, daeri, "Y")
              val silsan = 8 + rng.next(7); val sasan = rng.next(3); val mila = rng.next(2)
              bun += Row(farm, pig, f(b), "B", silsan, sasan, mila,
                (95 + rng.next(60)) / 10.0, "Y")
              val e = b.plusDays(19 + rng.next(5))
              seq += 1
              wk += Row(farm, pig, seq, f(e), "E", parity, null, daeri, "Y")
              val dusu = math.max(silsan - 1 - rng.next(3), 4)
              eu += Row(farm, pig, f(e), "E", dusu, rng.next(2),
                java.time.temporal.ChronoUnit.DAYS.between(b, e).toInt,
                (550 + rng.next(200)) / 10.0, daeri, "Y")
              // piglet transfers between farrowing and weaning
              val k = rng.next(3)
              for (_ <- 0 until k) {
                trSeq += 1
                val code = Seq("160001", "160003", "160004")(rng.next(3))
                val wkd = b.plusDays(1 + rng.next(math.max(1,
                  java.time.temporal.ChronoUnit.DAYS.between(b, e).toInt - 2)))
                tr += Row(farm, pig, trSeq, parity, code, f(wkd),
                  1 + rng.next(3), 0, f(b), f(e), "Y")
              }
              lastDt = e
              t = e.plusDays(4 + rng.next(6))
            } else {
              t = endDate // pregnant at horizon end
            }
          } else {
            val fd = t.plusDays(18 + rng.next(10))
            if (fd.isBefore(endDate)) {
              seq += 1
              val sago = if (rng.next(2) == 0) "020001" else "020002"
              wk += Row(farm, pig, seq, f(fd), "F", parity, sago, "N", "Y")
              lastDt = fd
              t = fd.plusDays(1 + rng.next(5))
            } else t = endDate
          }
          parity += 1
        }
        val outDt =
          if (i == 30) "20250615" else if (i == 24) "20251105"
          else if (i == 23) "20251018" else Codes.AliveOutDt
        val outGubun =
          if (i == 30 || i == 24) "080001" else if (i == 23) "080002" else null
        val outReason =
          if (i == 30) null
          else if (i == 24) { if (farm == 1) "031003" else "031002" }
          // farm-2 death in the month window carries NO reason code —
          // exercises the null -> '031001' other-bucket in q69 output
          else if (i == 23) { if (farm == 2) null else "031002" } else null
        modon += Row(farm, pig, "010001", f(inDt), outDt, f(birth),
          if (lastDt == null) null else f(lastDt), 0, outGubun, outReason, "Y")
      }
    }
    // ---- farm 3: a sparse newly-onboarded herd. Deliberately ABSENT
    // from ins_conf, farm_config and plan_modon — every LEFT join that
    // carries defaults now exercises the missing-row branch (distinct
    // from farm 2's present-but-NULL config row), and the schedule
    // planners' inner joins must drop it without losing other farms.
    for (i <- 1 to 6) {
      val rng3 = new Lcg(3 * 7919L + i * 104729L)
      val pig = "P%03d".format(i)
      val birth = LocalDate.of(2024, 6, 1).plusDays(rng3.next(200))
      val inDt = birth.plusDays(230)
      if (i <= 3) {
        // gilts with no work rows at all (alert.py:108-117 anti-join)
        modon += Row(3, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
          null, 0, null, null, "Y")
      } else if (i == 4) {
        // mated once, still pregnant at the horizon
        wk += Row(3, pig, 1, "20250801", "G", 1, null, "N", "Y")
        modon += Row(3, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
          "20250801", 0, null, null, "Y")
      } else if (i == 5) {
        // weaned well past the return interval (GB_OVER shape on a
        // farm with no schedule templates at all)
        wk += Row(3, pig, 1, "20250520", "G", 1, null, "N", "Y")
        wk += Row(3, pig, 2, "20250912", "B", 1, null, "N", "Y")
        bun += Row(3, pig, "20250912", "B", 10, 1, 0, 12.9, "Y")
        wk += Row(3, pig, 3, "20251005", "E", 1, null, "N", "Y")
        eu += Row(3, pig, "20251005", "E", 9, 0, 23, 58.2, "N", "Y")
        modon += Row(3, pig, "010001", f(inDt), Codes.AliveOutDt, f(birth),
          "20251005", 0, null, null, "Y")
      } else {
        // culled inside the report week, no reason code
        wk += Row(3, pig, 1, "20250610", "G", 1, null, "N", "Y")
        modon += Row(3, pig, "010001", f(inDt), "20251106", f(birth),
          "20250610", 0, "080001", null, "Y")
      }
    }
    Tables(modon.toSeq, wk.toSeq, bun.toSeq, eu.toSeq, tr.toSeq)
  }

  /** Slaughter records (TM_LPD_DATA shape, data_loader.py:500-536;
    * NOTE dochuk_dt is 'yyyy-MM-dd' — the reference's odd-one-out
    * date format). Some days intentionally have zero rows (the
    * NULL-day contract, shipment.py:266-289). */
  lazy val lpd: Seq[Row] = {
    val out = ArrayBuffer[Row]()
    val qualities = Seq("1+", "1", "2", null)
    val sexes = Seq("암", "수", "-")
    for (farm <- 1 to 2) {
      val rng = new Lcg(farm * 52361L + 7)
      var d = LocalDate.of(2025, 10, 13)
      while (!d.isAfter(LocalDate.of(2025, 11, 9))) {
        val n = rng.next(4) // 0..3 head per day; 0 => empty day
        for (_ <- 0 until n) {
          out += Row(farm, d.format(DateTimeFormatterIsoLocal), // yyyy-MM-dd
            (850 + rng.next(150)) / 10.0, (140 + rng.next(120)) / 10.0,
            qualities(rng.next(4)), sexes(rng.next(3)), "Y")
        }
        d = d.plusDays(1)
      }
    }
    out.toSeq
  }
  private val DateTimeFormatterIsoLocal = DateTimeFormatter.ISO_LOCAL_DATE

  /** Tall hourly weather category rows (KMA forecast shape,
    * weather.py:741-982): TMP/POP/PTY per (grid, date, hour), plus
    * nowcast (src='NCT') rows for a morning slice that must override
    * the forecast (weather.py:1879-1918 precedence). */
  lazy val weatherHourly: Seq[Row] = {
    val out = ArrayBuffer[Row]()
    for ((nx, ny) <- Seq((60, 127), (98, 76))) {
      val rng = new Lcg(nx * 31L + ny)
      for (day <- Seq("20251108", "20251109"); h <- 0 until 24) {
        val t = "%02d00".format(h)
        out += Row(nx, ny, day, t, "TMP", (rng.next(250) - 50) / 10.0, "FCT")
        out += Row(nx, ny, day, t, "POP", rng.next(11) * 10.0, "FCT")
        out += Row(nx, ny, day, t, "PTY", rng.next(5).toDouble, "FCT")
      }
      for (h <- 0 until 7) { // nowcast slice on day 2
        val t = "%02d00".format(h)
        out += Row(nx, ny, "20251109", t, "TMP", (rng.next(250) - 30) / 10.0, "NCT")
        out += Row(nx, ny, "20251109", t, "PTY", rng.next(5).toDouble, "NCT")
      }
    }
    out.toSeq
  }

  /** Per-farm schedule task templates (TB_PLAN_MODON shape,
    * schedule.py:905-930): required sow status + day offset per task. */
  lazy val planModon: Seq[Row] = {
    val base = Seq(
      (1, "150005", "RECHECK", "STD1", "010006", 1),
      (2, "150005", "WEAN_MATE", "STD2", "010005", 5),
      (3, "150005", "GILT_MATE", "STD3", "010001", 240),
      (4, "150002", "FARROW_PREP", "STD4", "010002", 110),
      (5, "150003", "WEAN_PLAN", "STD5", "010003", 21),
      (6, "150003", "WEAN_LATE", "STD6", "010003", 28),
      (7, "150001", "PREG_CHECK3W", "STD7", "010002", 21),
      (8, "150004", "PRRS_VAC", "STD8", "010002", 30))
    for (farm <- 1 to 2; (seq, job, nm, std, st, pd) <- base)
      yield Row(farm, seq, job, nm, std, st, pd, "Y")
  }

  /** Per-farm schedule-method config (TS_INS_CONF shape,
    * schedule.py:138-210): JSON per job column; missing/empty tasks
    * mean "no tasks selected" (zero rows), a present list restricts
    * template SEQs. Farm 2's mating config has NO tasks key — the
    * documented JSON-degenerate case. */
  lazy val insConf: Seq[Row] = Seq(
    Row(1, """{"method":"modon","tasks":[1,2]}""",
      """{"method":"modon","tasks":[4]}""",
      """{"method":"modon","tasks":[7]}""",
      """{"method":"modon","tasks":[5,6]}""",
      """{"method":"modon","tasks":[-1]}"""),
    Row(2, """{"method":"modon"}""",
      """{"method":"farm"}""",
      """{"method":"farm"}""",
      """{"method":"modon","tasks":[6]}""",
      """{"method":"modon","tasks":[8]}"""))

  /** Per-farm numeric policy config (the CONFIG row the reference's
    * alert/schedule/rearing sections re-read from the sink,
    * config.py:257-293, with hard defaults 115/21/180/240/7/90 at
    * config.py:41-51). Farm 1 overrides gestation + weaning; farm 2
    * is all-NULL — the fall-back-to-default branch. In Spark the
    * read-back becomes an explicit broadcast-join DAG edge
    * (SURVEY §7.4 risk 6). */
  lazy val farmConfig: Seq[Row] = Seq(
    Row(1, 114, 28, 180, 240, 7, 90),
    Row(2, null, null, null, null, null, null))

  /** Tall productivity-API rows (productivity.py:297-373): STATCD =
    * PCODE(3) || column suffix(3), one value per (farm, statcd). */
  lazy val prodTall: Seq[Row] = {
    val out = ArrayBuffer[Row]()
    for (farm <- 1 to 2; pcode <- Seq("031", "043")) {
      val rng = new Lcg(farm * 881L + pcode.toInt)
      for (sfx <- 29 to 36) {
        out += Row(farm, pcode + "%03d".format(sfx), rng.next(200) / 10.0)
      }
    }
    out.toSeq
  }

  /** Raw ASOS daily response envelopes (weather.py:566-632): one
    * success payload with an empty-string field sprinkled in (the
    * reference's `if item.get(k):` guard), one quota-rejected
    * response (resultCode 22) that must parse to zero rows. */
  lazy val asosRaw: Seq[Row] = Seq(
    Row(108, 60, 127,
      """{"response":{"header":{"resultCode":"00","resultMsg":"NORMAL_SERVICE"},""" +
        """"body":{"items":{"item":[""" +
        """{"tm":"2025-11-01","avgTa":"12.3","maxTa":"18.1","minTa":"7.4","sumRn":"0.0","avgRhm":"65.2","avgWs":"2.3"},""" +
        """{"tm":"2025-11-02","avgTa":"11.8","maxTa":"16.9","minTa":"6.2","sumRn":"12.5","avgRhm":"78.9","avgWs":"3.1"},""" +
        """{"tm":"2025-11-03","avgTa":"","maxTa":"15.0","minTa":"5.1","sumRn":"","avgRhm":"70.4","avgWs":""}""" +
        """]},"totalCount":3}}}"""),
    Row(159, 98, 76,
      """{"response":{"header":{"resultCode":"22","resultMsg":"LIMITED_NUMBER_OF_SERVICE_REQUESTS_EXCEEDS_ERROR"},""" +
        """"body":{"items":{"item":[]},"totalCount":0}}}"""))

  /** Raw mid-range response pairs (weather.py:2026-2162): region
    * 11B* succeeds on both endpoints — taMin9 absent (temp_avg must
    * stay null but the row survives), rnSt6Pm absent (max takes the
    * AM side), rnSt7 fully absent (null probability), the full
    * weather-string keyword spread across wf3..wf10; region 11C*'s
    * ta response is quota-rejected, so it contributes no rows (the
    * reference skips a region only when BOTH endpoints fail, but a
    * temperature-less record is dropped by the no-temp rule anyway —
    * same outcome). */
  lazy val midRaw: Seq[Row] = Seq(
    Row("11B10101", "11B00000", "20251109",
      """{"response":{"header":{"resultCode":"00","resultMsg":"NORMAL_SERVICE"},""" +
        """"body":{"items":{"item":[{"taMin3":5.0,"taMax3":14.0,"taMin4":6.0,"taMax4":15.0,""" +
        """"taMin5":4.5,"taMax5":13.5,"taMin6":3.0,"taMax6":12.0,"taMin7":2.5,"taMax7":11.0,""" +
        """"taMin8":3.0,"taMax8":12.0,"taMax9":11.0,"taMin10":2.0,"taMax10":10.0}]},"totalCount":1}}}""",
      """{"response":{"header":{"resultCode":"00","resultMsg":"NORMAL_SERVICE"},""" +
        """"body":{"items":{"item":[{"wf3Am":"맑음","rnSt3Am":10,"rnSt3Pm":20,""" +
        """"wf4Am":"구름많음","rnSt4Am":30,"rnSt4Pm":20,"wf5Am":"흐리고 비","rnSt5Am":60,"rnSt5Pm":70,""" +
        """"wf6Am":"비/눈","rnSt6Am":40,"wf7Am":"소나기","wf8":"눈","rnSt8":70,""" +
        """"wf9":"흐림","rnSt9":30,"wf10":"맑음","rnSt10":10}]},"totalCount":1}}}"""),
    Row("11C20101", "11C20000", "20251109",
      """{"response":{"header":{"resultCode":"22","resultMsg":"LIMITED_NUMBER_OF_SERVICE_REQUESTS_EXCEEDS_ERROR"},""" +
        """"body":{"items":{"item":[]},"totalCount":0}}}""",
      """{"response":{"header":{"resultCode":"00","resultMsg":"NORMAL_SERVICE"},""" +
        """"body":{"items":{"item":[{"wf3Am":"맑음","rnSt3Am":10,"rnSt3Pm":0}]},"totalCount":1}}}"""))

  /** Region -> grid fan-out for the mid-range forecast
    * (weather.py:2164-2238 _get_target_grids_with_sigun). */
  lazy val midGrid: Seq[Row] = Seq(
    Row("11B10101", 60, 127), Row("11B10101", 61, 126), Row("11C20101", 98, 76))

  /** Daily rows already present from the short-term collection — the
    * rows the insert-only mid-range MERGE must NOT overwrite
    * (weather.py:2420-2443). 20251112/20251113 collide with mid
    * day-3/day-4 records. */
  lazy val weatherShort: Seq[Row] = Seq(
    Row(60, 127, "20251110", 10.5, 15.0, 6.0, 20, "cloudy", "3", "Y"),
    Row(60, 127, "20251111", 9.8, 14.2, 5.5, 30, "rainy", "4", "Y"),
    Row(60, 127, "20251112", 11.0, 16.0, 7.0, 10, "sunny", "1", "Y"),
    Row(61, 126, "20251113", 8.0, 13.0, 4.0, 0, "sunny", "1", "Y"))

  /** Weekly-report batch master rows (TS_INS_MASTER shape,
    * orchestrator.py:1087-1104): wall-clock window of the whole run.
    * Timestamps are fixture-fixed so ELAPSED_SEC is deterministic. */
  lazy val insMaster: Seq[Row] = Seq(
    Row(100, 2025, 45, "2025-11-12 01:00:00", "2025-11-12 01:23:45"),
    Row(101, 2025, 45, "2025-11-12 02:00:00", "2025-11-12 02:05:10"))

  /** Per-farm weekly-run outcomes (TS_INS_WEEK shape,
    * async_processor.py:282-307): COMPLETE farms carry the completion
    * stamp + the entropy the reference draws from secrets.token_hex
    * (injected by the caller here — fixture-fixed so the sha256 share
    * token is replayable); ERROR farms get neither token nor expiry. */
  lazy val insWeekRun: Seq[Row] = Seq(
    Row(100, 1, "COMPLETE", "20251112012301", "a1b2c3d4e5f60718"),
    Row(100, 2, "COMPLETE", "20251112012342", "0f1e2d3c4b5a6978"),
    Row(100, 3, "ERROR", null, null),
    Row(101, 1, "COMPLETE", "20251112020455", "deadbeefcafef00d"),
    Row(101, 2, "COMPLETE", "20251112020508", "0123456789abcdef"))

  /** Farm master rows (TA_FARM shape, farm_service.py:22-31): farm 2
    * has no country code (locale must default KOR) AND no principal
    * name (owner_nm must default '' — orchestrator.py
    * _create_week_records' farm.get('PRINCIPAL_NM', '')), farm 4 is
    * USE_YN='N' (excluded), farm 5 has no active-service row (inner
    * join drops it). */
  lazy val farm: Seq[Row] = Seq(
    Row(1, "Farm A", "Kim Minsu", "11000", "KOR", "Y"),
    Row(2, "Farm B", null, "26000", null, "Y"),
    Row(3, "Farm C", "Le Van An", "11000", "VNM", "Y"),
    Row(4, "Farm D", "Park Jiho", "48000", "KOR", "N"),
    Row(5, "Farm E", "Choi Eun", "28000", "KOR", "Y"),
    Row(6, "Farm F", "Jung Ho", "11000", "KOR", "Y"))

  /** Active-service rows (VW_INS_SERVICE_ACTIVE shape): farm 1 twice
    * (the view can emit duplicates — SERVICE_FARM_SQL is DISTINCT),
    * farm 2 with NULL reg_type (defaults AUTO), farm 3 with NULL
    * schedule group (defaults AM7), farm 6 MANUAL (excluded), farm 7
    * without a TA_FARM row (inner join drops it). */
  lazy val svcActive: Seq[Row] = Seq(
    Row(1, "AUTO", "AM7"),
    Row(1, "AUTO", "AM7"),
    Row(2, null, "PM2"),
    Row(3, "AUTO", null),
    Row(4, "AUTO", "AM7"),
    Row(6, "MANUAL", "AM7"),
    Row(7, "AUTO", "AM7"))

  /** System-config rows (TA_SYS_CONFIG shape, orchestrator.py:58-94):
    * one INS_SCHEDULE_YN value per seq — 'Y' production, 'T' test
    * (runs), 'N' disabled (skips). */
  lazy val sysConfig: Seq[Row] = Seq(
    Row(1, "Y"), Row(2, "T"), Row(3, "N"))

  // ---- schemas ----
  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val modonSchema: StructType = st(
    "farm_no" -> IntegerType, "pig_no" -> StringType, "status_cd" -> StringType,
    "in_dt" -> StringType, "out_dt" -> StringType, "birth_dt" -> StringType,
    "last_wk_dt" -> StringType, "in_sancha" -> IntegerType,
    "out_gubun_cd" -> StringType,
    "out_reason_cd" -> StringType, "use_yn" -> StringType)

  val modonWkSchema: StructType = st(
    "farm_no" -> IntegerType, "pig_no" -> StringType, "seq" -> IntegerType,
    "wk_dt" -> StringType, "wk_gubun" -> StringType, "sancha" -> IntegerType,
    "sago_gubun_cd" -> StringType, "daeri_yn" -> StringType, "use_yn" -> StringType)

  val bunmanSchema: StructType = st(
    "farm_no" -> IntegerType, "pig_no" -> StringType, "wk_dt" -> StringType,
    "wk_gubun" -> StringType, "silsan" -> IntegerType, "sasan" -> IntegerType,
    "mila" -> IntegerType, "saengsi_kg" -> DoubleType, "use_yn" -> StringType)

  val euSchema: StructType = st(
    "farm_no" -> IntegerType, "pig_no" -> StringType, "wk_dt" -> StringType,
    "wk_gubun" -> StringType, "dusu" -> IntegerType, "dusu_su" -> IntegerType,
    "ilryung" -> IntegerType, "total_kg" -> DoubleType, "daeri_yn" -> StringType,
    "use_yn" -> StringType)

  val transSchema: StructType = st(
    "farm_no" -> IntegerType, "pig_no" -> StringType, "seq" -> IntegerType,
    "sancha" -> IntegerType, "gubun_cd" -> StringType, "wk_dt" -> StringType,
    "dusu" -> IntegerType, "dusu_su" -> IntegerType, "bun_dt" -> StringType,
    "eu_dt" -> StringType, "use_yn" -> StringType)

  val lpdSchema: StructType = st(
    "farm_no" -> IntegerType, "dochuk_dt" -> StringType, "net_kg" -> DoubleType,
    "back_depth" -> DoubleType, "meat_quality" -> StringType,
    "sex_gubun" -> StringType, "use_yn" -> StringType)

  val weatherHourlySchema: StructType = st(
    "nx" -> IntegerType, "ny" -> IntegerType, "wk_date" -> StringType,
    "wk_time" -> StringType, "category" -> StringType, "val" -> DoubleType,
    "src" -> StringType)

  val prodTallSchema: StructType = st(
    "farm_no" -> IntegerType, "stat_cd" -> StringType, "val" -> DoubleType)

  val planModonSchema: StructType = st(
    "farm_no" -> IntegerType, "seq" -> IntegerType, "job_gubun_cd" -> StringType,
    "wk_nm" -> StringType, "std_cd" -> StringType, "modon_status_cd" -> StringType,
    "pass_day" -> IntegerType, "use_yn" -> StringType)

  val insConfSchema: StructType = st(
    "farm_no" -> IntegerType, "week_tw_gy" -> StringType,
    "week_tw_bm" -> StringType, "week_tw_im" -> StringType,
    "week_tw_eu" -> StringType, "week_tw_vc" -> StringType)

  val farmConfigSchema: StructType = st(
    "farm_no" -> IntegerType, "preg_days" -> IntegerType,
    "wean_days" -> IntegerType, "cull_age_days" -> IntegerType,
    "gilt_first_mate_days" -> IntegerType, "alert_days" -> IntegerType,
    "return_check_days" -> IntegerType)

  val asosRawSchema: StructType = st(
    "stn_id" -> IntegerType, "nx" -> IntegerType, "ny" -> IntegerType,
    "resp" -> StringType)

  val midRawSchema: StructType = st(
    "ta_reg_id" -> StringType, "land_reg_id" -> StringType,
    "base_date" -> StringType, "resp_ta" -> StringType,
    "resp_land" -> StringType)

  val midGridSchema: StructType = st(
    "ta_reg_id" -> StringType, "nx" -> IntegerType, "ny" -> IntegerType)

  val weatherShortSchema: StructType = st(
    "nx" -> IntegerType, "ny" -> IntegerType, "wk_date" -> StringType,
    "temp_avg" -> DoubleType, "temp_high" -> DoubleType,
    "temp_low" -> DoubleType, "rain_prob" -> IntegerType,
    "weather_cd" -> StringType, "sky_cd" -> StringType,
    "is_forecast" -> StringType)

  val insMasterSchema: StructType = st(
    "master_seq" -> IntegerType, "report_year" -> IntegerType,
    "report_week_no" -> IntegerType, "start_ts" -> StringType,
    "end_ts" -> StringType)

  val insWeekRunSchema: StructType = st(
    "master_seq" -> IntegerType, "farm_no" -> IntegerType,
    "status_cd" -> StringType, "complete_ts" -> StringType,
    "salt" -> StringType)

  val farmSchema: StructType = st(
    "farm_no" -> IntegerType, "farm_nm" -> StringType,
    "principal_nm" -> StringType, "sigun_cd" -> StringType,
    "country_code" -> StringType, "use_yn" -> StringType)

  val svcActiveSchema: StructType = st(
    "farm_no" -> IntegerType, "reg_type" -> StringType,
    "schedule_group_week" -> StringType)

  val sysConfigSchema: StructType = st(
    "seq" -> IntegerType, "ins_schedule_yn" -> StringType)

  private def toDf(s: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  def modonDf(s: SparkSession): DataFrame  = toDf(s, generated.modon, modonSchema)
  def modonWkDf(s: SparkSession): DataFrame = toDf(s, generated.modonWk, modonWkSchema)
  def bunmanDf(s: SparkSession): DataFrame = toDf(s, generated.bunman, bunmanSchema)
  def euDf(s: SparkSession): DataFrame     = toDf(s, generated.eu, euSchema)
  def transDf(s: SparkSession): DataFrame  = toDf(s, generated.trans, transSchema)
  def lpdDf(s: SparkSession): DataFrame    = toDf(s, lpd, lpdSchema)
  def weatherHourlyDf(s: SparkSession): DataFrame = toDf(s, weatherHourly, weatherHourlySchema)
  def prodTallDf(s: SparkSession): DataFrame = toDf(s, prodTall, prodTallSchema)
  def planModonDf(s: SparkSession): DataFrame = toDf(s, planModon, planModonSchema)
  def insConfDf(s: SparkSession): DataFrame = toDf(s, insConf, insConfSchema)
  def farmConfigDf(s: SparkSession): DataFrame = toDf(s, farmConfig, farmConfigSchema)
  def asosRawDf(s: SparkSession): DataFrame = toDf(s, asosRaw, asosRawSchema)
  def midRawDf(s: SparkSession): DataFrame = toDf(s, midRaw, midRawSchema)
  def midGridDf(s: SparkSession): DataFrame = toDf(s, midGrid, midGridSchema)
  def weatherShortDf(s: SparkSession): DataFrame = toDf(s, weatherShort, weatherShortSchema)
  def insMasterDf(s: SparkSession): DataFrame = toDf(s, insMaster, insMasterSchema)
  def insWeekRunDf(s: SparkSession): DataFrame = toDf(s, insWeekRun, insWeekRunSchema)
  def farmDf(s: SparkSession): DataFrame = toDf(s, farm, farmSchema)
  def svcActiveDf(s: SparkSession): DataFrame = toDf(s, svcActive, svcActiveSchema)
  def sysConfigDf(s: SparkSession): DataFrame = toDf(s, sysConfig, sysConfigSchema)

  // ---- SQL VALUES rendering (for the DuckDB oracle) ----
  private def litSql(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: Double => d.toString
    case x => x.toString
  }

  private def valuesCte(name: String, schema: StructType, rows: Seq[Row]): String = {
    val cols = schema.fields.map(_.name).mkString(", ")
    val vals = rows.map(r =>
      "(" + (0 until r.length).map(i => litSql(r.get(i))).mkString(",") + ")")
      .mkString(",\n")
    s"$name($cols) AS (VALUES\n$vals)"
  }

  /** WITH-clause text defining the requested fixture tables. */
  def withClause(tables: String*): String = {
    val g = generated
    val parts = tables.map {
      case "modon" => valuesCte("modon", modonSchema, g.modon)
      case "modon_wk" => valuesCte("modon_wk", modonWkSchema, g.modonWk)
      case "bunman" => valuesCte("bunman", bunmanSchema, g.bunman)
      case "eu" => valuesCte("eu", euSchema, g.eu)
      case "trans" => valuesCte("trans", transSchema, g.trans)
      case "lpd" => valuesCte("lpd", lpdSchema, lpd)
      case "weather_hourly" => valuesCte("weather_hourly", weatherHourlySchema, weatherHourly)
      case "prod_tall" => valuesCte("prod_tall", prodTallSchema, prodTall)
      case "plan_modon" => valuesCte("plan_modon", planModonSchema, planModon)
      case "ins_conf" => valuesCte("ins_conf", insConfSchema, insConf)
      case "farm_config" => valuesCte("farm_config", farmConfigSchema, farmConfig)
      case "asos_raw" => valuesCte("asos_raw", asosRawSchema, asosRaw)
      case "mid_raw" => valuesCte("mid_raw", midRawSchema, midRaw)
      case "mid_grid" => valuesCte("mid_grid", midGridSchema, midGrid)
      case "weather_short" => valuesCte("weather_short", weatherShortSchema, weatherShort)
      case "ins_master" => valuesCte("ins_master", insMasterSchema, insMaster)
      case "ins_week_run" => valuesCte("ins_week_run", insWeekRunSchema, insWeekRun)
      case "farm" => valuesCte("farm", farmSchema, farm)
      case "svc_active" => valuesCte("svc_active", svcActiveSchema, svcActive)
      case "sys_config" => valuesCte("sys_config", sysConfigSchema, sysConfig)
    }
    parts.mkString(",\n")
  }
}
