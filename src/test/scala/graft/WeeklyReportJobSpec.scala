package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.WeeklyReportJob

class WeeklyReportJobSpec extends SparkSpec {

  test("assembles all sections into the SUB schema and one summary row per farm") {
    val out = Files.createTempDirectory("graft_week").toString
    WeeklyReportJob.run(spark, out)

    val sub = spark.read.parquet(s"$out/week_sub")
    val byGubun = sub.groupBy("gubun").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGubun("MODON") == 30)  // 3 farms x 10 parity rows
    assert(byGubun("GB") == 24)     // 3 farms x 8 buckets (farm 3 all-zero)
    assert(byGubun("SHIP") == 14)   // 2 farms x 7 days (farm 3 has no slaughter rows)
    assert(byGubun.contains("DOPE"))

    val summary = spark.read.parquet(s"$out/week_summary")
    assert(summary.count() == 3)    // farm 3 present with NULL section values
    val farm1 = summary.filter(col("farm_no") === 1).collect()(0)
    assert(farm1.getAs[Long]("sow_total") > 0)
    assert(farm1.getAs[Long]("bm_cnt") >= 0)

    // rerun is idempotent (partition overwrite, not append)
    val before = sub.count()
    WeeklyReportJob.run(spark, out)
    assert(spark.read.parquet(s"$out/week_sub").count() == before)
  }

  test("chained weeks: week N's deltas come from the WRITTEN store, not recomputation") {
    val out = Files.createTempDirectory("graft_chain").toString
    // honest W1, then a TAMPERED copy (farm 1's count inflated by
    // 100). If week 2 recomputed week 1 instead of reading the store,
    // the tamper would be invisible — so its visibility in W2's
    // prev/delta columns proves the store read path is live.
    val p1 = WeeklyReportJob.runWeekStep(spark, out, "W1",
      "20251013", "20251019", None)
    spark.read.parquet(p1)
      .withColumn("bm_cnt", when(col("farm_no") === 1, col("bm_cnt") + 100)
        .otherwise(col("bm_cnt")))
      .write.mode("overwrite").parquet(s"$out/wk_W1T")
    val p2 = WeeklyReportJob.runWeekStep(spark, out, "W2",
      "20251020", "20251026", Some(s"$out/wk_W1T"))
    val honest1 = spark.read.parquet(p1)
      .filter(col("farm_no") === 1).head().getAs[Long]("bm_cnt")
    val w2farm1 = spark.read.parquet(p2).filter(col("farm_no") === 1).head()
    assert(w2farm1.getAs[Long]("prev_bm_cnt") == honest1 + 100,
      "week 2 must carry the WRITTEN (tampered) week-1 value")
    assert(w2farm1.getAs[Long]("delta_bm_cnt") ==
      w2farm1.getAs[Long]("bm_cnt") - (honest1 + 100))
    // and the full 4-week chain equals the in-memory lag() algebra
    // (the q201 oracle's form): the store round trip is faithful
    val chain = WeeklyReportJob.runChainedWeeks(spark, s"$out/full", Seq(
      ("W1", "20251013", "20251019"), ("W2", "20251020", "20251026"),
      ("W3", "20251027", "20251102"), ("W4", "20251103", "20251109")))
    val lagForm = graft.QueryCatalogDomain3.q79WeekDeltas(spark, "")
      .select("farm_no", "week_no", "bm_cnt", "prev_bm_cnt", "delta_bm_cnt")
    val mismatches = chain
      .select("farm_no", "week_no", "bm_cnt", "prev_bm_cnt", "delta_bm_cnt")
      .exceptAll(lagForm).count()
    assert(mismatches == 0, "written chain must equal the lag() history")
  }

  test("re-init + rerun reproduces byte-identical week/week_sub/master frames (SURVEY §5)") {
    // the reference's core operational guarantee: a week can be
    // re-initialized (--init-week) and re-run, and the rerun is a
    // deterministic replay — identical outputs, not merely identical
    // counts. Clock/entropy are injected: week records carry literal
    // (year, week, dt_from, dt_to), and the report sections derive
    // only from fixture frames.
    import graft.pipeline.ReInit
    import graft.domain.Fixtures
    def weekRun(): (Seq[String], Seq[String], Seq[String]) = {
      val out = Files.createTempDirectory("graft_rerun").toString
      WeeklyReportJob.run(spark, out)
      val master = WeeklyReportJob.periodMaster(spark, 100, "WEEK", "20251112")
      val week = WeeklyReportJob.createWeekRecords(
        graft.domain.BatchGate.targetFarms(
          Fixtures.farmDf(spark), Fixtures.svcActiveDf(spark)),
        100, 2025, 45, "20251103", "20251109")
      def dump(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      (dump(master), dump(week), dump(spark.read.parquet(s"$out/week_sub")))
    }
    val (m1, w1, s1) = weekRun()
    // re-init the week: every week row under the doomed master falls,
    // the master cascades (no farm list) — a clean slate, proven
    val week1 = WeeklyReportJob.createWeekRecords(
      graft.domain.BatchGate.targetFarms(
        Fixtures.farmDf(spark), Fixtures.svcActiveDf(spark)),
      100, 2025, 45, "20251103", "20251109")
    val master1 = WeeklyReportJob.periodMaster(spark, 100, "WEEK", "20251112")
    val empty = week1.limit(0)
    val cut = ReInit.reInit(ReInit.Frames(master1, week1, empty, empty),
      2025, 45, None, testMode = true, initAll = false, initWeek = true)
    assert(cut.master.count() == 0 && cut.week.count() == 0,
      "init-week must clear the doomed master and its week rows")
    // rerun after the wipe: byte-identical to the first run
    val (m2, w2, s2) = weekRun()
    assert(m1 == m2, "master frame must replay byte-identically")
    assert(w1 == w2, "week records must replay byte-identically")
    assert(s1 == s2, "week_sub rows must replay byte-identically")
  }

  test("finalize: tokens only for COMPLETE farms, master ERROR iff any farm errored") {
    val out = WeeklyReportJob.finalize(
        graft.domain.Fixtures.insWeekRunDf(spark),
        graft.domain.Fixtures.insMasterDf(spark))
      .orderBy("master_seq", "farm_no").collect()
    assert(out.length == 5)
    val f1 = out(0) // master 100, farm 1, COMPLETE
    // token = sha256("100-1-20251112012301-a1b2c3d4e5f60718"), lowercase hex
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val want = md.digest("100-1-20251112012301-a1b2c3d4e5f60718".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(f1.getAs[String]("share_token") == want)
    assert(f1.getAs[String]("token_expire_dt") == "20251118") // run day + 6 = 7 days
    assert(f1.getAs[String]("m_status_cd") == "ERROR") // farm 3 errored
    assert(f1.getAs[Long]("target_cnt") == 3 && f1.getAs[Long]("complete_cnt") == 2 &&
      f1.getAs[Long]("error_cnt") == 1)
    assert(f1.getAs[Long]("elapsed_sec") == 23 * 60 + 45)
    val f3 = out(2) // the errored farm: no token, no expiry
    assert(f3.getAs[String]("status_cd") == "ERROR" &&
      f3.isNullAt(f3.fieldIndex("share_token")) &&
      f3.isNullAt(f3.fieldIndex("token_expire_dt")))
    val m101 = out(3) // clean master
    assert(m101.getAs[String]("m_status_cd") == "COMPLETE" &&
      m101.getAs[Long]("error_cnt") == 0 && m101.getAs[Long]("elapsed_sec") == 310)
  }

  test("a failing section logs an ERROR row with its message; later sections still run") {
    val log = Files.createTempDirectory("graft_joblog").toString
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    val (ok, err) = WeeklyReportJob.runSections(spark, log,
      masterSeq = 100, farmNo = 7, year = 2025, weekNo = 45,
      sections = Seq(
        "MODON" -> (() => { ran += "MODON" }),
        "SHIP" -> (() => { ran += "SHIP"; sys.error("slaughter API returned 0 rows") }),
        "GB" -> (() => { ran += "GB" })))
    assert((ok, err) == (2, 1))
    assert(ran.toSeq == Seq("MODON", "SHIP", "GB"), "sections after the failure must run")
    val rows = spark.read.parquet(log).orderBy("proc_nm").collect()
    assert(rows.length == 3)
    val ship = rows.find(_.getAs[String]("proc_nm") == "SHIP").get
    assert(ship.getAs[String]("status_cd") == "ERROR")
    assert(ship.getAs[String]("error_msg").contains("slaughter API returned 0 rows"))
    assert(ship.getAs[Int]("farm_no") == 7 && ship.getAs[Int]("report_week_no") == 45)
    assert(rows.filter(_.getAs[String]("status_cd") == "SUCCESS").forall(r =>
      r.isNullAt(r.fieldIndex("error_msg"))))
  }

  test("summary section values agree with the standalone section queries") {
    val s = WeeklyReportJob.summary(spark).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("eu_dusu")).toMap
    val q63 = QueryCatalogDomain.q63Weaning(spark, "").collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("sum_eudusu")).toMap
    // farm 3 has no weaning rows in the window: NULL in the summary's
    // left join, absent from the standalone section — compare common
    q63.foreach { case (farm, v) => assert(s(farm) == v) }
    assert(s.get(3).forall(_ == 0L), "farm 3's NULL unboxes to 0")
  }

  test("periodMaster: one identity row per DAY_GB mode, window conventions per mode") {
    def row(dayGb: String, base: String) =
      WeeklyReportJob.periodMaster(spark, 7, dayGb, base).collect()(0)
    val wk = row("WEEK", "20251112")
    assert(wk.getString(1) == "WEEK" && wk.getInt(2) == 2025 && wk.getInt(3) == 45)
    assert(wk.getString(4) == "20251103" && wk.getString(5) == "20251109")
    val mo = row("MON", "20251112")
    assert(mo.getInt(2) == 2025 && mo.getInt(3) == 10 &&
      mo.getString(4) == "20251001" && mo.getString(5) == "20251031")
    val qt = row("QT", "20260215") // Q1 base -> Q4 of the previous year
    assert(qt.getInt(2) == 2025 && qt.getInt(3) == 4 &&
      qt.getString(4) == "20251001" && qt.getString(5) == "20251231")
    intercept[IllegalArgumentException] {
      WeeklyReportJob.periodMaster(spark, 7, "DAY", "20251112")
    }
  }

  test("batch gate: disabled INS_SCHEDULE_YN skips the run before any job is submitted") {
    import graft.domain.BatchGate
    assert(BatchGate.scheduleEnabled(Some("Y")), "'Y' is production mode")
    assert(BatchGate.scheduleEnabled(Some("T")), "'T' is test mode (runs)")
    assert(!BatchGate.scheduleEnabled(Some("N")))
    assert(!BatchGate.scheduleEnabled(Some("X")))
    assert(!BatchGate.scheduleEnabled(None), "missing config fails safe")
    val out = java.nio.file.Files.createTempDirectory("gate_skip").toString
    assert(!WeeklyReportJob.runIfEnabled(spark, out, Some("N")), "gate must report the skip")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/week_summary")),
      "a skipped run must write nothing")
    assert(WeeklyReportJob.runIfEnabled(spark, out, Some("T")), "'T' runs the batch")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/week_summary")))
  }
}
