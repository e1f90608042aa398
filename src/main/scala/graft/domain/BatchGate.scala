package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch gating + farm targeting — the reference scheduler's front
  * door: the INS_SCHEDULE_YN system gate
  * (src/weekly/orchestrator.py:58-94) and the schedule-group /
  * include / exclude targeting (orchestrator.py:992-1040) over the
  * central service-farm query (src/common/farm_service.py:22-31
  * SERVICE_FARM_SQL). */
object BatchGate {

  /** The INS_SCHEDULE_YN decision: 'Y' (production) or 'T' (test
    * mode — currently identical behavior, reserved for divergence)
    * enable the batch; anything else — including a missing config or
    * a read error, the reference's fail-safe — skips it. Pure and
    * driver-side by design: this gates whether ANY Spark job is
    * submitted, it is not a dataset decision. */
  def scheduleEnabled(yn: Option[String]): Boolean =
    yn.exists(v => v == "Y" || v == "T")

  /** Service-target farms (SERVICE_FARM_SQL semantics): farms with
    * USE_YN='Y' joined to active-service rows with
    * NVL(REG_TYPE,'AUTO')='AUTO', DISTINCT (the view can emit
    * duplicate service rows), locale defaulting to KOR and schedule
    * group to AM7; then the optional include / exclude id lists and
    * the AM7/PM2 schedule-group filter.
    *
    * Scale shape: the include/exclude/group predicates are plain
    * pushable filters — against a partitioned or bucketed farm store
    * they prune at the scan, and the farm master is dimension-sized,
    * so the join broadcasts under AQE. The distinct rides the same
    * hash distribution as the join output. */
  def targetFarms(farm: DataFrame, svcActive: DataFrame,
                  include: Seq[Int] = Nil, exclude: Seq[Int] = Nil,
                  scheduleGroup: Option[String] = None): DataFrame = {
    val svc = svcActive
      .filter(coalesce(col("reg_type"), lit("AUTO")) === "AUTO")
      .select(col("farm_no"),
        coalesce(col("schedule_group_week"), lit("AM7")).as("schedule_group"))
    val base = farm.filter(col("use_yn") === "Y")
      .join(svc, "farm_no")
      // principal_nm rides along RAW (SERVICE_FARM_SQL selects it
      // unmodified); the ''-default is applied at TS_INS_WEEK insert
      // time (WeeklyReportJob.createWeekRecords), like the reference
      .select(col("farm_no"), col("farm_nm"), col("principal_nm"),
        col("sigun_cd"),
        coalesce(col("country_code"), lit("KOR")).as("locale"),
        col("schedule_group"))
      .distinct()
    val inc = if (include.nonEmpty) base.filter(col("farm_no").isin(include: _*)) else base
    val exc = if (exclude.nonEmpty) inc.filter(!col("farm_no").isin(exclude: _*)) else inc
    scheduleGroup.fold(exc)(g => exc.filter(col("schedule_group") === g))
  }
}
