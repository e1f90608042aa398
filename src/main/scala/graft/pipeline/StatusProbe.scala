package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.domain.DateOps

/** The read-side API surface of the reference server
  * (`/root/reference/src/api/server.py`): the per-farm latest-report
  * status probe (:209-282) and the run-farm request validation
  * (:140-206). The compute an ACCEPTED request triggers is
  * WeeklyReportJob (q115/q120); what is modeled here is the
  * request/response surface itself — the top-1-by-period lookup and
  * the whitelist/eligibility/default rules — batched over every
  * farm/request in one pass, the way an engine serves them, instead
  * of one DB round trip per call.
  */
object StatusProbe {

  /** GET /api/etl/status/{farm_no}, batched over all farms: the
    * latest COMPLETE week report per farm. Eligibility is
    * reference-exact (server.py:236-252): the WEEK row and its MASTER
    * must both be COMPLETE — master status derives exactly as
    * WeeklyReportJob.finalize does (ERROR iff any farm in the batch
    * errored) — and "latest" is ORDER BY report_year DESC,
    * report_week_no DESC FETCH FIRST 1 ROWS ONLY. Here that probe is
    * ONE partial-agg max_by over a (year, week, master_seq) struct —
    * farms are many and rows-per-farm few, so the agg partial-combines
    * map-side; a per-farm window would re-sort every farm's history
    * instead. Farms with no eligible row surface exists_yn='N' (the
    * endpoint's not-found branch). */
  def latestComplete(weekRuns: DataFrame, master: DataFrame,
                     farms: DataFrame): DataFrame = {
    val fin = WeeklyReportJob.finalize(weekRuns, master)
    val eligible = fin
      .filter(col("status_cd") === "COMPLETE" && col("m_status_cd") === "COMPLETE")
      .join(master.select(col("master_seq"), col("report_year"),
        col("report_week_no")), "master_seq")
    val top1 = eligible.groupBy("farm_no").agg(
      max_by(
        struct(col("share_token"), col("token_expire_dt"),
          col("report_year"), col("report_week_no")),
        struct(col("report_year"), col("report_week_no"), col("master_seq"))).as("t"))
    farms.select(col("farm_no"), col("farm_nm"))
      .join(top1, Seq("farm_no"), "left")
      .select(col("farm_no"), col("farm_nm"),
        when(col("t").isNotNull, "Y").otherwise("N").as("exists_yn"),
        col("t.share_token").as("share_token"),
        col("t.report_year").as("report_year"),
        col("t.report_week_no").as("report_week_no"),
        col("t.token_expire_dt").as("token_expire_dt"))
  }

  /** POST /api/etl/run-farm request validation (server.py:140-206 +
    * the RunFarmRequest model): day_gb defaults WEEK and is
    * case-normalized (the status endpoint upper()s it), the whitelist
    * is WEEK/MONTH/QUARTER (else the 400 branch), only WEEK is
    * implemented (else the error response body), and the farm must
    * exist with USE_YN='Y'. ins_date defaults to `defaultInsDate` —
    * the reference defaults to "today", which a replayable surface
    * must pin. Accepted rows carry the lastWeekWindow period identity
    * (dt_from/dt_to/ISO year/week from last Sunday, ref
    * orchestrator.py:148-164) the run would use. Pure column ops end
    * to end — validation is a scan-time map over the request batch
    * plus one broadcast-sized farm join. */
  def validateRunRequests(requests: DataFrame, farms: DataFrame,
                          defaultInsDate: String): DataFrame = {
    val gb = upper(coalesce(col("day_gb"), lit("WEEK")))
    val base = DateOps.ymdToDate(coalesce(col("ins_date"), lit(defaultInsDate)))
    val ls = DateOps.lastSunday(base)
    val whitelisted = gb.isin("WEEK", "MONTH", "QUARTER")
    val status =
      when(!whitelisted, "error")
        .when(gb =!= "WEEK", "error")
        .when(col("use_yn").isNull || col("use_yn") =!= "Y", "error")
        .otherwise("success")
    val reason =
      when(!whitelisted, "invalid day_gb")
        .when(gb =!= "WEEK", "not implemented")
        .when(col("use_yn").isNull, "unknown farm")
        .when(col("use_yn") =!= "Y", "farm not active")
    requests.join(farms.select(col("farm_no"), col("use_yn")),
        Seq("farm_no"), "left")
      .select(col("req_id"), col("farm_no"), gb.as("day_gb"),
        status.as("status"), reason.as("reason"),
        when(status === "success", DateOps.isoYear(ls)).as("report_year"),
        when(status === "success", DateOps.isoWeek(ls)).as("week_no"),
        when(status === "success", DateOps.dateToYmd(date_sub(ls, 6))).as("dt_from"),
        when(status === "success", DateOps.dateToYmd(ls)).as("dt_to"))
  }
}
