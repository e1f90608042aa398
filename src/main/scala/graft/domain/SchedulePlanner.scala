package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reconstruction of the Oracle table function FN_MD_SCHEDULE_BSE_2020
  * in its template-driven "modon" mode (SURVEY §2.10 — the body is not
  * in the reference repo; semantics rebuilt from the call-site SQL at
  * schedule.py:588-644 and :876-1005 and the config loader at
  * :138-210):
  *
  *  - TS_INS_CONF carries one JSON per job type:
  *    {"method":"farm"|"modon","tasks":[seq...]}. method=modon with a
  *    non-empty tasks list restricts TB_PLAN_MODON templates to those
  *    SEQs; a missing/empty tasks key means "no tasks selected" (zero
  *    rows); '-1' means all templates (the function's default).
  *  - Each template names a required sow status (MODON_STATUS_CD) and
  *    a day offset (PASS_DAY). Candidate sows are those whose CURRENT
  *    status (latest work event, SowStatus) matches; the anchor date
  *    is the event that put them in that status (BIRTH_DT for gilts).
  *  - PASS_DT = anchor + PASS_DAY, kept within [sdt, edt]; the popup
  *    groups per template into CNT + D1..D7 day columns where D1
  *    absorbs overdue tasks (PASS_DT <= dt_from, the CASE at
  *    schedule.py:912-920).
  *
  * The farm-default mode lives in QueryCatalogDomain.q64/q65.
  */
object SchedulePlanner {

  /** Unpivot the per-job JSON config columns into
    * (farm_no, job_gubun_cd, method, tasks_csv). tasks_csv is the
    * seq_filter: null/'' = none, '-1' = all, '1,2' = subset. */
  def parseConf(conf: DataFrame, jobCols: Seq[(String, String)]): DataFrame =
    jobCols.map { case (colName, jobCd) =>
      conf.select(col("farm_no"), lit(jobCd).as("job_gubun_cd"),
        get_json_object(col(colName), "$.method").as("method"),
        regexp_replace(get_json_object(col(colName), "$.tasks"), "[\\[\\] ]", "")
          .as("tasks_csv"))
    }.reduce(_ unionByName _)

  /** Templates admitted by the config (method=modon + seq_filter). */
  def activeTemplates(templates: DataFrame, parsedConf: DataFrame): DataFrame =
    templates.filter(col("use_yn") === "Y")
      .join(parsedConf, Seq("farm_no", "job_gubun_cd"))
      .filter(col("method") === "modon" &&
        col("tasks_csv").isNotNull && col("tasks_csv") =!= "" &&
        (col("tasks_csv") === "-1" ||
          array_contains(split(col("tasks_csv"), ","), col("seq").cast("string"))))

  /** Schedule rows: admitted templates x matching-status sows,
    * PASS_DT = anchor + PASS_DAY within [sdt, edt] (dates). */
  def schedule(active: DataFrame, cohort: DataFrame,
               sdt: Column, edt: Column): DataFrame =
    active.join(cohort,
        active("farm_no") === cohort("farm_no") &&
          active("modon_status_cd") === cohort("status"), "inner")
      .drop(cohort("farm_no"))
      .withColumn("pass_dt", expr("date_add(anchor_date, pass_day)"))
      .filter(col("pass_dt").between(sdt, edt))

  /** Popup rows: every admitted template, LEFT JOINed to its schedule
    * counts (CNT + D1..D7, D1 absorbing overdue), sort_no per
    * (farm, job) by WK_NM — schedule.py:896-930. */
  def popup(active: DataFrame, sched: DataFrame, dtFrom: Column): DataFrame = {
    val day = datediff(col("pass_dt"), dtFrom) // 0 = Monday
    val aggCols = Seq(count(lit(1)).as("cnt"), count(when(day <= 0, 1)).as("d1")) ++
      (1 to 6).map(i => count(when(day === i, 1)).as(s"d${i + 1}"))
    val counts = sched.groupBy(col("farm_no"), col("job_gubun_cd"), col("wk_nm"))
      .agg(aggCols.head, aggCols.tail: _*)
    val w = Window.partitionBy(col("farm_no"), col("job_gubun_cd")).orderBy(col("wk_nm"))
    val outCols = Seq(col("farm_no"), col("job_gubun_cd"), col("sort_no"),
      col("wk_nm"), col("std_cd"), col("modon_status_cd"),
      concat(col("pass_day").cast("string"), lit("D")).as("pass_day_str"),
      coalesce(col("cnt"), lit(0L)).as("cnt")) ++
      (1 to 7).map(i => coalesce(col(s"d$i"), lit(0L)).as(s"d$i"))
    active.select("farm_no", "job_gubun_cd", "seq", "wk_nm", "std_cd",
        "modon_status_cd", "pass_day").distinct()
      .join(counts, Seq("farm_no", "job_gubun_cd", "wk_nm"), "left")
      .withColumn("sort_no", row_number().over(w))
      .select(outCols: _*)
  }
}
