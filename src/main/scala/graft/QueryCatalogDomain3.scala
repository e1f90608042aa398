package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.domain._
import graft.ops.{LatestRecord, PrevNext}

/** Domain queries, part 3: literal SEQ±1 semantics, the alert matrix,
  * and the config section's rearing rate. */
object QueryCatalogDomain3 {
  import QueryCatalog.Q
  import Fixtures.{BaseDate, DtTo}

  // ---------------------------------------------------------------- literal SEQ±1
  /** The reference's exact SEQ±1 self-join (data_loader.py:299-327) on
    * a FILTERED log — gaps yield NULL neighbours even when an
    * earlier/later row exists (SURVEY §7.4 risk 4; lag/lead would
    * bridge the gap and be WRONG). Accidents are filtered out here to
    * manufacture real gaps. */
  val q74PrevNextSeq: Q = (s, d) => {
    val wk = Fixtures.modonWkDf(s)
      .filter(col("use_yn") === "Y" && col("wk_gubun") =!= "F")
      .select("farm_no", "pig_no", "seq", "wk_dt", "wk_gubun")
    PrevNext.viaSelfJoin(wk, Seq("farm_no", "pig_no"), "seq", Seq("wk_gubun"))
      .select("farm_no", "pig_no", "seq", "wk_gubun", "prev_wk_gubun", "next_wk_gubun")
      .orderBy("farm_no", "pig_no", "seq")
  }

  private lazy val q74Sql =
    s"""WITH ${Fixtures.withClause("modon_wk")},
       |wk AS (SELECT farm_no, pig_no, seq, wk_dt, wk_gubun
       |       FROM modon_wk WHERE use_yn = 'Y' AND wk_gubun <> 'F')
       |SELECT a.farm_no, a.pig_no, a.seq, a.wk_gubun,
       |       p.wk_gubun AS prev_wk_gubun, n.wk_gubun AS next_wk_gubun
       |FROM wk a
       |LEFT JOIN wk p ON p.farm_no = a.farm_no AND p.pig_no = a.pig_no AND p.seq = a.seq - 1
       |LEFT JOIN wk n ON n.farm_no = a.farm_no AND n.pig_no = a.pig_no AND n.seq = a.seq + 1
       |ORDER BY a.farm_no, a.pig_no, a.seq""".stripMargin

  // ---------------------------------------------------------------- alert matrix
  /** Alert types x delay buckets (alert.py:108-204): no-work sows
    * (anti-join branch), overdue farrowing (pregnant past gestation),
    * overdue mating (weaned past return interval), bucketed
    * ~3/4-7/8-14/15+ into fixed columns. */
  val q75Alerts: Q = (s, d) => {
    val base = DateOps.ymdToDate(lit(BaseDate))
    val alive = Fixtures.modonDf(s)
      .filter(col("use_yn") === "Y" && col("out_dt") === Codes.AliveOutDt)
    val last = LatestRecord.viaAgg(
      Fixtures.modonWkDf(s)
        .filter(col("use_yn") === "Y" && col("wk_dt") <= BaseDate && col("wk_gubun") =!= "Z"),
      keys = Seq("farm_no", "pig_no"), ord = Seq("wk_dt", "seq"))
      .select(col("farm_no"), col("pig_no"), col("wk_dt"), col("wk_gubun"),
        col("sago_gubun_cd"), col("daeri_yn"))
    val j = alive.join(last, Seq("farm_no", "pig_no"), "left")
      .withColumn("st", SowStatus.status(col("wk_gubun"), col("sago_gubun_cd"),
        col("daeri_yn"), col("status_cd")))
    val noWk = j.filter(col("wk_gubun").isNull)
      .select(col("farm_no"), lit("NO_WK").as("alert_type"),
        datediff(base, DateOps.ymdToDate(col("in_dt"))).as("delay"))
    val bmOver = j.filter(col("st") === "010002" &&
        datediff(base, DateOps.ymdToDate(col("wk_dt"))) > 115)
      .select(col("farm_no"), lit("BM_OVER").as("alert_type"),
        (datediff(base, DateOps.ymdToDate(col("wk_dt"))) - 115).as("delay"))
    val gbOver = j.filter(col("st") === "010005" &&
        datediff(base, DateOps.ymdToDate(col("wk_dt"))) > 7)
      .select(col("farm_no"), lit("GB_OVER").as("alert_type"),
        (datediff(base, DateOps.ymdToDate(col("wk_dt"))) - 7).as("delay"))
    noWk.unionByName(bmOver).unionByName(gbOver)
      .groupBy("farm_no", "alert_type")
      .agg(count(when(col("delay") <= 3, 1)).as("d3"),
        count(when(col("delay") >= 4 && col("delay") <= 7, 1)).as("d7"),
        count(when(col("delay") >= 8 && col("delay") <= 14, 1)).as("d14"),
        count(when(col("delay") >= 15, 1)).as("d15up"))
      .orderBy("farm_no", "alert_type")
  }

  private lazy val q75Sql =
    s"""WITH ${Fixtures.withClause("modon", "modon_wk")},
       |lastwk AS (
       |  SELECT farm_no, pig_no, wk_dt, wk_gubun, sago_gubun_cd, daeri_yn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY farm_no, pig_no
       |                                 ORDER BY wk_dt DESC, seq DESC) AS rn
       |    FROM modon_wk
       |    WHERE use_yn = 'Y' AND wk_dt <= '$BaseDate' AND wk_gubun <> 'Z')
       |  WHERE rn = 1),
       |j AS (
       |  SELECT m.farm_no, m.pig_no, m.in_dt, w.wk_dt, w.wk_gubun,
       |         ${SowStatus.sqlCase} AS st
       |  FROM modon m
       |  LEFT JOIN lastwk w ON w.farm_no = m.farm_no AND w.pig_no = m.pig_no
       |  WHERE m.use_yn = 'Y' AND m.out_dt = '99991231'),
       |u AS (
       |  SELECT farm_no, 'NO_WK' AS alert_type,
       |         date_diff('day', strptime(in_dt, '%Y%m%d')::DATE,
       |                   strptime('$BaseDate', '%Y%m%d')::DATE) AS delay
       |  FROM j WHERE wk_gubun IS NULL
       |  UNION ALL
       |  SELECT farm_no, 'BM_OVER',
       |         date_diff('day', strptime(wk_dt, '%Y%m%d')::DATE,
       |                   strptime('$BaseDate', '%Y%m%d')::DATE) - 115
       |  FROM j WHERE st = '010002'
       |    AND date_diff('day', strptime(wk_dt, '%Y%m%d')::DATE,
       |                  strptime('$BaseDate', '%Y%m%d')::DATE) > 115
       |  UNION ALL
       |  SELECT farm_no, 'GB_OVER',
       |         date_diff('day', strptime(wk_dt, '%Y%m%d')::DATE,
       |                   strptime('$BaseDate', '%Y%m%d')::DATE) - 7
       |  FROM j WHERE st = '010005'
       |    AND date_diff('day', strptime(wk_dt, '%Y%m%d')::DATE,
       |                  strptime('$BaseDate', '%Y%m%d')::DATE) > 7)
       |SELECT farm_no, alert_type,
       |  COUNT(CASE WHEN delay <= 3 THEN 1 END) AS d3,
       |  COUNT(CASE WHEN delay BETWEEN 4 AND 7 THEN 1 END) AS d7,
       |  COUNT(CASE WHEN delay BETWEEN 8 AND 14 THEN 1 END) AS d14,
       |  COUNT(CASE WHEN delay >= 15 THEN 1 END) AS d15up
       |FROM u GROUP BY 1, 2 ORDER BY farm_no, alert_type""".stripMargin

  // ---------------------------------------------------------------- rearing rate
  /** Config-section rearing rate: AVG of monthly (shipped / weaned)
    * ratios over 6 calendar months — explicitly avg-of-ratios, NOT
    * ratio-of-sums (processors/config.py:174-221); months with zero
    * weanings are skipped via NULLIF like Oracle AVG skips NULLs. */
  val q76Rearing: Q = (s, d) => {
    import s.implicits._
    val months = Seq("202506", "202507", "202508", "202509", "202510", "202511")
    val wean = Fixtures.euDf(s).filter(col("use_yn") === "Y")
      .groupBy(col("farm_no"), substring(col("wk_dt"), 1, 6).as("mo"))
      .agg(sum(coalesce(col("dusu"), lit(0)) + coalesce(col("dusu_su"), lit(0)))
        .cast("long").as("wean_heads"))
    val ship = Fixtures.lpdDf(s).filter(col("use_yn") === "Y")
      .groupBy(col("farm_no"),
        substring(regexp_replace(col("dochuk_dt"), "-", ""), 1, 6).as("mo"))
      .agg(count(lit(1)).as("ship_cnt"))
    val spine = Fixtures.modonDf(s).select("farm_no").distinct()
      .crossJoin(months.toDF("mo"))
    val monthly = spine
      .join(wean, Seq("farm_no", "mo"), "left")
      .join(ship, Seq("farm_no", "mo"), "left")
      .withColumn("ratio",
        coalesce(col("ship_cnt"), lit(0L)).cast("double") * 100.0 /
          nullif(coalesce(col("wean_heads"), lit(0L)).cast("double"), lit(0.0)))
    monthly.groupBy("farm_no")
      .agg((sum(col("ratio").cast(org.apache.spark.sql.types.DecimalType(18, 8))).cast("double")
          / count(col("ratio"))).as("rearing_rate"),
        count(col("ratio")).as("n_months_used"))
      .orderBy("farm_no")
  }

  private lazy val q76Sql = {
    val mvals = Seq("202506", "202507", "202508", "202509", "202510", "202511")
      .map(m => s"('$m')").mkString(",")
    s"""WITH ${Fixtures.withClause("eu", "lpd")},
       |months(mo) AS (VALUES $mvals),
       |wean AS (SELECT farm_no, substring(wk_dt, 1, 6) AS mo,
       |                CAST(SUM(COALESCE(dusu,0) + COALESCE(dusu_su,0)) AS BIGINT) AS wean_heads
       |         FROM eu WHERE use_yn = 'Y' GROUP BY 1, 2),
       |ship AS (SELECT farm_no, substring(replace(dochuk_dt, '-', ''), 1, 6) AS mo,
       |                COUNT(*) AS ship_cnt
       |         FROM lpd WHERE use_yn = 'Y' GROUP BY 1, 2),
       |farms AS (SELECT DISTINCT farm_no FROM eu),
       |monthly AS (
       |  SELECT f.farm_no, m.mo,
       |         CAST(COALESCE(s.ship_cnt, 0) AS DOUBLE) * 100.0
       |           / NULLIF(CAST(COALESCE(w.wean_heads, 0) AS DOUBLE), 0.0) AS ratio
       |  FROM farms f CROSS JOIN months m
       |  LEFT JOIN wean w ON w.farm_no = f.farm_no AND w.mo = m.mo
       |  LEFT JOIN ship s ON s.farm_no = f.farm_no AND s.mo = m.mo)
       |SELECT farm_no,
       |  CAST(SUM(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE) / COUNT(ratio) AS rearing_rate,
       |  COUNT(ratio) AS n_months_used
       |FROM monthly GROUP BY farm_no ORDER BY farm_no""".stripMargin
  }

  // ----------------------------------------------------------------
  val all: Map[String, Q] = Map(
    "q74_prevnext_seq_literal" -> q74PrevNextSeq,
    "q75_alert_matrix" -> q75Alerts,
    "q76_rearing_rate" -> q76Rearing,
  )

  lazy val oracle: Map[String, String] = Map(
    "q74_prevnext_seq_literal" -> q74Sql,
    "q75_alert_matrix" -> q75Sql,
    "q76_rearing_rate" -> q76Sql,
  )
}
