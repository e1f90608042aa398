package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reimplementation of the Oracle server-side function
  * SF_GET_MODONGB_STATUS (body not in the reference repo; semantics
  * reconstructed from call sites + constants — SURVEY §2.10,
  * /root/reference/src/weekly/data_loader.py:243-253 (call with latest
  * work row), :28-46 (code constants), :651-667 (NULL -> 010001
  * fallback), processors/schedule.py:524,545 (G->010002,
  * B->010003/010004 by DAERI_YN).
  *
  * State machine over the LATEST work event of a sow:
  *   no work row        -> base STATUS_CD, else gilt 010001
  *   G (mating)         -> pregnant   010002
  *   B (farrowing)      -> foster     010004 if DAERI_YN='Y' else lactating 010003
  *   E (weaning)        -> weaned     010005
  *   F + sago 020001    -> return     010006
  *   F + sago 020002    -> abortion   010007
  *   anything else      -> base STATUS_CD, else 010001
  */
object SowStatus {
  import Codes._

  def status(wkGubun: Column, sagoGubunCd: Column, daeriYn: Column,
             baseStatusCd: Column): Column = {
    val fallback = coalesce(baseStatusCd, lit(StatusHubo))
    when(wkGubun.isNull, fallback)
      .when(wkGubun === WkGyobae, StatusImsin)
      .when(wkGubun === WkBunman,
        when(coalesce(daeriYn, lit("N")) === "Y", StatusDaeri).otherwise(StatusPoyu))
      .when(wkGubun === WkEu, StatusEumo)
      .when(wkGubun === WkSago && sagoGubunCd === SagoJaebal, StatusJaebal)
      .when(wkGubun === WkSago && sagoGubunCd === SagoYusan, StatusYusan)
      .otherwise(fallback)
  }

  /** The same state machine as a SQL CASE fragment (for the DuckDB
    * oracle), over columns named wk_gubun/sago_gubun_cd/daeri_yn/
    * status_cd. Keep in lockstep with `status`. */
  val sqlCase: String =
    """CASE WHEN wk_gubun IS NULL THEN COALESCE(status_cd, '010001')
      |     WHEN wk_gubun = 'G' THEN '010002'
      |     WHEN wk_gubun = 'B' THEN (CASE WHEN COALESCE(daeri_yn, 'N') = 'Y' THEN '010004' ELSE '010003' END)
      |     WHEN wk_gubun = 'E' THEN '010005'
      |     WHEN wk_gubun = 'F' AND sago_gubun_cd = '020001' THEN '010006'
      |     WHEN wk_gubun = 'F' AND sago_gubun_cd = '020002' THEN '010007'
      |     ELSE COALESCE(status_cd, '010001') END""".stripMargin
}
