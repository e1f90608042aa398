package graft.domain

/** Status / work / accident code constants of the reference domain
  * (/root/reference/src/weekly/data_loader.py:28-46; culling.py:34-43;
  * accident.py:31-47). */
object Codes {
  // sow status (STATUS_CD)
  val StatusHubo   = "010001" // gilt / candidate
  val StatusImsin  = "010002" // pregnant (after mating G)
  val StatusPoyu   = "010003" // lactating (after farrowing B)
  val StatusDaeri  = "010004" // foster mother
  val StatusEumo   = "010005" // weaned (after weaning E)
  val StatusJaebal = "010006" // return-to-estrus (accident F + 020001)
  val StatusYusan  = "010007" // abortion (accident F + 020002)
  val StatusDopesa = "010008" // dead/culled

  // work types (WK_GUBUN)
  val WkGyobae = "G" // mating
  val WkBunman = "B" // farrowing
  val WkEu     = "E" // weaning
  val WkSago   = "F" // accident
  val WkRemove = "Z" // removal (excluded from latest-record scans)

  // accident subtype (SAGO_GUBUN_CD on work rows)
  val SagoJaebal = "020001" // return
  val SagoYusan  = "020002" // abortion

  // piglet transfer types (TB_MODON_JADON_TRANS.GUBUN_CD)
  val TransLoss     = "160001" // nursing loss (sdotae)
  val TransReturn   = "160002"
  val TransFosterIn = "160003" // ji
  val TransFosterOut= "160004" // jc

  // out types (TB_MODON.OUT_GUBUN_CD)
  val OutCull = "080001"
  val OutDeath = "080002"

  val AliveOutDt = "99991231" // sentinel: still in herd
}
