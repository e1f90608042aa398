package graft

import org.apache.spark.sql.functions._
import graft.domain.{Codes, SowStatus}

class SowStatusSpec extends SparkSpec {
  import spark.implicits._

  private def eval(wk: String, sago: String, daeri: String, base: String): String =
    Seq((wk, sago, daeri, base)).toDF("wk", "sago", "daeri", "base")
      .select(SowStatus.status(col("wk"), col("sago"), col("daeri"), col("base")))
      .collect()(0).getString(0)

  test("state machine matches reconstructed SF_GET_MODONGB_STATUS semantics") {
    assert(eval("G", null, "N", null) == Codes.StatusImsin)
    assert(eval("B", null, "N", null) == Codes.StatusPoyu)
    assert(eval("B", null, "Y", null) == Codes.StatusDaeri)
    assert(eval("E", null, "N", null) == Codes.StatusEumo)
    assert(eval("F", Codes.SagoJaebal, "N", null) == Codes.StatusJaebal)
    assert(eval("F", Codes.SagoYusan, "N", null) == Codes.StatusYusan)
  }

  test("no work row falls back to base status, then gilt") {
    assert(eval(null, null, null, "010005") == "010005")
    assert(eval(null, null, null, null) == Codes.StatusHubo)
    // F with unknown sago code also falls through to base
    assert(eval("F", "029999", "N", "010002") == "010002")
    assert(eval("F", null, "N", null) == Codes.StatusHubo)
  }

  test("B with null DAERI_YN defaults to lactating (NVL to 'N')") {
    assert(eval("B", null, null, null) == Codes.StatusPoyu)
  }
}
