package graft

import graft.sources.JsonIngest

class JsonIngestSpec extends SparkSpec {
  import spark.implicits._

  private val okResponse =
    """{"response":{"header":{"resultCode":"00","resultMsg":"OK"},
      |"body":{"items":{"item":[
      |{"baseDate":"20251109","baseTime":"0500","category":"TMP","fcstDate":"20251109","fcstTime":"0600","fcstValue":"3.5","nx":60,"ny":127},
      |{"baseDate":"20251109","baseTime":"0500","category":"POP","fcstDate":"20251109","fcstTime":"0600","fcstValue":"30","nx":60,"ny":127}
      |]},"totalCount":2}}}""".stripMargin.replace("\n", "")

  private val failResponse =
    """{"response":{"header":{"resultCode":"22","resultMsg":"LIMITED"},"body":{"items":{"item":[]},"totalCount":0}}}"""

  test("KMA envelope parses to tall rows; failed result codes dropped") {
    val df = Seq(okResponse, failResponse).toDF("json")
    val out = JsonIngest.parseKma(df, "json")
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("category")).toSet == Set("TMP", "POP"))
    assert(rows.forall(_.getAs[Int]("nx") == 60))
  }

  test("productivity data[] parses to (farm, stat_cd, val)") {
    val resp = """{"data":[{"__STATCD__":"031029","__VAL__":4.5},{"__STATCD__":"031030","__VAL__":2.0}]}"""
    val df = Seq((101, resp)).toDF("farm_no", "json")
    val out = JsonIngest.parseProductivity(df, "json", "farm_no").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((101, "031029", 4.5), (101, "031030", 2.0)))
  }

  test("completeness gate is all-or-nothing (weather.py:1460-1478)") {
    val parsed = JsonIngest.parseKma(Seq(okResponse).toDF("json"), "json")
    assert(JsonIngest.isComplete(parsed, Seq("nx", "ny"), expected = 1))
    assert(!JsonIngest.isComplete(parsed, Seq("nx", "ny"), expected = 2))
  }

  test("key rotation on auth/quota statuses and KMA codes 22/99") {
    import JsonIngest.{shouldRetry, shouldRotateKey}
    assert(Seq(401, 403, 429).forall(shouldRotateKey(_, None)))
    assert(shouldRotateKey(200, Some("22")) && shouldRotateKey(200, Some("99")))
    assert(!shouldRotateKey(200, Some("00")) && !shouldRotateKey(500, None))
    // 5xx/timeout retries the SAME key; success does not retry
    assert(shouldRetry(503, None) && shouldRetry(408, None))
    assert(!shouldRetry(200, Some("00")))
  }
}
