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

  test("ASOS daily parse: rounding, empty-field guards, rain flag, rejected response") {
    import org.apache.spark.sql.functions._
    val out = JsonIngest.parseAsosDaily(
      graft.domain.Fixtures.asosRawDf(spark), "resp", Seq("nx", "ny"))
    val rows = out.orderBy("wk_date").collect()
    assert(rows.length == 3, "resultCode 22 response must contribute zero rows")
    val d1 = rows(0) // 2025-11-01: sumRn "0.0" -> sunny, rain_amt 0.0
    assert(d1.getAs[String]("wk_date") == "20251101")
    assert(d1.getAs[Double]("temp_avg") == 12.3 && d1.getAs[Double]("temp_high") == 18.1)
    assert(d1.getAs[String]("weather_cd") == "sunny" && d1.getAs[Double]("rain_amt") == 0.0)
    val d2 = rows(1) // rain day
    assert(d2.getAs[String]("weather_cd") == "rainy" && d2.getAs[Double]("rain_amt") == 12.5)
    assert(d2.getAs[Int]("humidity") == 78)
    val d3 = rows(2) // empty avgTa/sumRn/avgWs stay null; humidity truncates
    assert(d3.isNullAt(d3.fieldIndex("temp_avg")) && d3.isNullAt(d3.fieldIndex("rain_amt")))
    assert(d3.isNullAt(d3.fieldIndex("wind_speed")) && d3.getAs[Int]("humidity") == 70)
    assert(d3.getAs[String]("weather_cd") == "sunny")
  }

  test("ASOS hourly parse: tm splits to date/time, rain defaults 0") {
    val resp =
      """{"response":{"header":{"resultCode":"00","resultMsg":"OK"},"body":{"items":{"item":[
        |{"tm":"2025-11-01 09:00","ta":"8.3","rn":"","hm":"71.0","ws":"1.8","wd":"270"},
        |{"tm":"2025-11-01 10:00","ta":"9.9","rn":"0.5","hm":"69.0","ws":"2.2","wd":"180"}
        |]},"totalCount":2}}}""".stripMargin.replace("\n", "")
    val out = JsonIngest.parseAsosHourly(
      Seq((108, resp)).toDF("stn_id", "json"), "json", Seq("stn_id"))
      .orderBy("wk_time").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("wk_date") == "20251101" &&
      out(0).getAs[String]("wk_time") == "0900")
    assert(out(0).getAs[Double]("rain_amt") == 0.0 &&
      out(0).getAs[String]("weather_cd") == "sunny")
    assert(out(1).getAs[Double]("rain_amt") == 0.5 &&
      out(1).getAs[String]("weather_cd") == "rainy")
    assert(out(1).getAs[Int]("wind_dir") == 180)
  }

  test("mid-range weather keyword precedence (weather.py:2337-2366)") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      ("맑음", "sunny"), ("구름많음", "cloudy"), ("구름 많음", "cloudy"),
      ("흐림", "overcast"), ("흐리고 비", "rainy"), ("소나기", "shower_rainy"),
      ("비/눈", "rain_snow"), ("눈", "snow"), ("", "cloudy"), (null, "cloudy"),
      ("요상한 날씨", "cloudy"))
    val df = cases.toDF("wf", "want")
      .withColumn("got", JsonIngest.midWeatherCd(col("wf")))
    df.collect().foreach { r =>
      val want = if (r.getString(1) == "shower_rainy") "rainy" else r.getString(1)
      assert(r.getAs[String]("got") == want, s"wf=${r.getString(0)}")
    }
    // sky mapping: clear 1, cloudy 3, anything else 4
    val sky = df.select(col("wf"), JsonIngest.skyCdOf(col("got")).as("sky")).collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getString(1)).toMap
    assert(sky("맑음") == "1" && sky("구름많음") == "3" && sky("눈") == "4" && sky("흐림") == "4")
  }

  test("TMN/TMX second-fetch predicate + fill-if-missing merge (weather.py:1359-1420)") {
    import org.apache.spark.sql.functions._
    // only the 02:00 and 05:00 bulletins carry TMN/TMX
    assert(!JsonIngest.needTmnTmx("0200") && !JsonIngest.needTmnTmx("0500"))
    assert(Seq("0800", "1100", "1400", "1700", "2000", "2300").forall(JsonIngest.needTmnTmx))
    // daily rows missing TMN get filled from the 05:00 fetch; present values win
    val daily = Seq(
      (60, 127, "20251109", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(12.0)),
      (60, 127, "20251110", java.lang.Double.valueOf(1.5), null.asInstanceOf[java.lang.Double]))
      .toDF("nx", "ny", "wk_date", "tmn", "tmx")
    val extra = Seq(
      (60, 127, "20251109", "TMN", "2.0"), (60, 127, "20251109", "TMX", "99.0"),
      (60, 127, "20251110", "TMX", "13.5"), (60, 127, "20251110", "POP", "40"))
      .toDF("nx", "ny", "fcstDate", "category", "fcstValue")
    val got = JsonIngest.fillTmnTmx(daily, extra).orderBy("wk_date").collect()
    assert(got(0).getAs[Double]("tmn") == 2.0, "missing TMN filled from 05:00 fetch")
    assert(got(0).getAs[Double]("tmx") == 12.0, "existing TMX must NOT be overwritten")
    assert(got(1).getAs[Double]("tmn") == 1.5 && got(1).getAs[Double]("tmx") == 13.5)
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
