package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST JSON response parsing (SURVEY S3/S4): the reference fans out
  * HTTP GETs on the driver and parses `response.body.items.item[]`
  * (KMA envelope, weather.py:423-739) or `data[]` (productivity API,
  * productivity.py:99-146) into rows. The fetch stays driver-side
  * (I/O-bound, keyed, rate-limited); parsing is a Spark transform so
  * replayed/recorded payloads scale: one row per raw response,
  * from_json + explode to tall rows.
  */
object JsonIngest {

  /** KMA forecast envelope item: category/value keyed by grid+time. */
  val kmaItemSchema: StructType = StructType(Seq(
    StructField("baseDate", StringType), StructField("baseTime", StringType),
    StructField("category", StringType), StructField("fcstDate", StringType),
    StructField("fcstTime", StringType), StructField("fcstValue", StringType),
    StructField("nx", IntegerType), StructField("ny", IntegerType)))

  /** The common KMA envelope around any item payload: every endpoint
    * (short-term grid, ASOS station, mid-range region) wraps its items
    * in response.header/resultCode + response.body.items.item[]. */
  private def envelopeOf(item: StructType): StructType = StructType(Seq(
    StructField("response", StructType(Seq(
      StructField("header", StructType(Seq(
        StructField("resultCode", StringType), StructField("resultMsg", StringType)))),
      StructField("body", StructType(Seq(
        StructField("items", StructType(Seq(
          StructField("item", ArrayType(item))))),
        StructField("totalCount", IntegerType)))))))))

  private val kmaEnvelope: StructType = envelopeOf(kmaItemSchema)

  /** Parse raw KMA response strings -> tall item rows, keeping only
    * successful responses (resultCode '00' — the key-rotation retry
    * codes 22/99 are filtered out, weather.py:700-724). */
  def parseKma(responses: DataFrame, jsonCol: String): DataFrame =
    responses
      .withColumn("__env", from_json(col(jsonCol), kmaEnvelope))
      .filter(col("__env.response.header.resultCode") === "00")
      .select(explode(col("__env.response.body.items.item")).as("it"))
      .select(col("it.*"))

  /** Productivity API: {"data": [{"__STATCD__": "...", "__VAL__": n}]}
    * -> (stat_cd, val) rows (productivity.py:297-373). */
  def parseProductivity(responses: DataFrame, jsonCol: String, farmCol: String): DataFrame = {
    val schema = StructType(Seq(StructField("data", ArrayType(StructType(Seq(
      StructField("__STATCD__", StringType), StructField("__VAL__", DoubleType)))))))
    responses
      .withColumn("__p", from_json(col(jsonCol), schema))
      .select(col(farmCol), explode(col("__p.data")).as("d"))
      .select(col(farmCol), col("d.__STATCD__").as("stat_cd"), col("d.__VAL__").as("val"))
  }

  // ---------------------------------------------------------------- ASOS (station observations)

  /** ASOS daily item (weather.py:566-632 fetch, :1064-1151 parse):
    * stnId-keyed observed values, all strings in the payload. */
  val asosDailyItemSchema: StructType = StructType(Seq(
    StructField("tm", StringType), StructField("avgTa", StringType),
    StructField("maxTa", StringType), StructField("minTa", StringType),
    StructField("sumRn", StringType), StructField("avgRhm", StringType),
    StructField("avgWs", StringType)))

  /** ASOS hourly item (weather.py:493-564 fetch, :1153-1237 parse). */
  val asosHourlyItemSchema: StructType = StructType(Seq(
    StructField("tm", StringType), StructField("ta", StringType),
    StructField("rn", StringType), StructField("hm", StringType),
    StructField("ws", StringType), StructField("wd", StringType)))

  private def round1(c: Column): Column = floor(c * 10 + 0.5) / 10
  /** Reference guard `if item.get(k):` — absent/empty values stay
    * null (an empty string casts to null double in both engines). */
  private def d1(c: Column): Column = round1(c.try_cast("double"))

  /** ASOS daily responses -> observed daily records: wk_date from the
    * dashed tm, half-up 1-decimal temps/rain/wind, int humidity,
    * rainy iff sumRn > 0, IS_FORECAST='N' (weather.py:1064-1151).
    * `keyCols` (e.g. nx/ny of the station's mapped grid) pass through. */
  def parseAsosDaily(responses: DataFrame, jsonCol: String,
                     keyCols: Seq[String]): DataFrame =
    responses
      .withColumn("__env", from_json(col(jsonCol), envelopeOf(asosDailyItemSchema)))
      .filter(col("__env.response.header.resultCode") === "00")
      .select(keyCols.map(col) :+ explode(col("__env.response.body.items.item")).as("it"): _*)
      .withColumn("wk_date", regexp_replace(col("it.tm"), "-", ""))
      .filter(col("wk_date").isNotNull && col("wk_date") =!= "")
      .select(keyCols.map(col) ++ Seq(
        col("wk_date"),
        d1(col("it.avgTa")).as("temp_avg"),
        d1(col("it.maxTa")).as("temp_high"),
        d1(col("it.minTa")).as("temp_low"),
        d1(col("it.sumRn")).as("rain_amt"),
        col("it.avgRhm").try_cast("double").cast("int").as("humidity"),
        d1(col("it.avgWs")).as("wind_speed"),
        when(col("it.sumRn").try_cast("double") > 0, "rainy").otherwise("sunny").as("weather_cd"),
        lit("N").as("is_forecast")): _*)

  /** ASOS hourly responses -> observed hourly records: tm "YYYY-MM-DD
    * HH:MM" split into wk_date/wk_time, rain defaults 0
    * (weather.py:1153-1237). */
  def parseAsosHourly(responses: DataFrame, jsonCol: String,
                      keyCols: Seq[String]): DataFrame =
    responses
      .withColumn("__env", from_json(col(jsonCol), envelopeOf(asosHourlyItemSchema)))
      .filter(col("__env.response.header.resultCode") === "00")
      .select(keyCols.map(col) :+ explode(col("__env.response.body.items.item")).as("it"): _*)
      .filter(col("it.tm").isNotNull && col("it.tm").contains(" "))
      .select(keyCols.map(col) ++ Seq(
        regexp_replace(split(col("it.tm"), " ").getItem(0), "-", "").as("wk_date"),
        substring(regexp_replace(split(col("it.tm"), " ").getItem(1), ":", ""), 1, 4).as("wk_time"),
        col("it.ta").try_cast("double").as("temp"),
        coalesce(col("it.rn").try_cast("double"), lit(0.0)).as("rain_amt"),
        col("it.hm").try_cast("double").cast("int").as("humidity"),
        col("it.ws").try_cast("double").as("wind_speed"),
        col("it.wd").try_cast("double").cast("int").as("wind_dir"),
        when(col("it.rn").try_cast("double") > 0, "rainy").otherwise("sunny").as("weather_cd"),
        lit("N").as("is_forecast")): _*)

  // ---------------------------------------------------------------- mid-range (region forecasts)

  /** Mid-range temperature item: taMin3..10/taMax3..10 per region
    * (weather.py:2026-2096 getMidTa). */
  val midTaItemSchema: StructType = StructType(
    (3 to 10).flatMap(d => Seq(
      StructField(s"taMin$d", DoubleType), StructField(s"taMax$d", DoubleType))))

  /** Mid-range land item: wf{3..7}Am / wf{8..10} sky strings,
    * rnSt{3..7}{Am,Pm} / rnSt{8..10} rain probabilities
    * (weather.py:2098-2162 getMidLandFcst). */
  val midLandItemSchema: StructType = StructType(
    (3 to 7).flatMap(d => Seq(
      StructField(s"wf${d}Am", StringType),
      StructField(s"rnSt${d}Am", IntegerType),
      StructField(s"rnSt${d}Pm", IntegerType))) ++
      (8 to 10).flatMap(d => Seq(
        StructField(s"wf$d", StringType), StructField(s"rnSt$d", IntegerType))))

  /** Mid-range responses hold ONE item per region: surface it as a
    * struct column (`ta` / `land`) next to the passthrough keys. */
  def parseMidTa(responses: DataFrame, jsonCol: String, keyCols: Seq[String]): DataFrame =
    responses
      .withColumn("__env", from_json(col(jsonCol), envelopeOf(midTaItemSchema)))
      .filter(col("__env.response.header.resultCode") === "00")
      .select(keyCols.map(col) :+
        element_at(col("__env.response.body.items.item"), 1).as("ta"): _*)

  def parseMidLand(responses: DataFrame, jsonCol: String, keyCols: Seq[String]): DataFrame =
    responses
      .withColumn("__env", from_json(col(jsonCol), envelopeOf(midLandItemSchema)))
      .filter(col("__env.response.header.resultCode") === "00")
      .select(keyCols.map(col) :+
        element_at(col("__env.response.body.items.item"), 1).as("land"): _*)

  /** Mid-range weather string -> weather_cd, exactly the reference's
    * keyword precedence (weather.py:2337-2366 _parse_mid_weather):
    * precipitation first (rain+snow / snow / rain or shower), then
    * sky state; empty/unknown defaults to cloudy. */
  def midWeatherCd(wf: Column): Column =
    when(wf.isNull || wf === "", "cloudy")
      .when(wf.contains("비") && wf.contains("눈"), "rain_snow")
      .when(wf.contains("눈"), "snow")
      .when(wf.contains("비") || wf.contains("소나기"), "rainy")
      .when(wf.contains("맑음"), "sunny")
      .when(wf.contains("구름많음") || wf.contains("구름 많음"), "cloudy")
      .when(wf.contains("흐림") || wf.contains("흐리고"), "overcast")
      .otherwise("cloudy")

  /** weather_cd -> SKY code ('1' clear, '3' cloudy, '4' overcast or
    * any precipitation — weather.py:2368-2386). */
  def skyCdOf(weatherCd: Column): Column =
    when(weatherCd === "sunny", "1")
      .when(weatherCd === "cloudy", "3")
      .otherwise("4")

  /** Explode joined mid-range (ta + land + grid) rows into daily
    * records for day offsets +3..+10 (weather.py:2240-2343):
    * TEMP_LOW/HIGH raw from taMin/taMax, TEMP_AVG = half-up
    * 1-decimal mean when both present; RAIN_PROB = max(am, pm) for
    * days 3-7 (either side may be absent), rnSt{d} for 8-10; weather
    * from wf{d}Am (3-7) / wf{d} (8-10); rows with NO temperature are
    * skipped (the reference keeps short-term data for those dates).
    * Input columns: nx, ny, base_date (yyyyMMdd), ta struct, land
    * struct. Output is IS_FORECAST='Y' daily rows. */
  def midDailyRecords(df: DataFrame): DataFrame = {
    val entries = (3 to 10).map { d =>
      val rainProb =
        if (d <= 7) {
          val am = col(s"land.rnSt${d}Am"); val pm = col(s"land.rnSt${d}Pm")
          when(am.isNotNull || pm.isNotNull,
            greatest(coalesce(am, lit(0)), coalesce(pm, lit(0))))
            .otherwise(lit(null).cast("int"))
        } else col(s"land.rnSt$d")
      val wf = if (d <= 7) col(s"land.wf${d}Am") else col(s"land.wf$d")
      struct(lit(d).as("off"),
        col(s"ta.taMin$d").as("temp_low"), col(s"ta.taMax$d").as("temp_high"),
        rainProb.as("rain_prob"), wf.as("wf"))
    }
    df.select(col("nx"), col("ny"), col("base_date"),
        explode(array(entries: _*)).as("e"))
      .filter(col("e.temp_low").isNotNull || col("e.temp_high").isNotNull)
      .select(col("nx"), col("ny"),
        date_format(date_add(to_date(col("base_date"), "yyyyMMdd"), col("e.off")),
          "yyyyMMdd").as("wk_date"),
        when(col("e.temp_low").isNotNull && col("e.temp_high").isNotNull,
          round1((col("e.temp_low") + col("e.temp_high")) / 2)).as("temp_avg"),
        col("e.temp_high").as("temp_high"), col("e.temp_low").as("temp_low"),
        col("e.rain_prob").as("rain_prob"),
        midWeatherCd(col("e.wf")).as("weather_cd"),
        skyCdOf(midWeatherCd(col("e.wf"))).as("sky_cd"),
        lit("Y").as("is_forecast"))
  }

  // ---------------------------------------------------------------- fetch decisions

  /** TMN/TMX second-fetch predicate (weather.py:1359-1362): the min/
    * max temperature categories are only published in the 02:00 and
    * 05:00 bulletins — any other base time needs an extra 05:00
    * fetch to fill them. */
  def needTmnTmx(fcstBaseTime: String): Boolean =
    fcstBaseTime != "0200" && fcstBaseTime != "0500"

  /** Merge the 05:00 TMN/TMX values into daily rows that are missing
    * them (weather.py:1395-1420): `extra` is parseKma output of the
    * 05:00 fetch; only TMN/TMX categories contribute, and an existing
    * non-null value is NEVER overwritten. */
  def fillTmnTmx(daily: DataFrame, extra: DataFrame): DataFrame = {
    val tt = extra.filter(col("category").isin("TMN", "TMX"))
      .groupBy(col("nx"), col("ny"), col("fcstDate").as("wk_date"))
      .agg(max(when(col("category") === "TMN", col("fcstValue").cast("double"))).as("__tmn"),
        max(when(col("category") === "TMX", col("fcstValue").cast("double"))).as("__tmx"))
    daily.join(tt, Seq("nx", "ny", "wk_date"), "left")
      .withColumn("tmn", coalesce(col("tmn"), col("__tmn")))
      .withColumn("tmx", coalesce(col("tmx"), col("__tmx")))
      .drop("__tmn", "__tmx")
  }

  /** Completeness gate (weather.py:1460-1478): all-or-nothing —
    * returns true only when every expected key produced rows. */
  def isComplete(parsed: DataFrame, keyCols: Seq[String], expected: Long): Boolean =
    parsed.select(keyCols.map(col): _*).distinct().count() == expected

  /** Key-rotation decision (api_key_manager.py:40, weather.py:455,698):
    * rotate to the next API key on auth/quota HTTP statuses or the
    * KMA envelope codes for invalid/expired keys (22) and quota (99).
    * Pure function — the driver-side fetch loop consults it; no
    * network here. */
  def shouldRotateKey(httpStatus: Int, resultCode: Option[String]): Boolean =
    httpStatus == 401 || httpStatus == 403 || httpStatus == 429 ||
      resultCode.exists(c => c == "22" || c == "99")

  /** Retry decision: transient server/network statuses retry on the
    * SAME key (bounded by the caller's attempt budget); rotation
    * cases retry on the next key; 2xx with a success code does not
    * retry. */
  def shouldRetry(httpStatus: Int, resultCode: Option[String]): Boolean =
    shouldRotateKey(httpStatus, resultCode) ||
      httpStatus >= 500 || httpStatus == 408
}
