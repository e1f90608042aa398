package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private val kmaEnvelope: StructType = StructType(Seq(
    StructField("response", StructType(Seq(
      StructField("header", StructType(Seq(
        StructField("resultCode", StringType), StructField("resultMsg", StringType)))),
      StructField("body", StructType(Seq(
        StructField("items", StructType(Seq(
          StructField("item", ArrayType(kmaItemSchema))))),
        StructField("totalCount", IntegerType)))))))))

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
