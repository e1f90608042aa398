package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo helpers of the weather pipeline, as pure column expressions
  * (codegen'd — no UDF): KMA Lambert conformal conic 5 km grid
  * (/root/reference/src/collectors/weather.py:279-326) and Haversine
  * distance (:142-148). Constants are the published KMA grid spec. */
object GeoOps {
  private val RE = 6371.00877 // earth radius km
  private val GRID = 5.0      // grid spacing km
  private val SLAT1 = 30.0
  private val SLAT2 = 60.0
  private val OLON = 126.0
  private val OLAT = 38.0
  private val XO = 43
  private val YO = 136

  private val DEGRAD = math.Pi / 180.0
  private val re = RE / GRID
  private val slat1 = SLAT1 * DEGRAD
  private val slat2 = SLAT2 * DEGRAD
  private val olon = OLON * DEGRAD
  private val olat = OLAT * DEGRAD
  // projection constants are scalars — precompute on the driver
  private val sn = math.log(math.cos(slat1) / math.cos(slat2)) /
    math.log(math.tan(math.Pi * 0.25 + slat2 * 0.5) / math.tan(math.Pi * 0.25 + slat1 * 0.5))
  private val sf = math.pow(math.tan(math.Pi * 0.25 + slat1 * 0.5), sn) * math.cos(slat1) / sn
  private val ro = re * sf / math.pow(math.tan(math.Pi * 0.25 + olat * 0.5), sn)

  private def ra(lat: Column): Column =
    lit(re * sf) / pow(tan(lit(math.Pi * 0.25) + lat * DEGRAD * 0.5), lit(sn))

  private def theta(lon: Column): Column = {
    val t = lon * DEGRAD - olon
    val t1 = when(t > math.Pi, t - 2.0 * math.Pi).otherwise(t)
    when(t1 < -math.Pi, t1 + 2.0 * math.Pi).otherwise(t1) * sn
  }

  /** Grid X of (lat, lon): floor(ra*sin(theta) + XO + 0.5). */
  def gridNx(lat: Column, lon: Column): Column =
    floor(ra(lat) * sin(theta(lon)) + XO + 0.5).cast("int")

  /** Grid Y of (lat, lon): floor(ro - ra*cos(theta) + YO + 0.5). */
  def gridNy(lat: Column, lon: Column): Column =
    floor(lit(ro) - ra(lat) * cos(theta(lon)) + YO + 0.5).cast("int")

  /** Haversine great-circle distance in km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val a = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(6371.0) * lit(2.0) * asin(sqrt(a))
  }

  /** The same formulas as DuckDB SQL fragments over columns lat/lon
    * (for the oracle). Constants inlined at full double precision. */
  def gridSql: (String, String) = {
    val raE = s"(${re * sf} / pow(tan(${math.Pi * 0.25} + lat * $DEGRAD * 0.5), $sn))"
    val tRaw = s"(lon * $DEGRAD - $olon)"
    val t1 = s"(CASE WHEN $tRaw > ${math.Pi} THEN $tRaw - ${2.0 * math.Pi} ELSE $tRaw END)"
    val t2 = s"(CASE WHEN $t1 < ${-math.Pi} THEN $t1 + ${2.0 * math.Pi} ELSE $t1 END)"
    val thetaE = s"($t2 * $sn)"
    (s"CAST(floor($raE * sin($thetaE) + $XO + 0.5) AS INT)",
      s"CAST(floor($ro - $raE * cos($thetaE) + $YO + 0.5) AS INT)")
  }

  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""(6371.0 * 2.0 * asin(sqrt(
       |  pow(sin(radians($lat2 - $lat1) / 2), 2)
       |  + cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2))))""".stripMargin
}
