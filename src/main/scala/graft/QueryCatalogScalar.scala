package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.core.Num._
import graft.domain.DateOps

/** Scalar-function surface (SURVEY §2.8): dates, strings, rounding,
  * JSON, hashing, NVL/DECODE conditionals. */
object QueryCatalogScalar {
  import QueryCatalog.Q

  // ---------------------------------------------------------------- dates
  /** Date kit (SURVEY §2.8 Date, ref base.py:376-418 add_days/diff;
    * orchestrator.py:148-164 ISO year/week + last-week window).
    * ISO year via the Thursday trick: year(d + (3 - isoWeekday)) —
    * identical to DuckDB's isoyear by construction. */
  val q24Dates: Q = (s, d) => {
    val od = to_date(col("o_orderdate"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        date_format(od, "yyyyMMdd").as("ymd"),
        weekofyear(od).as("iso_week"),
        year(date_add(od, lit(3) - weekday(od))).as("iso_year"),
        date_add(od, 30).as("plus30"),
        datediff(to_date(lit("2002-01-01")), od).as("days_to_2002"),
        last_day(od).as("month_end"))
      .orderBy("o_orderkey")
  }

  private val q24Sql =
    """SELECT o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS ymd,
      |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
      |  CAST(isoyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_year,
      |  CAST(o_orderdate AS DATE) + 30 AS plus30,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end
      |FROM orders WHERE o_orderkey % 97 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- strings
  /** String kit (SURVEY §2.8 String, ref data_loader.py:585 SUBSTR
    * prefix match; schedule.py:1081-1110 LISTAGG; config.py:177-185
    * REPLACE). LISTAGG == sorted-distinct array_join. */
  val q25Strings: Q = (s, d) =>
    Tables.part(s, d)
      .groupBy(substring(col("p_brand"), 7, 2).as("brand_sfx"))
      .agg(
        count(lit(1)).as("n_parts"),
        array_join(array_sort(collect_set(col("p_type"))), ",").as("types_listagg"),
        count(when(col("p_type").startsWith("PROMO"), lit(1))).as("n_promo"),
        max(regexp_replace(col("p_name"), "[aeiou ]", "")).as("max_squashed_name"))
      .orderBy("brand_sfx")

  private val q25Sql =
    """SELECT substring(p_brand, 7, 2) AS brand_sfx,
      |  COUNT(*) AS n_parts,
      |  string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types_listagg,
      |  COUNT(CASE WHEN p_type LIKE 'PROMO%' THEN 1 END) AS n_promo,
      |  MAX(regexp_replace(p_name, '[aeiou ]', '', 'g')) AS max_squashed_name
      |FROM part GROUP BY 1 ORDER BY brand_sfx""".stripMargin

  // ---------------------------------------------------------------- round
  /** Oracle ROUND half-up parity on exact decimals (SURVEY §2.8 Math,
    * ref shipment.py:24-33 oracle_round — the reference had to fight
    * Python's banker's rounding; Spark and DuckDB both round decimal
    * HALF_UP/away-from-zero for positives). floor/ceil/abs included. */
  val q26Round: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 199 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(dec2(col("l_extendedprice")), 1).cast("double").as("price_r1"),
        round(dec2(col("l_extendedprice")), 0).cast("double").as("price_r0"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(dec2(col("l_extendedprice")) - lit(30000)).cast("double").as("dist_30k"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q26Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS price_r0,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  CAST(abs(CAST(l_extendedprice AS DECIMAL(18,2)) - 30000) AS DOUBLE) AS dist_30k
      |FROM lineitem WHERE l_orderkey % 199 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- json
  /** JSON extraction from string payloads (SURVEY §2.8 JSON, ref
    * schedule.py:180-208 json.loads of config; base.py:122 payload
    * dumps). */
  val q27Json: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  private val q27Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- hash
  /** Deterministic hashing / fingerprints (SURVEY §2.8 Crypto, ref
    * farm_processor.py:204-227 SHA-256 share token). */
  val q28Hash: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        md5(col("text")).as("md5_text"),
        sha2(col("text"), 256).as("sha256_text"),
        sha2(concat_ws("-", col("doc_id"), col("lang"), col("source")), 256).as("share_token"))
      .orderBy("doc_id")

  private val q28Sql =
    """SELECT doc_id,
      |  md5(text) AS md5_text,
      |  sha256(text) AS sha256_text,
      |  sha256(CAST(doc_id AS VARCHAR) || '-' || lang || '-' || source) AS share_token
      |FROM documents WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- case/nvl
  /** NVL / NULLIF / DECODE / conditional null-out (SURVEY F5/F6, ref
    * data_loader.py:346-358 NVL derived cols; shipment.py:413-431
    * zero-day null contract; schedule.py:299 DECODE). */
  val q29Case: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 101 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_tax"), lit(0.0)), lit(-1.0)).as("tax_nvl"),
        when(col("l_quantity") > 0,
          dec2(col("l_extendedprice")).cast("double") / col("l_quantity"))
          .otherwise(lit(null)).as("unit_price"),
        when(col("l_returnflag") === "A", "accepted")
          .when(col("l_returnflag") === "R", "returned")
          .otherwise("none").as("flag_decoded"),
        // multiply in DECIMAL: price*discount is an exact 4-dec value;
        // a double-first multiply then cast-to-2-dec would hit .xx50
        // halfway cases where Spark and DuckDB round differently.
        when(col("l_discount") === 0.0, lit(null).cast("double"))
          .otherwise((dec2(col("l_extendedprice")) * dec2(col("l_discount")) * lit(-1)).cast("double"))
          .as("neg_disc_amt"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q29Sql =
    """SELECT l_orderkey, l_linenumber,
      |  COALESCE(NULLIF(l_tax, 0.0), -1.0) AS tax_nvl,
      |  CASE WHEN l_quantity > 0
      |       THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / l_quantity END AS unit_price,
      |  CASE l_returnflag WHEN 'A' THEN 'accepted' WHEN 'R' THEN 'returned'
      |       ELSE 'none' END AS flag_decoded,
      |  CASE WHEN l_discount = 0.0 THEN NULL
      |       ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) * -1 AS DOUBLE) END AS neg_disc_amt
      |FROM lineitem WHERE l_orderkey % 101 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- iso week boundaries
  /** ISO week/year across year boundaries (SURVEY §7.4 risk 8: Python
    * %G/%V vs Spark) on exactly the tricky dates: a spine spanning
    * 2019-12-23 .. 2021-01-10 covers a 52-week year end, the 53-week
    * ISO year 2020, and days whose ISO year differs from the calendar
    * year (2021-01-01..03 are 2020-W53). Spark's weekofyear IS ISO;
    * ISO year comes from the Thursday trick (domain.DateOps.isoYear)
    * — replayed by DuckDB's isoyear()/week() builtins. */
  val q58IsoWeek: Q = (s, _) =>
    s.range(1).select(explode(expr(
        "sequence(to_date('2019-12-23'), to_date('2021-01-10'))")).as("d"))
      .select(col("d"),
        DateOps.isoYear(col("d")).as("iso_year"),
        DateOps.isoWeek(col("d")).as("iso_week"),
        date_sub(col("d"), weekday(col("d"))).as("week_monday"))
      .filter(DateOps.isoYear(col("d")) =!= year(col("d")) ||
        DateOps.isoWeek(col("d")) >= 53 || col("iso_week") === 1)
      .orderBy("d")

  private val q58Sql =
    """SELECT d, CAST(isoyear(d) AS INT) AS iso_year,
      |       CAST(week(d) AS INT) AS iso_week,
      |       d - CAST(isodow(d) - 1 AS INT) AS week_monday
      |FROM (SELECT unnest(generate_series(DATE '2019-12-23', DATE '2021-01-10',
      |                                    INTERVAL 1 DAY))::DATE AS d)
      |WHERE isoyear(d) != year(d) OR week(d) >= 53 OR week(d) = 1
      |ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- locale view date
  /** SF_GET_LOCALE_VW_DATE_2022 (docs/db/ins/02_TABLE.md:97-100 —
    * the last SURVEY §2.10 row without a verified query): UTC event
    * timestamps mapped to per-locale view dates (KOR +9, VNM +7) —
    * the same instant lands on different calendar days near midnight,
    * so the per-(locale, view-date) counts differ between locales. */
  val q94LocaleVwDate: Q = (s, d) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val locales = s.createDataFrame(
      java.util.Arrays.asList(Row("KOR"), Row("VNM")),
      StructType(Seq(StructField("locale", StringType))))
    Tables.events(s, d).filter(col("user_id") < 50)
      .crossJoin(locales)
      .select(col("locale"),
        graft.domain.DateOps.localeVwDate(col("ts"), col("locale")).as("vw_dt"))
      .groupBy("locale", "vw_dt").agg(count(lit(1)).as("n"))
      .orderBy("locale", "vw_dt")
  }

  private val q94Sql =
    """WITH l(locale) AS (VALUES ('KOR'), ('VNM'))
      |SELECT locale,
      |  strftime(ts + CASE locale WHEN 'KOR' THEN INTERVAL 9 HOUR
      |                            WHEN 'VNM' THEN INTERVAL 7 HOUR
      |                            ELSE INTERVAL 0 HOUR END, '%Y%m%d') AS vw_dt,
      |  COUNT(*) AS n
      |FROM events CROSS JOIN l
      |WHERE user_id < 50
      |GROUP BY 1, 2 ORDER BY locale, vw_dt""".stripMargin

  // ----------------------------------------------------------------
  val all: Map[String, Q] = Map(
    "q94_locale_vw_date" -> q94LocaleVwDate,
    "q24_date_kit" -> q24Dates,
    "q25_string_kit" -> q25Strings,
    "q26_round_parity" -> q26Round,
    "q27_json_extract" -> q27Json,
    "q28_hash_tokens" -> q28Hash,
    "q29_case_nvl" -> q29Case,
    "q58_iso_week" -> q58IsoWeek,
  )

  val oracle: Map[String, String] = Map(
    "q94_locale_vw_date" -> q94Sql,
    "q24_date_kit" -> q24Sql,
    "q25_string_kit" -> q25Sql,
    "q26_round_parity" -> q26Sql,
    "q27_json_extract" -> q27Sql,
    "q28_hash_tokens" -> q28Sql,
    "q29_case_nvl" -> q29Sql,
    "q58_iso_week" -> q58Sql,
  )
}
