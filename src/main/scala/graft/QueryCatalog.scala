package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}
import graft.core.Num._
import graft.ops._

/** The verifiable operator surface: one named query per SURVEY §2
  * inventory row, each with an equivalent DuckDB oracle SQL.
  *
  * Numeric determinism contract (see core.Num): every double aggregate
  * is an exact decimal sum cast to double once, so Spark and DuckDB
  * produce bit-identical values and the driver's hash compare is
  * stable. Every query ends in a total ORDER BY so row order is
  * deterministic too.
  */
object QueryCatalog {
  type Q = (SparkSession, String) => DataFrame

  // Decimal-exact revenue: price * (1 - discount), both 2-dec measures.
  private def revenue(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1.0) - discount).cast(D2)).cast("double")

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- A1/A5
  /** TPC-H Q1-shaped scan+agg (SURVEY A1, ref base.py:319-340 generic
    * sum/avg/count layer). The flagship query. */
  val q01Agg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (dsum2(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- S1/F1/F2
  /** Raw scan with pushed period + code-set predicates and column
    * pruning (SURVEY S1/F1/F2, ref data_loader.py:209-277 filtered
    * loads; base.py:239-281 period/code filters). */
  val q02Scan: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2000-02-01")) &&
        col("l_returnflag").isin("A", "R"))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-02-01'
      |  AND l_returnflag IN ('A','R')
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- J1/W1/A9
  /** Latest-record dedup: current state of each user from the event
    * log (SURVEY J1, ref data_loader.py:255-266). Partial-agg max_by
    * formulation — one shuffle of pre-reduced rows. */
  val q03Latest: Q = (s, d) => {
    val latest = LatestRecord.viaAgg(Tables.events(s, d).drop("props"),
      keys = Seq("user_id"), ord = Seq("ts", "event_id"))
    latest.select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"), col("event_type").as("last_type"),
        col("value").as("last_value"))
      .orderBy("user_id")
  }

  private val q03Sql =
    """WITH r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |       event_type AS last_type, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- J2/W4
  /** Prev/next event per user (SURVEY J2, ref data_loader.py:299-327
    * SEQ±1 self-join re-expressed as lag/lead over a total order). */
  val q04PrevNext: Q = (s, d) =>
    PrevNext.viaWindow(Tables.events(s, d).drop("props"),
        keys = Seq("user_id"), ord = Seq(col("ts"), col("event_id")),
        attach = Seq("event_type"))
      .select("event_id", "user_id", "ts", "event_type",
        "prev_event_type", "next_event_type")
      .orderBy("event_id")

  private val q04Sql =
    """SELECT event_id, user_id, ts, event_type,
      |  lag(event_type)  OVER w AS prev_event_type,
      |  lead(event_type) OVER w AS next_event_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- J3/J4
  /** As-of join: each click gets the latest earlier-or-equal error of
    * the same user (SURVEY J3/J4, ref weaning.py:145-162 theta-join
    * form, accident.py:129-174 backwards-scan form). Union+window —
    * one shuffle, no range-join blowup. */
  val q05AsOf: Q = (s, d) => {
    val ev = Tables.events(s, d).drop("props")
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    AsOf.join(errors, clicks, keys = Seq("user_id"), time = "ts",
        tie = "event_id", attach = Seq("ts", "event_id", "value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"), col("asof_event_id"), col("asof_value"))
      .orderBy("event_id")
  }

  private val q05Sql =
    """WITH j AS (
      |  SELECT c.event_id, c.user_id, c.ts,
      |         e.ts AS asof_ts, e.event_id AS asof_event_id, e.value AS asof_value,
      |         row_number() OVER (PARTITION BY c.event_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'click') c
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |    ON e.user_id = c.user_id AND e.ts <= c.ts)
      |SELECT event_id, user_id, ts, asof_ts, asof_event_id, asof_value
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- J5/J10
  /** Multi-key equi-join chain with broadcast dimensions (SURVEY
    * J5/J10, ref weaning.py:212-231 join chain; farm_service.py:22-31
    * broadcast dims). */
  val q06JoinChain: Q = (s, d) => {
    val dims = broadcast(
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name"))
    // Partial-aggregate lineitem BELOW the fact-fact join: decimal
    // partial sums are exact, so summing per-order partials after the
    // join is bit-identical to aggregating raw rows after it — and the
    // orderkey shuffle carries one pre-reduced row per order instead
    // of every lineitem (the decisive reduction at 100 TB, where both
    // sides of this join are fact-sized and must shuffle).
    val lpart = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1.0) - col("l_discount")).cast(D2))
          .as("rev_part"),
        count(lit(1)).as("n_part"))
    lpart
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("rev_part")).cast("double").as("revenue"),
        sum(col("n_part")).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val q06Sql =
    s"""SELECT r_name, n_name, $revenueSql AS revenue, COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- J6
  /** Interval/banded join: lineitems shipped within 60 days of their
    * order date (SURVEY J6, ref weaning.py:175-181 dynamic-bound date
    * band). Equi key + range predicate — executes as a sort-merge join
    * with the band as a post-filter, not a nested loop. */
  val q07RangeJoin: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("o_orderpriority")

  private val q07Sql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items, $revenueSql AS revenue
       |FROM lineitem JOIN orders
       |  ON l_orderkey = o_orderkey
       | AND l_shipdate >= o_orderdate
       | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- J7
  /** Date-spine left join with zero-fill (SURVEY J7, ref
    * data_loader.py:500-536 CONNECT BY 7-day spine). */
  val q08Spine: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("event_day"))
      .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
    DateSpine.leftJoin(
        DateSpine.daily(s, "2024-01-01", "2024-02-04"), daily, "event_day",
        fill = Map("n_events" -> 0L, "sum_value" -> 0.0))
      .select("day", "n_events", "sum_value")
      .orderBy("day")
  }

  private val q08Sql =
    """SELECT CAST(g.g AS DATE) AS day,
      |  COALESCE(d.n_events, 0) AS n_events,
      |  COALESCE(d.sum_value, 0.0) AS sum_value
      |FROM generate_series(DATE '2024-01-01', DATE '2024-02-04', INTERVAL 1 DAY) g(g)
      |LEFT JOIN (
      |  SELECT CAST(ts AS DATE) AS event_day, COUNT(*) AS n_events,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1) d
      |ON d.event_day = CAST(g.g AS DATE)
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- J8
  /** Semi-join (SURVEY J8, ref schedule.py:428-431 PIG_NO IN
    * (subquery)): customers having at least one big order. */
  val q09Semi: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  private val q09Sql =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- J9
  /** Anti-join (SURVEY J9, ref alert.py:108-117 sows with no work
    * history): customers with no RECENT order (none since 1998-01-01)
    * — the date restriction guarantees a non-empty result so the
    * anti-join path is genuinely exercised by the correctness gate
    * (every customer in the fixture has at least one all-time order). */
  val q10Anti: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("date"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  private val q10Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= DATE '1998-01-01')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- J11/W5
  /** Prior-period delta via lag over week-ordered aggregates (SURVEY
    * J11/W5, ref modon.py:267-335 prior-completed-week Δ columns). */
  val q11WeekDelta: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wk = Tables.lineitem(s, d)
      .groupBy(date_trunc("week", col("l_shipdate")).cast("date").as("week_start"),
        col("l_returnflag"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("week_start"))
    wk.withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", col("revenue") - col("prev_revenue"))
      .orderBy("l_returnflag", "week_start")
  }

  private val q11Sql =
    s"""WITH wk AS (
       |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start,
       |         l_returnflag, $revenueSql AS revenue
       |  FROM lineitem GROUP BY 1, 2)
       |SELECT week_start, l_returnflag, revenue,
       |  lag(revenue) OVER w AS prev_revenue,
       |  revenue - lag(revenue) OVER w AS delta
       |FROM wk
       |WINDOW w AS (PARTITION BY l_returnflag ORDER BY week_start)
       |ORDER BY l_returnflag, week_start""".stripMargin

  // ---------------------------------------------------------------- S7/S8
  /** Keyed upsert merge with incoming-wins precedence (SURVEY S7, ref
    * weather.py:1697-1732 MERGE; :1879-1918 nowcast-overwrites). */
  val q12Upsert: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("val"))
    val old = daily.filter(col("day") <= lit("2024-01-20").cast("date"))
      .withColumn("src", lit("old"))
    val incoming = daily.filter(col("day") >= lit("2024-01-10").cast("date"))
      .withColumn("src", lit("new"))
    UpsertMerge.upsert(old, incoming, keys = Seq("user_id", "day"))
      .select("user_id", "day", "n", "val", "src")
      .orderBy("user_id", "day")
  }

  /** SCD Type-2 dimension versioning ([[graft.ops.UpsertMerge.scd2]]):
    * history-preserving merge — changed keys close their current row
    * at the effective date and open a fresh version; no-op updates
    * (planted: every %10==1 customer re-sent unchanged) produce NO new
    * version; pre-existing closed history (planted for custkey 1)
    * passes through untouched; a DUPLICATE update per changed key
    * (planted: %10==0 keys sent twice, +100/'MOVED' and +50/'MOVED2')
    * canonicalizes to the max tracked-struct row instead of fanning
    * out; an update for a key with no current row (planted: custkey
    * -5) INSERTS as a fresh dimension member. The warehouse staple
    * S7/S8 cannot express. One key join + union; updates side
    * broadcasts at warehouse scale. */
  val q141Scd2: Q = (s, d) => {
    val c = Tables.customer(s, d).select("c_custkey", "c_acctbal", "c_mktsegment")
    val cur = c.withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit("9999-12-31"))
      .withColumn("is_current", lit("Y"))
    val hist = c.filter(col("c_custkey") === 1)
      .select(col("c_custkey"), (col("c_acctbal") - 50.0).as("c_acctbal"),
        col("c_mktsegment"), lit("2023-01-01").as("valid_from"),
        lit("2024-01-01").as("valid_to"), lit("N").as("is_current"))
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("c_acctbal"),
        lit("MOVED").as("c_mktsegment"))
      .unionByName(c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 50.0).as("c_acctbal"),
          lit("MOVED2").as("c_mktsegment")))
      .unionByName(c.filter(col("c_custkey") % 10 === 1))
      .unionByName(s.range(1).select(lit(-5L).as("c_custkey"),
        lit(123.45).as("c_acctbal"), lit("NEWSEG").as("c_mktsegment")))
    graft.ops.UpsertMerge.scd2(cur.unionByName(hist), updates, "c_custkey",
        Seq("c_acctbal", "c_mktsegment"), "2024-06-01")
      .orderBy("c_custkey", "valid_from", "is_current")
  }

  private val q141Sql =
    """WITH c AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
      |cur AS (SELECT *, '2024-01-01' AS valid_from, '9999-12-31' AS valid_to,
      |               'Y' AS is_current FROM c),
      |hist AS (SELECT c_custkey, c_acctbal - 50.0 AS c_acctbal, c_mktsegment,
      |                '2023-01-01' AS valid_from, '2024-01-01' AS valid_to,
      |                'N' AS is_current
      |         FROM c WHERE c_custkey = 1),
      |upd0 AS (SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
      |                'MOVED' AS c_mktsegment
      |         FROM c WHERE c_custkey % 10 = 0
      |         UNION ALL
      |         SELECT c_custkey, c_acctbal + 50.0, 'MOVED2'
      |         FROM c WHERE c_custkey % 10 = 0
      |         UNION ALL
      |         SELECT c_custkey, c_acctbal, c_mktsegment
      |         FROM c WHERE c_custkey % 10 = 1
      |         UNION ALL
      |         SELECT -5, 123.45, 'NEWSEG'),
      |upd AS (SELECT c_custkey, c_acctbal, c_mktsegment, TRUE AS u_present
      |        FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
      |                ORDER BY c_acctbal DESC, c_mktsegment DESC) AS rn
      |              FROM upd0) WHERE rn = 1),
      |j AS (SELECT cur.c_custkey, cur.c_acctbal, cur.c_mktsegment,
      |             cur.valid_from, cur.valid_to, cur.is_current,
      |             u.c_acctbal AS ub, u.c_mktsegment AS um,
      |             COALESCE(u.u_present, FALSE) AS has_u
      |      FROM cur LEFT JOIN upd u USING (c_custkey)),
      |chg AS (SELECT *,
      |        (c_acctbal IS DISTINCT FROM ub
      |         OR c_mktsegment IS DISTINCT FROM um) AS changed
      |        FROM j)
      |SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to, is_current
      |FROM hist
      |UNION ALL
      |SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to, is_current
      |FROM chg WHERE NOT has_u OR NOT changed
      |UNION ALL
      |SELECT c_custkey, c_acctbal, c_mktsegment, valid_from,
      |       '2024-06-01', 'N'
      |FROM chg WHERE has_u AND changed
      |UNION ALL
      |SELECT c_custkey, ub, um, '2024-06-01', '9999-12-31', 'Y'
      |FROM chg WHERE has_u AND changed
      |UNION ALL
      |SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
      |       '2024-06-01', '9999-12-31', 'Y'
      |FROM upd u WHERE NOT EXISTS
      |  (SELECT 1 FROM cur WHERE cur.c_custkey = u.c_custkey)
      |ORDER BY c_custkey, valid_from, is_current""".stripMargin

  private val q12Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS val
      |  FROM events GROUP BY 1, 2),
      |old AS (SELECT *, 'old' AS src FROM daily WHERE day <= DATE '2024-01-20'),
      |new AS (SELECT *, 'new' AS src FROM daily WHERE day >= DATE '2024-01-10')
      |SELECT user_id, day, n, val, src FROM old
      |WHERE NOT EXISTS (SELECT 1 FROM new
      |                  WHERE new.user_id = old.user_id AND new.day = old.day)
      |UNION ALL
      |SELECT user_id, day, n, val, src FROM new
      |ORDER BY user_id, day""".stripMargin

  // ----------------------------------------------------------------
  val all: Map[String, Q] = Map(
    "q01_agg_basic" -> q01Agg,
    "q02_scan_prune" -> q02Scan,
    "q03_latest_record" -> q03Latest,
    "q04_prevnext" -> q04PrevNext,
    "q05_asof_join" -> q05AsOf,
    "q06_join_chain" -> q06JoinChain,
    "q07_range_join" -> q07RangeJoin,
    "q08_date_spine" -> q08Spine,
    "q09_semi_join" -> q09Semi,
    "q10_anti_join" -> q10Anti,
    "q11_week_delta" -> q11WeekDelta,
    "q12_upsert_merge" -> q12Upsert,
    "q141_scd2" -> q141Scd2,
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_basic" -> q01Sql,
    "q02_scan_prune" -> q02Sql,
    "q03_latest_record" -> q03Sql,
    "q04_prevnext" -> q04Sql,
    "q05_asof_join" -> q05Sql,
    "q06_join_chain" -> q06Sql,
    "q07_range_join" -> q07Sql,
    "q08_date_spine" -> q08Sql,
    "q09_semi_join" -> q09Sql,
    "q10_anti_join" -> q10Sql,
    "q11_week_delta" -> q11Sql,
    "q12_upsert_merge" -> q12Sql,
    "q141_scd2" -> q141Sql,
  )
}
