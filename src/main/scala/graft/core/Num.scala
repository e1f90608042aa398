package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric aggregation.
  *
  * The correctness gate hash-compares Spark results against a DuckDB
  * oracle. A plain `sum` over doubles is order-dependent (different
  * partial-aggregation orders give different low-order bits), so every
  * money/measure aggregate goes through exact decimal arithmetic and is
  * converted to double exactly once at the end: decimal sums are exact,
  * and decimal->double conversion is correctly rounded in both engines,
  * giving bit-identical results regardless of evaluation order.
  *
  * This mirrors the reference's own insistence on Oracle NUMBER
  * semantics (`oracle_round`, /root/reference/src/weekly/processors/
  * shipment.py:24-33): measures are fixed-point at the boundary.
  */
object Num {
  /** All raw measures in the fixtures carry <= 2 decimal digits. */
  val D2: DecimalType = DecimalType(18, 2)

  def dec2(c: Column): Column = c.cast(D2)

  /** Exact sum of a 2-decimal measure, returned as double.
    * DuckDB oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def dsum2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of a product of two 2-decimal measures (e.g. revenue =
    * price * (1 - discount)); the product is exact in DECIMAL(.,4). */
  def dsumProd2(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast("double")

  /** Average as exact-sum / count: a single double division, identical
    * in both engines. Oracle AVG ignores NULLs; `count(c)` matches. */
  def davg2(c: Column): Column = dsum2(c) / count(c)

  /** Weighted average (ratio of sums) — SURVEY A5, reference
    * orchestrator.py:678-692: SUM(cnt*amt)/NULLIF(SUM(cnt),0). */
  def weightedAvg2(value: Column, weight: Column): Column =
    dsumProd2(value, weight) / nullif(dsum2(weight), lit(0.0))

  /** Split-exact decimal→double: floor + fraction converted
    * separately, then added.
    *
    * A direct CAST(decimal AS DOUBLE) is TWO roundings when the
    * unscaled value exceeds 2^53 (int→double, then /10^scale), and
    * engines disagree on the second one — measured: a DECIMAL(38,4)
    * sum of 7096786968835.8685 converts to adjacent doubles in Spark
    * vs DuckDB (the q110 syy moment at sf0.001). The split makes
    * every step a SINGLE correctly-rounded IEEE operation on
    * identical operands (floor is exact in decimal; the fraction's
    * unscaled value is < 10^scale, so its conversion is one
    * rounding; the final add is one rounding) — bit-identical in
    * both engines at ANY magnitude.
    * DuckDB replay: CAST(FLOOR(s) AS DOUBLE) + CAST(s - FLOOR(s) AS DOUBLE). */
  def decToDouble(d: Column): Column =
    floor(d).cast("double") + (d - floor(d)).cast("double")
}
