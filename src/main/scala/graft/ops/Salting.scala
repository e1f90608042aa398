package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation (the 100 TB posture for hot keys —
  * SURVEY §7.4 risk 9 / the builder mandate's "salting for skew").
  *
  * A single hot key (one giant farm, one viral user) funnels into one
  * reducer under plain groupBy. Salting splits each key into
  * `buckets` sub-keys for the first (partial) aggregation, then
  * re-aggregates the tiny salted partials by the real key. Works for
  * any algebraic aggregate (sum/count/min/max); averages must be
  * carried as (sum, count) pairs.
  */
object Salting {

  /** Salted sum/count: groupBy(keys + salt) partial, then groupBy(keys)
    * final. `saltSource` must vary within a key (e.g. a detail column
    * or monotonically_increasing_id) so rows spread across buckets. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     saltSource: Column, buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__psum"), count(value).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).cast("long").as("cnt_value"))
  }
}
