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

  /** Skew-safe equi-join: the fallback when the dimension side is too
    * big to broadcast AND the fact side is skewed on the join key (one
    * viral user / giant farm funnels a whole key into one reducer
    * under plain sort-merge join).
    *
    * Each fact row gets ONE deterministic salt bucket (hash of a
    * within-key-varying column); the dimension side is replicated
    * once per bucket (an `explode` of 0..buckets-1, a narrow map —
    * NO shuffle-side blowup: the dim shuffle grows x buckets but each
    * of a hot key's `buckets` reducers now holds 1/buckets of the
    * fact rows). Joining on keys :+ salt spreads every hot key over
    * `buckets` reducers while preserving join semantics exactly.
    *
    * Semantics-preserving for inner / left_outer / left_semi /
    * left_anti only (fact side drives multiplicity: each fact row
    * carries exactly one salt, and all `buckets` copies of its
    * matching dim rows exist, one per salt). right/full would emit
    * unmatched dim rows once per salt copy — rejected up front.
    *
    * This is the MANUAL form; AQE's skewJoin handles the same case
    * adaptively when partition-size stats reveal the skew at runtime.
    * The manual salt is for keys KNOWN to be hot a priori (the
    * reference's giant-farm case), where pre-spreading avoids even
    * the first skewed attempt. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("outer", "").replace("_", "")
    require(Set("inner", "left", "leftsemi", "leftanti")(jt),
      s"saltedJoin preserves semantics only for fact-driven join types, got $joinType")
    require(buckets > 1, "buckets must be > 1")
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = dim.withColumn(
      "__salt", explode(array((0 until buckets).map(lit(_)): _*)))
    salted.join(replicated, (keys :+ "__salt").toSeq, joinType).drop("__salt")
  }
}
