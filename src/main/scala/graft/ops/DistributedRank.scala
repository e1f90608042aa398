package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType, MapType, StructType}

import scala.collection.mutable

/** Two-phase distributed rank / prefix sum: the scale-safe replacement
  * for `row_number() / sum(x) OVER (PARTITION BY stratum ORDER BY ...)`
  * when a stratum can be corpus-sized (few, skewed languages; few
  * k-means cells; or no stratum at all — a global rank). A plain window
  * sends EVERY row of a stratum through one task's sorter; at 100 TB
  * the English stratum is tens of TB through a single task.
  *
  * Phase plan (classic distributed sort-rank):
  *   1. `repartitionByRange` over (strata ++ order) — each physical
  *      partition holds a contiguous slice of the GLOBAL
  *      (strata, order) sort order, bounded by data/parts, never by
  *      stratum size. `sortWithinPartitions` finishes the local sort.
  *   2. Job 1 over the shuffled RDD: per-partition, per-stratum
  *      aggregates — row counts for [[rank]], SUMS of the value column
  *      for [[prefixSum]] (the count path is the special case
  *      value = 1). A few KB — parts x strata-per-partition entries.
  *   3. Driver: exclusive prefix sums per stratum across partition
  *      index -> offset map (tiny; broadcast).
  *   4. Job 2 over the SAME RDD: a per-partition running accumulator
  *      per stratum, result = offset + local running value. The two
  *      jobs share one RDD lineage, so the range shuffle is computed
  *      once and its files are reused — partition boundaries are
  *      identical by construction, not by seeding luck.
  *
  * Output equals the single-task window's result bit-for-bit whenever
  * (strata ++ order) is a TOTAL order on the rows (callers must
  * include a tiebreaker key, e.g. the row id). No stage materializes
  * more than one range-partition slice per task.
  *
  * Stratum columns must be ATOMIC types (string/numeric/date/...):
  * they are used as hash-map keys by VALUE on the driver, and an
  * array/binary stratum would compare by reference, silently
  * fragmenting per-stratum offsets — asserted up front.
  */
object DistributedRank {

  private def assertAtomicStrata(df: DataFrame, strata: Seq[String]): Unit =
    strata.foreach { s =>
      val dt = df.schema(s).dataType
      require(!dt.isInstanceOf[ArrayType] && !dt.isInstanceOf[MapType] &&
        !dt.isInstanceOf[StructType] && dt != BinaryType,
        s"stratum column '$s' must be an atomic (hashable-by-value) type, got $dt")
    }

  /** Append `rkCol` (LongType, 1-based within each stratum, ordered by
    * `order`) to `df`. `strata` may be empty for a global rank.
    * `order` columns must reference columns present in `df` (plain
    * `col(...)`/`.desc` forms — they are also used as range-partition
    * keys). (strata ++ order) must totally order the rows.
    *
    * `totalCol` (optional): ALSO append each stratum's total row count
    * — it falls out of Job 1's per-partition counts for free, so
    * callers that need (rank, stratum_size) pairs (split boundaries,
    * per-cell keep quotas) avoid a separate groupBy pass + broadcast
    * join that would re-evaluate the whole upstream lineage again.
    *
    * Cost note: range partitioning inherently evaluates the input
    * lineage twice (the boundary-sampling job, then the shuffle map
    * tasks) — the same cost profile as any global sort. Callers with
    * an EXPENSIVE upstream (iterative k-means, multi-join graphs)
    * should pass `materializeInput = true`: the input is eagerly
    * leaf-checkpointed ([[Materialize.leafCache]]) so the upstream
    * jobs run ONCE, and the checkpoint storage is released as soon as
    * the count job has populated the range-shuffle's map files — the
    * later rank job (and the caller's action) reuse those files via
    * map-stage skip, so nothing is pinned past this call. (Cluster
    * durability caveat as in [[Materialize]]: an executor loss after
    * release fails the job instead of recomputing.)
    */
  def rank(df: DataFrame, strata: Seq[String], order: Seq[Column],
           rkCol: String, numParts: Int = 0,
           totalCol: String = null,
           materializeInput: Boolean = false): DataFrame =
    twoPhase(df, strata, order, valueCol = None, outCol = rkCol,
      numParts = numParts, totalCol = totalCol,
      materializeInput = materializeInput)

  /** Append `cumCol` (LongType): the INCLUSIVE ordered prefix sum of
    * `valueCol` within each stratum — the scale-safe form of
    * `sum(valueCol) OVER (PARTITION BY strata ORDER BY order ROWS
    * UNBOUNDED PRECEDING)`. `valueCol` must be LongType (cast first:
    * exact integer arithmetic is what makes the result
    * order-independent and hash-stable); nulls contribute 0.
    *
    * `totalCol` (optional): each stratum's total sum, from the same
    * count job — rank's totalCol note applies. The same machinery
    * backs ntile/percent_rank/cume_dist for few-valued strata:
    * rank + total are exactly the (row_number, count) pair those
    * functions are defined over.
    */
  def prefixSum(df: DataFrame, strata: Seq[String], order: Seq[Column],
                valueCol: String, cumCol: String, numParts: Int = 0,
                totalCol: String = null,
                materializeInput: Boolean = false): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"valueCol '$valueCol' must be LongType (cast first), got " +
        df.schema(valueCol).dataType)
    twoPhase(df, strata, order, valueCol = Some(valueCol), outCol = cumCol,
      numParts = numParts, totalCol = totalCol,
      materializeInput = materializeInput)
  }

  // ------------------------------------------------------------------
  // Rank-function expressions over a (rank, total) pair.
  //
  // SQL's ntile / percent_rank / cume_dist are pure functions of the
  // (row_number, partition count) pair whenever (strata ++ order) is a
  // TOTAL order on the rows (no peers) — exactly what
  // [[rank]](totalCol = ...) produces in one two-phase pass. So the
  // scale-safe form of
  //   `ntile(k) OVER (PARTITION BY stratum ORDER BY ...)`
  // for a corpus-sized stratum is rank + one of these projections: no
  // `Window` operator, no stratum funnels through one task's sorter.
  // All three are plain Column arithmetic (codegen'd, shuffles
  // nothing). Division results are IEEE-exact given identical
  // operands, so they hash-match any engine computing the same
  // definition.

  /** SQL-standard `ntile(k)`: the first (total % k) buckets get
    * ceil(total/k) rows, the rest floor(total/k). `rk` is the 1-based
    * [[rank]] output, `total` its totalCol. Pure integer arithmetic. */
  def ntile(rk: Column, total: Column, k: Int): Column = {
    val base = total.divide(k).cast(LongType) // floor: both operands >= 0
    val rem = total % k
    val thresh = rem * (base + 1)
    when(rk <= thresh, (rk - 1).divide(base + 1).cast(LongType) + 1)
      .otherwise(rem + (rk - 1 - thresh).divide(base).cast(LongType) + 1)
  }

  /** SQL `percent_rank()` = (rank-1)/(total-1), 0.0 for a 1-row
    * stratum. Valid when the rank's order is total (no peers —
    * callers include a tiebreaker, as [[rank]] already requires). */
  def percentRank(rk: Column, total: Column): Column =
    when(total === 1L, lit(0.0))
      .otherwise((rk - 1).cast("double") / (total - 1).cast("double"))

  /** SQL `cume_dist()` = rank/total under a total order (no peers —
    * with peers cume_dist jumps to the LAST peer's row number, which
    * a per-row projection cannot see; callers needing peer semantics
    * should rank on the peer key alone and max-join, but every
    * catalog caller orders by a unique tiebreaker). */
  def cumeDist(rk: Column, total: Column): Column =
    rk.cast("double") / total.cast("double")

  /** Shared two-phase engine: valueCol = None counts rows (rank),
    * Some(c) sums column c (prefix sum). */
  private def twoPhase(df0: DataFrame, strata: Seq[String], order: Seq[Column],
                       valueCol: Option[String], outCol: String,
                       numParts: Int, totalCol: String,
                       materializeInput: Boolean): DataFrame = {
    assertAtomicStrata(df0, strata)
    // materializeInput: run the expensive upstream ONCE into a leaf
    // checkpoint; released below once the shuffle files hold the data.
    val df = if (materializeInput) Materialize.leafCache(df0) else df0
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val sortCols = strata.map(col) ++ order
    val ranged = df
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

    val schema = ranged.schema
    val strataIdx = strata.map(schema.fieldIndex)
    val valIdx = valueCol.map(schema.fieldIndex)

    // One RDD object, two jobs: the range shuffle is computed once and
    // reused, so both jobs see identical partition boundaries.
    val rdd = ranged.rdd

    // Job 1: per-(partition, stratum) count/sum. Tiny result.
    val counts: Array[(Int, Map[Seq[Any], Long])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { row =>
          val key = strataIdx.map(row.get(_): Any)
          val v = valIdx match {
            case Some(i) => if (row.isNullAt(i)) 0L else row.getLong(i)
            case None => 1L
          }
          m.update(key, m.getOrElse(key, 0L) + v)
        }
        Iterator.single(pid -> m.toMap)
      }.collect()

    // The count job above ran the boundary-sampling job AND the range
    // shuffle's map stage: the shuffled data now lives in shuffle
    // files that Job 2 (and the caller's action) reuse via map-stage
    // skip. The input checkpoint is no longer needed — free it NOW
    // rather than pinning corpus-sized blocks until driver GC.
    if (materializeInput) Materialize.release(df)

    // Driver: exclusive prefix sum per stratum across partition ids.
    val running = mutable.Map.empty[Seq[Any], Long]
    val offsets = mutable.Map.empty[(Int, Seq[Any]), Long]
    counts.sortBy(_._1).foreach { case (pid, m) =>
      m.foreach { case (key, c) =>
        val off = running.getOrElse(key, 0L)
        offsets((pid, key)) = off
        running(key) = off + c
      }
    }
    val bc = spark.sparkContext.broadcast(offsets.toMap)
    val bcTotals = spark.sparkContext.broadcast(running.toMap)
    val withTotal = totalCol != null

    // Job 2: local running accumulator + broadcast offset = exact
    // global rank / inclusive prefix sum.
    val outSchema0 = schema.add(outCol, LongType, nullable = false)
    val outSchema =
      if (withTotal) outSchema0.add(totalCol, LongType, nullable = false)
      else outSchema0
    val rankedRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = mutable.Map.empty[Seq[Any], Long]
      val offs = bc.value
      val totals = bcTotals.value
      it.map { row =>
        val key = strataIdx.map(row.get(_): Any)
        val v = valIdx match {
          case Some(i) => if (row.isNullAt(i)) 0L else row.getLong(i)
          case None => 1L
        }
        val c = local.getOrElse(key, 0L) + v
        local.update(key, c)
        val base = row.toSeq :+ (offs.getOrElse((pid, key), 0L) + c)
        Row.fromSeq(if (withTotal) base :+ totals.getOrElse(key, 0L) else base)
      }
    }
    spark.createDataFrame(rankedRdd, outSchema)
  }
}
