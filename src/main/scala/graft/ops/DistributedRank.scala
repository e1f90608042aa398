package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import scala.collection.mutable

/** Two-phase distributed rank: the scale-safe replacement for
  * `row_number() OVER (PARTITION BY stratum ORDER BY ...)` when a
  * stratum can be corpus-sized (few, skewed languages; few k-means
  * cells; or no stratum at all — a global rank). A plain window sends
  * EVERY row of a stratum through one task's sorter; at 100 TB the
  * English stratum is tens of TB through a single task.
  *
  * Phase plan (classic distributed sort-rank):
  *   1. `repartitionByRange` over (strata ++ order) — each physical
  *      partition holds a contiguous slice of the GLOBAL
  *      (strata, order) sort order, bounded by data/parts, never by
  *      stratum size. `sortWithinPartitions` finishes the local sort.
  *   2. Job 1 over the shuffled RDD: per-partition, per-stratum row
  *      counts (a few KB — parts x strata-per-partition entries).
  *   3. Driver: exclusive prefix sums per stratum across partition
  *      index -> offset map (tiny; broadcast).
  *   4. Job 2 over the SAME RDD: a per-partition counter per stratum,
  *      rank = offset + local position. The two jobs share one RDD
  *      lineage, so the range shuffle is computed once and its files
  *      are reused — partition boundaries are identical by
  *      construction, not by seeding luck.
  *
  * Output rank equals the single-task window's rank bit-for-bit
  * whenever (strata ++ order) is a TOTAL order on the rows (callers
  * must include a tiebreaker key, e.g. the row id). No stage
  * materializes more than one range-partition slice per task.
  */
object DistributedRank {

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
    * should materialize it first if that 2x matters at their scale.
    */
  def rank(df: DataFrame, strata: Seq[String], order: Seq[Column],
           rkCol: String, numParts: Int = 0,
           totalCol: String = null): DataFrame = {
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

    // One RDD object, two jobs: the range shuffle is computed once and
    // reused, so both jobs see identical partition boundaries.
    val rdd = ranged.rdd

    // Job 1: per-(partition, stratum) counts. Tiny result.
    val counts: Array[(Int, Map[Seq[Any], Long])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { row =>
          val key = strataIdx.map(row.get(_): Any)
          m.update(key, m.getOrElse(key, 0L) + 1L)
        }
        Iterator.single(pid -> m.toMap)
      }.collect()

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

    // Job 2: local counter + broadcast offset = exact global rank.
    val outSchema0 = schema.add(rkCol, LongType, nullable = false)
    val outSchema =
      if (withTotal) outSchema0.add(totalCol, LongType, nullable = false)
      else outSchema0
    val rankedRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = mutable.Map.empty[Seq[Any], Long]
      val offs = bc.value
      val totals = bcTotals.value
      it.map { row =>
        val key = strataIdx.map(row.get(_): Any)
        val c = local.getOrElse(key, 0L) + 1L
        local.update(key, c)
        val base = row.toSeq :+ (offs.getOrElse((pid, key), 0L) + c)
        Row.fromSeq(if (withTotal) base :+ totals.getOrElse(key, 0L) else base)
      }
    }
    spark.createDataFrame(rankedRdd, outSchema)
  }
}
