package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed upsert / delete+insert merge semantics (SURVEY S7/S8).
  *
  * The reference MERGEs weather rows on their natural key with
  * precedence rules — nowcast overwrites forecast, mid-range only
  * inserts when missing (`/root/reference/src/collectors/weather.py:
  * 1697-1732,1879-1918,2420-2443`) — and delete+inserts productivity
  * rows on a unique key (`productivity.py:406-451`).
  *
  * Batch-engine formulation: union old+new with a priority, keep the
  * highest-priority row per key (LatestRecord.viaAgg — partial-agg,
  * one shuffle). On a Delta/Iceberg-capable sink this becomes a real
  * MERGE INTO; on parquet it pairs with partition-overwrite writes.
  */
object UpsertMerge {

  /** New rows win on key collision (MERGE WHEN MATCHED UPDATE). */
  def upsert(old: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    merge(old, incoming, keys, incomingWins = true)

  /** Old rows win (MERGE WHEN NOT MATCHED ONLY — insert-if-absent,
    * the reference's mid-range weather variant). */
  def insertIfAbsent(old: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    merge(old, incoming, keys, incomingWins = false)

  private def merge(old: DataFrame, incoming: DataFrame, keys: Seq[String],
                    incomingWins: Boolean): DataFrame = {
    val pri = if (incomingWins) (0, 1) else (1, 0)
    val u = old.withColumn("__pri", lit(pri._1))
      .unionByName(incoming.withColumn("__pri", lit(pri._2)))
    LatestRecord.viaAgg(u, keys, Seq("__pri")).drop("__pri")
  }

  /** Delete+insert by key set: drop every old row whose key appears in
    * `incoming`, then append all incoming rows (reference
    * productivity.py:406-451). Anti-join + union — no row comparison. */
  def deleteInsert(old: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    old.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(incoming)
}
