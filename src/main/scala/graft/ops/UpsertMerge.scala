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

  /** Slowly-changing-dimension TYPE 2 merge: history-preserving
    * dimension versioning (the warehouse staple `upsert`/SCD1 cannot
    * express — it overwrites). `current` must carry `valid_from` /
    * `valid_to` / `is_current` columns; for every key whose TRACKED
    * attributes actually changed (null-safe comparison), the current
    * row is CLOSED (valid_to = effectiveDate, is_current = 'N') and a
    * fresh version opens at effectiveDate; unchanged and absent keys
    * pass through untouched, as do already-closed history rows.
    * Update keys with NO current row are new dimension members: they
    * insert as fresh is_current='Y' versions (non-key, non-tracked
    * attributes null — the update feed doesn't carry them). Duplicate
    * keys on the updates side are canonicalized first — the max row by
    * the tracked-column struct (field-lexicographic, deterministic) —
    * so a dirty feed can never fan the join out into several
    * closed/fresh versions per key. One key join + one partial-agg
    * shuffle on the (small) updates side + a union — the dimension
    * itself never shuffles more than once, and at warehouse scale the
    * updates side broadcasts. */
  def scd2(current: DataFrame, updates: DataFrame, key: String,
           tracked: Seq[String], effectiveDate: String): DataFrame = {
    val open = current.filter(col("is_current") === "Y")
    val closedHistory = current.filter(col("is_current") =!= "Y")
    val upd = updates
      .groupBy(col(key))
      .agg(max(struct(tracked.map(col): _*)).as("__t"))
      .select(col(key) +: lit(true).as("__u_present") +:
        tracked.map(c => col(s"__t.$c").as(s"__u_$c")): _*)
    val joined = open.join(upd, Seq(key), "left")
    val changed = tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)
    val hasUpdate = coalesce(col("__u_present"), lit(false))
    val passThrough = joined.filter(!hasUpdate || !changed)
      .select(open.columns.map(col): _*)
    val closed = joined.filter(hasUpdate && changed)
      .select(open.columns.map {
        case "valid_to" => lit(effectiveDate).as("valid_to")
        case "is_current" => lit("N").as("is_current")
        case c => col(c)
      }: _*)
    val fresh = joined.filter(hasUpdate && changed)
      .select(open.columns.map {
        case c if tracked.contains(c) => col(s"__u_$c").as(c)
        case "valid_from" => lit(effectiveDate).as("valid_from")
        case "valid_to" => lit("9999-12-31").as("valid_to")
        case "is_current" => lit("Y").as("is_current")
        case c => col(c)
      }: _*)
    val dt = open.schema.fields.map(f => f.name -> f.dataType).toMap
    val freshNew = upd.join(open.select(col(key)), Seq(key), "left_anti")
      .select(open.columns.map {
        case `key` => col(key)
        case c if tracked.contains(c) => col(s"__u_$c").as(c)
        case "valid_from" => lit(effectiveDate).cast(dt("valid_from")).as("valid_from")
        case "valid_to" => lit("9999-12-31").cast(dt("valid_to")).as("valid_to")
        case "is_current" => lit("Y").as("is_current")
        case c => lit(null).cast(dt(c)).as(c)
      }: _*)
    closedHistory.unionByName(passThrough).unionByName(closed)
      .unionByName(fresh).unionByName(freshNew)
  }
}
