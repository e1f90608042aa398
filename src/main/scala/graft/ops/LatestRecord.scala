package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record dedup (SURVEY J1/W1/A9/W3).
  *
  * The reference keeps an append-only event log and derives "current
  * state" as the row with max (WK_DATE, SEQ) per (FARM_NO, PIG_NO)
  * (`/root/reference/src/weekly/data_loader.py:255-266`, `alert.py:
  * 102-106` MAX(SEQ) form, `schedule.py:420-434`).
  *
  * Two formulations:
  *  - `viaAgg`: groupBy(keys).agg(max(struct(ord ++ rest))) — partial
  *    aggregation combines map-side, ONE shuffle of pre-reduced data;
  *    the right default at 100 TB.
  *  - `viaWindow`: row_number()=1 — shuffles every row; use when the
  *    full input ordering is needed anyway (e.g. also computing lag).
  *
  * Ordering must be made total by the caller (include a unique
  * tiebreaker in `ord`) or results are nondeterministic.
  */
object LatestRecord {

  /** Latest row per key: max of struct(ord..., rest...) — struct
    * comparison is lexicographic, so `ord` must be a unique prefix. */
  def viaAgg(df: DataFrame, keys: Seq[String], ord: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(c => keys.contains(c) || ord.contains(c))
    val packed = struct((ord ++ rest).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__top"))
      .select(keys.map(col) ++ (ord ++ rest).map(c => col(s"__top.$c")): _*)
  }

  def viaWindow(df: DataFrame, keys: Seq[String], ordDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
